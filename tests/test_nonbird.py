"""Non-bird sound-class taxonomy (reference: internal/labels/nonbird —
CategoryOf exact-match, IsNonBirdName first-token behavior, privacy and
image-provider consumers)."""

from __future__ import annotations

import pytest

from birdnet_go_tpu.taxonomy import nonbird


def test_categories_stable_order():
    assert nonbird.categories() == [
        "human", "animal", "music", "mechanical", "environment", "noise",
        "device"]


@pytest.mark.parametrize("label,cat", [
    ("male_speech_and_man_speaking", "human"),
    ("laughter", "human"),
    ("power_tool", "mechanical"),
    ("car_passing_by", "mechanical"),
    ("acoustic_guitar", "music"),
    ("thunderstorm", "environment"),
    ("white_noise", "noise"),
    ("telephone_bell_ringing", "device"),
    ("bark", "animal"),
    ("Chainsaw", "mechanical"),              # case-insensitive
])
def test_category_of_known_classes(label, cat):
    assert nonbird.category_of(label) == cat
    assert nonbird.is_non_species_label(label)


@pytest.mark.parametrize("label", [
    "Parus major", "Turdus merula", "Cyanocitta cristata",
    "Strix aluco", "unknown_mystery_thing",
])
def test_bird_species_are_not_nonbird(label):
    assert nonbird.category_of(label) is None
    assert not nonbird.is_non_species_label(label)
    assert not nonbird.is_nonbird_name(label)


def test_first_token_matching_for_image_provider():
    # the image provider only receives the underscore-split first token
    assert nonbird.is_nonbird_name("power")          # from power_tool
    assert nonbird.is_nonbird_name("Engine")
    assert nonbird.is_nonbird_name("male")           # from male_speech_…
    # full-label path still matches too
    assert nonbird.is_nonbird_name("power_tool")
    # exact-match API does NOT accept truncated forms
    assert nonbird.category_of("power") is None


def test_privacy_filter_matches_raw_labels_like_reference():
    """Table mirrors vocalization_labels.go: RAW labels through
    Species.parse; the "human "/"dog_" anchors exclude the cicada
    Pacarina schumanni and the katydid Poecilimon doga."""
    from birdnet_go_tpu.analysis.processor import _is_dog, _is_human
    from birdnet_go_tpu.analysis.results import Species

    human_raw = [
        "Male_speech_and_man_speaking",          # FSD50K, parse-mangled
        "Laughter",                              # FSD50K single word
        "Human vocal_Mensch Stimme",             # BirdNET German locale
        "Human whistle_Human whistle",
        "Homo sapiens",                          # iNaturalist taxon
    ]
    for raw in human_raw:
        assert _is_human(Species.parse(raw)), raw
    not_human = ["Pacarina schumanni_Cicada",    # contains "human"
                 "Parus major_Great Tit"]
    for raw in not_human:
        assert not _is_human(Species.parse(raw)), raw

    dog_raw = ["Dog_Hund", "Bark", "Growling", "Canis familiaris", "dog"]
    for raw in dog_raw:
        assert _is_dog(Species.parse(raw)), raw
    not_dog = ["Poecilimon doga_Katydid",        # contains "doga"
               "Canis lupus_Gray Wolf",          # wild canid stays wildlife
               "Coyote"]
    for raw in not_dog:
        assert not _is_dog(Species.parse(raw)), raw


def test_image_provider_skips_nonbird_names():
    from birdnet_go_tpu.integrations.imageprovider import (
        ImageProviderService,
    )

    class _Boom:
        name = "boom"

        def fetch(self, scientific):
            raise AssertionError("provider must not be queried")

    svc = ImageProviderService([_Boom()])
    assert svc.get_image("Engine") is None
    assert svc.get_image("power_tool") is None
    assert svc.negative_hits == 2


def test_detection_rows_annotated_with_category(tmp_path):
    import datetime as dt

    from birdnet_go_tpu.analysis.results import Detection, Species
    from birdnet_go_tpu.api.server import ApiServer
    from birdnet_go_tpu.datastore.sqlite import Datastore

    ds = Datastore(tmp_path / "n.db")
    # a REAL Perch raw label goes through Species.parse (split on the
    # first underscore) before storage — annotation must rejoin it
    ds.insert_detection(Detection(
        species=Species.parse("Power_tool"),
        confidence=0.7, begin_seconds=0, end_seconds=3, model_id="Perch_V2",
        timestamp=dt.datetime(2026, 8, 1, 9)))
    ds.insert_detection(Detection(
        species=Species(scientific="Parus major", common="Great Tit"),
        confidence=0.9, begin_seconds=0, end_seconds=3, model_id="m",
        timestamp=dt.datetime(2026, 8, 1, 10)))
    rows = ApiServer._annotate_nonbird(ds.recent_detections(10))
    by_sci = {r["scientific_name"]: r for r in rows}
    assert by_sci["Power"]["nonbird_category"] == "mechanical"
    assert "nonbird_category" not in by_sci["Parus major"]
