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


def test_privacy_filter_catches_fsd50k_speech_classes():
    from birdnet_go_tpu.analysis.processor import _is_human
    from birdnet_go_tpu.analysis.results import Species

    assert _is_human(Species(scientific="male_speech_and_man_speaking",
                             common=""))
    assert _is_human(Species(scientific="Human vocal", common="Human"))
    assert not _is_human(Species(scientific="Parus major",
                                 common="Great Tit"))


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
    ds.insert_detection(Detection(
        species=Species(scientific="power_tool", common="Power tool"),
        confidence=0.7, begin_seconds=0, end_seconds=3, model_id="Perch_V2",
        timestamp=dt.datetime(2026, 8, 1, 9)))
    ds.insert_detection(Detection(
        species=Species(scientific="Parus major", common="Great Tit"),
        confidence=0.9, begin_seconds=0, end_seconds=3, model_id="m",
        timestamp=dt.datetime(2026, 8, 1, 10)))
    rows = ApiServer._annotate_nonbird(ds.recent_detections(10))
    by_sci = {r["scientific_name"]: r for r in rows}
    assert by_sci["power_tool"]["nonbird_category"] == "mechanical"
    assert "nonbird_category" not in by_sci["Parus major"]
