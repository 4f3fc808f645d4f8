"""End-to-end offline analysis through the public pipeline (tiny model)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdnet_go_tpu.analysis.offline import OfflineAnalyzer, OfflineConfig
from birdnet_go_tpu.analysis.raven import format_raven_table, write_raven_table
from birdnet_go_tpu.audio.wav import write_wav
from birdnet_go_tpu.inference.backend import JaxClassifier, JaxRangeFilter
from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
from birdnet_go_tpu.models.efficientnet import BlockSpec, EfficientNetConfig
from birdnet_go_tpu.models.geomodel import Geomodel, GeomodelConfig
from birdnet_go_tpu.ops.melspec import MelConfig
from birdnet_go_tpu.taxonomy.labels import synthetic_labels

N_SPECIES = 19


@pytest.fixture(scope="module")
def tiny_classifier():
    m = BirdNETv24(num_species=N_SPECIES,
                   mel=MelConfig(sample_rate=48000, n_fft=512, hop=4096,
                                 n_mels=32),
                   compute_dtype=jnp.float32)
    m.net = EfficientNetConfig(
        blocks=(BlockSpec(1, 8, 3, 2, 1), BlockSpec(4, 16, 3, 2, 1)),
        embedding_dim=32, num_classes=N_SPECIES)
    params = m.init(jax.random.PRNGKey(0))
    return JaxClassifier(m, params)


def test_offline_analyze_samples(tiny_classifier):
    labels = synthetic_labels(N_SPECIES)
    an = OfflineAnalyzer(tiny_classifier, labels,
                         OfflineConfig(threshold=0.0, batch_size=4))
    rng = np.random.default_rng(1)
    samples = rng.standard_normal(48000 * 10).astype(np.float32) * 0.1
    report = an.analyze_samples(samples, 48000)
    # 10 s at 3 s clip / 3 s hop (overlap 0) → 3 full + 1 padded = 4 windows
    assert len(report.windows) == 4
    assert report.windows[0].begin_seconds == 0.0
    assert report.windows[1].begin_seconds == 3.0
    # threshold 0 → top-1 per window detected
    assert len(report.detections) == 4
    assert report.duration_seconds == pytest.approx(10.0)


def test_offline_analyze_overlap_and_resample(tiny_classifier):
    labels = synthetic_labels(N_SPECIES)
    an = OfflineAnalyzer(tiny_classifier, labels,
                         OfflineConfig(threshold=1.1, overlap=1.5,
                                       batch_size=4))
    rng = np.random.default_rng(2)
    samples = rng.standard_normal(32000 * 6).astype(np.float32) * 0.1
    report = an.analyze_samples(samples, 32000)   # resampled 32k→48k
    # 6 s audio, 3 s clip, hop 1.5 s → windows at 0, 1.5, 3.0 (+ padded 4.5)
    begins = [w.begin_seconds for w in report.windows]
    assert begins[:3] == [0.0, 1.5, 3.0]
    # threshold 1.1 → nothing detected
    assert report.detections == []


def test_offline_analyze_file_and_raven(tmp_path, tiny_classifier):
    labels = synthetic_labels(N_SPECIES)
    an = OfflineAnalyzer(tiny_classifier, labels,
                         OfflineConfig(threshold=0.0, batch_size=4))
    rng = np.random.default_rng(3)
    wav_path = tmp_path / "field.wav"
    write_wav(wav_path, rng.standard_normal(48000 * 4).astype(np.float32) * .2,
              48000)
    report = an.analyze_file(wav_path)
    out = write_raven_table(report.detections, wav_path, tmp_path / "out")
    text = out.read_text()
    lines = text.strip().split("\n")
    assert lines[0].startswith("Selection\tView\tChannel\tBegin File")
    assert len(lines) == 1 + len(report.detections)
    first = lines[1].split("\t")
    assert first[0] == "1"
    assert first[3] == "field.wav"
    assert first[4] == "0.0" and first[5] == "3.0"
    assert first[6] == "0" and first[7] == "15000"
    float(first[10])   # confidence parses


def test_raven_format_exact():
    from birdnet_go_tpu.analysis.results import Detection
    from birdnet_go_tpu.taxonomy.labels import Species

    d = Detection(species=Species("Poecile atricapillus",
                                  "Black-capped Chickadee"),
                  confidence=0.9016, begin_seconds=0.0, end_seconds=3.0,
                  model_id="BirdNET_V2.4", window_index=0,
                  species_code="bkcchi")
    table = format_raven_table([d], "soundscape.wav")
    assert table.splitlines()[1] == (
        "1\tSpectrogram 1\t1\tsoundscape.wav\t0.0\t3.0\t0\t15000\t"
        "bkcchi\tBlack-capped Chickadee\t0.9016")


def test_range_mask_gates_detections(tiny_classifier):
    labels = synthetic_labels(N_SPECIES)
    an = OfflineAnalyzer(tiny_classifier, labels,
                         OfflineConfig(threshold=0.0, batch_size=4))
    rng = np.random.default_rng(4)
    samples = rng.standard_normal(48000 * 3).astype(np.float32) * 0.1
    base = an.analyze_samples(samples, 48000)
    top_idx = base.detections[0].species
    # mask out the winner; next species should surface instead
    mask = np.ones(N_SPECIES, np.float32)
    mask[labels.index_by_scientific[top_idx.scientific]] = 0.0
    tiny_classifier.set_range_mask(mask)
    try:
        masked = an.analyze_samples(samples, 48000)
        assert masked.detections[0].species.scientific != top_idx.scientific
    finally:
        tiny_classifier.set_range_mask(None)


def test_range_filter_validation(rng_key):
    g = Geomodel(GeomodelConfig(num_species=8, hidden=(16,)))
    rf = JaxRangeFilter(g, g.init(rng_key))
    with pytest.raises(ValueError):
        rf.predict(91.0, 0.0, 1)
    with pytest.raises(ValueError):
        rf.predict(0.0, -181.0, 1)
    scores = rf.predict(60.0, 24.9, 23)
    assert scores.shape == (8,)


def test_perch_offline_analysis_with_taxonomy_mapping(tmp_path):
    """North-star config 2: Perch-family batch file analysis — a 48 kHz
    WAV resamples to the model's native 32 kHz / 5 s windows, and label
    names flow through the taxonomy alias map (openfauna): a detection
    under a model-era legacy name resolves to the same canonical species
    the rest of the system keys on."""
    from birdnet_go_tpu.models.perch_v2 import PerchV2
    from birdnet_go_tpu.taxonomy.labels import LabelSet, Species
    from birdnet_go_tpu.taxonomy.openfauna import canonical_name

    m = PerchV2(num_species=4,
                mel=MelConfig(sample_rate=32000, n_fft=512, hop=4096,
                              n_mels=32),
                compute_dtype=jnp.float32)
    m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                               embedding_dim=16, num_classes=4)
    clf = JaxClassifier(m, m.init(jax.random.PRNGKey(3)))
    assert m.spec.sample_rate == 32000 and m.spec.clip_seconds == 5.0

    # Perch's 2023-era label list uses the legacy dove name; openfauna
    # maps it to the current canonical binomial
    legacy = "Streptopelia senegalensis"
    labels = LabelSet(species=[
        Species(legacy, "Laughing Dove"),
        Species("Parus major", "Great Tit"),
        Species("Human vocal", "Human vocal"),
        Species("Strix aluco", "Tawny Owl")], locale="en", codes=None)
    assert canonical_name(legacy) != legacy       # alias table is live

    rng = np.random.default_rng(5)
    wav = tmp_path / "soundscape48k.wav"
    write_wav(wav, (rng.standard_normal(48000 * 12) * 2000
                    ).astype(np.int16), 48000)
    an = OfflineAnalyzer(clf, labels,
                         OfflineConfig(threshold=0.0, batch_size=4))
    report = an.analyze_file(str(wav))
    # 12 s at 5 s windows / 5 s hop → 2 full + 1 padded
    assert len(report.windows) == 3
    assert report.windows[1].begin_seconds == pytest.approx(5.0)
    assert report.detections
    names = {d.species.scientific for d in report.detections}
    assert names <= {legacy, "Parus major", "Human vocal", "Strix aluco"}
    # the Raven table renders with the detection rows intact
    table = format_raven_table(report.detections, "soundscape48k.wav")
    assert len(table.splitlines()) >= 1 + len(report.detections)
