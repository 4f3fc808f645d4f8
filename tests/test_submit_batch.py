"""Vectorized Processor.submit_batch must be behaviorally identical to
per-window submit() — same counters, pending map, privacy/dog bookkeeping,
and dynamic-threshold state — on randomized top-K batches covering human,
dog, custom-threshold, excluded, and sub-floor results (the fast-reject
gate's soundness contract; reference processes per-result in Go,
processor.go:423-470)."""

import copy

import numpy as np
import pytest

from birdnet_go_tpu.analysis.processor import Processor, WindowPrediction
from birdnet_go_tpu.config.settings import ModelSettings, Settings
from birdnet_go_tpu.taxonomy.labels import LabelSet, Species

M = "BirdNET_V2.4"


def _labels():
    return LabelSet(species=[
        Species("Turdus merula", "Eurasian Blackbird"),        # 0
        Species("Strix aluco", "Tawny Owl"),                   # 1
        Species("Human vocal", "Human vocal"),                 # 2
        Species("Canis familiaris", "Dog"),                    # 3
        Species("Parus major", "Great Tit"),                   # 4
        Species("Pica pica", "Eurasian Magpie"),               # 5
        Species("Corvus corax", "Common Raven"),               # 6
        Species("Erithacus rubecula", "European Robin"),       # 7
    ])


def _settings(dynamic=False):
    s = Settings()
    s.models = [ModelSettings(model_id=M, threshold=0.5)]
    s.export.clip_length_seconds = 15.0
    s.export.pre_capture_seconds = 3.0
    s.species.config = {"Pica pica": {"threshold": 0.15}}
    s.species.exclude = ["Corvus corax"]
    s.dynamic_threshold.enabled = dynamic
    return s


def _proc(dynamic=False):
    now = [1000.0]
    p = Processor(_settings(dynamic), {M: _labels()},
                  clock=lambda: now[0])
    return p


def _random_batch(seed, n=64, k=4, n_species=8):
    rng = np.random.default_rng(seed)
    vals = rng.random((n, k)).astype(np.float32) ** 2   # mostly low
    vals[:] = np.sort(vals)[:, ::-1]
    idx = rng.integers(-1, n_species + 1, (n, k)).astype(np.int32)
    sids = [f"s{int(v)}" for v in rng.integers(0, 5, n)]
    sts = 1000.0 + np.arange(n) * 1.5
    return sids, sts, sts + 3.0, vals, idx


def _state(p):
    return {
        "stats": copy.deepcopy(vars(p.stats)),
        "pending": {k: (v.detection.species.scientific, v.count,
                        round(v.detection.confidence, 6))
                    for k, v in p._pending.items()},
        "human": dict(p._last_human),
        "dog": dict(p._last_dog),
        "dyn": {k: (v.level, v.high_conf_count)
                for k, v in p.dynamic._state.items()},
    }


@pytest.mark.parametrize("dynamic", [False, True])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_submit_batch_matches_scalar(seed, dynamic):
    sids, sts, ends, vals, idx = _random_batch(seed)
    # force interesting coverage: a privacy-floor human hit, a dog hit,
    # a custom-threshold hit below the model base, an excluded-species
    # hit, and a full row of sub-floor results
    vals[0, 0], idx[0, 0] = 0.07, 2      # human above privacy floor 0.05
    vals[1, 0], idx[1, 0] = 0.12, 3      # dog above dog floor 0.1
    vals[2, 0], idx[2, 0] = 0.2, 5       # custom 0.15 < conf < base 0.5
    vals[3, 0], idx[3, 0] = 0.9, 6       # excluded species, high conf
    vals[4, :], idx[4, :] = 0.01, 0      # entire row sub-floor
    vals[5, 0], idx[5, 0] = 0.95, 1      # plain approval-track hit

    pa = _proc(dynamic)
    pb = _proc(dynamic)
    for r in range(len(vals)):
        pa.submit(WindowPrediction(
            source_id=sids[r], model_id=M, start_time=float(sts[r]),
            end_time=float(ends[r]), indices=idx[r].tolist(),
            confidences=vals[r].tolist()))
    pb.submit_batch(M, sids, sts, ends, vals, idx)
    assert _state(pa) == _state(pb)


def test_submit_batch_ultrasonic_rows():
    """Rows failing the window-level ultrasonic CV gate are discarded with
    the same counters/reasons as scalar submit."""
    sids, sts, ends, vals, idx = _random_batch(9, n=8)
    vals[:, 0] = 0.9
    idx[:, 0] = 1
    cv = np.array([0.1, 0.9, 0.05, 0.9, 0.9, 0.0, 0.9, 0.9], np.float32)

    def proc():
        now = [1000.0]
        s = _settings()
        s.ultrasonic_filter.enabled = True
        s.ultrasonic_filter.cv_threshold = 0.3
        return Processor(s, {M: _labels()}, clock=lambda: now[0])

    pa, pb = proc(), proc()
    for r in range(len(vals)):
        pa.submit(WindowPrediction(
            source_id=sids[r], model_id=M, start_time=float(sts[r]),
            end_time=float(ends[r]), indices=idx[r].tolist(),
            confidences=vals[r].tolist(), ultrasonic_cv=float(cv[r])))
    pb.submit_batch(M, sids, sts, ends, vals, idx, ultrasonic_cv=cv)
    assert _state(pa) == _state(pb)
    assert pb.stats.discard_reasons.get("ultrasonic filter") == 3


def test_fast_gate_cache_invalidates_on_settings_change():
    p = _proc()
    labels = p.labels_by_model[M]
    thr1, _ = p._fast_gate(M, labels)
    assert thr1[2] == pytest.approx(0.05)     # human → privacy floor
    assert thr1[3] == pytest.approx(0.1)      # dog → bark floor
    assert thr1[5] == pytest.approx(0.15)     # custom threshold
    assert thr1[0] == pytest.approx(0.5)      # base
    p.settings.species.config = {"Turdus merula": {"threshold": 0.9}}
    thr2, _ = p._fast_gate(M, labels)
    assert thr2[0] == pytest.approx(0.9)


def test_fast_gate_canonicalizes_legacy_labels():
    """A custom threshold configured under the CANONICAL name must gate
    legacy-label model species too — submit() canonicalizes before
    thresholding, and the vectorized gate must match (review finding:
    the gate used raw labels and silently dropped such detections)."""
    from birdnet_go_tpu.taxonomy import openfauna

    legacy, canon = None, None
    for old, new in openfauna.load_aliases().items():
        if old != new:
            legacy, canon = old, new
            break
    if legacy is None:
        pytest.skip("no aliases loaded")
    labels = LabelSet(species=[Species(legacy, "Legacy Bird"),
                               Species("Turdus merula", "Blackbird")])
    s = _settings()
    s.species.config = {canon: {"threshold": 0.2}}
    now = [1000.0]
    pa = Processor(s, {M: labels}, clock=lambda: now[0])
    pb = Processor(_settings(), {M: labels}, clock=lambda: now[0])
    pb.settings.species.config = {canon: {"threshold": 0.2}}

    vals = np.array([[0.4, 0.1]], np.float32)   # 0.2 < 0.4 < base 0.5
    idx = np.array([[0, 1]], np.int32)
    pa.submit(WindowPrediction(source_id="s", model_id=M,
                               start_time=1000.0, end_time=1003.0,
                               indices=[0, 1], confidences=[0.4, 0.1]))
    pb.submit_batch(M, ["s"], [1000.0], [1003.0], vals, idx)
    assert len(pa._pending) == 1
    assert _state(pa)["pending"] == _state(pb)["pending"]


def test_fast_gate_cache_not_fooled_by_reused_dict_address():
    """The gate cache retains the config object it fingerprinted, so a
    replacement dict landing at the same address cannot alias a stale
    entry."""
    p = _proc()
    labels = p.labels_by_model[M]
    thr1, _ = p._fast_gate(M, labels)
    # the cache entry must hold a strong ref to the fingerprinted config
    assert p._gate_cache[M][3][1] is p.settings.species.config
