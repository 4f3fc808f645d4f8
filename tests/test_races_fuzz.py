"""Race-regression + fuzz suite.

Reference test strategy (SURVEY.md §4/§5): `-race` CI plus dedicated
race-reproduction tests (birdnet_backend_lifecycle_race_test.go,
settings_race_test.go) and fuzz tests (api/v2/fuzz_test.go). Python has no
race detector, so these tests hammer the shared-state hot paths from many
threads and assert invariants (no exceptions, conserved counts, sane
state), plus hypothesis fuzzing of the parsers and codecs.
"""

import threading
import time

import numpy as np
import pytest
from hypothesis import given, settings as hsettings, strategies as st

import jax

jax.config.update("jax_platforms", "cpu")


def _hammer(workers):
    """Run worker callables concurrently; re-raise the first exception."""
    errors = []

    def wrap(fn):
        def run():
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                errors.append(e)
        return run

    threads = [threading.Thread(target=wrap(w), daemon=True)
               for w in workers]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    if errors:
        raise errors[0]


# -- engine: concurrent ingest / collect / source & model add/remove ----------------

def test_engine_concurrent_lifecycle_race():
    from birdnet_go_tpu.audio.engine import AudioEngine
    from birdnet_go_tpu.audio.source import AudioSource, SourceType
    from birdnet_go_tpu.models.registry import ModelSpec

    spec_a = ModelSpec(model_id="A", display_name="a", sample_rate=48000,
                       clip_seconds=1.0, num_species=3)
    spec_b = ModelSpec(model_id="B", display_name="b", sample_rate=48000,
                       clip_seconds=1.0, num_species=3)
    eng = AudioEngine([spec_a])
    stop = threading.Event()
    collected = []

    def src(i):
        return AudioSource(source_id=f"s{i}", source_type=SourceType.FILE,
                           display_name=f"s{i}", sample_rate=48000)

    for i in range(4):
        eng.add_source(src(i))

    def ingester(i):
        def run():
            pcm = np.ones(4800, np.int16)
            while not stop.is_set():
                eng.ingest(f"s{i}", pcm)
        return run

    def collector():
        while not stop.is_set():
            collected.extend(eng.collect_ready())

    def churner():
        n = 4
        while not stop.is_set():
            eng.add_source(src(n))
            eng.ingest(f"s{n}", np.ones(4800, np.int16))
            eng.remove_source(f"s{n}")
            n += 1
            eng.add_model(spec_b)
            eng.remove_model("B")

    workers = [ingester(i) for i in range(4)] + [collector, churner]
    t = threading.Thread(target=lambda: (time.sleep(2), stop.set()))
    t.start()
    _hammer(workers)
    t.join()
    # windows that did arrive are well-formed
    for model_id, w, sid, start, rate in collected:
        assert len(w) == 48000 and rate == 48000


# -- processor: concurrent submit/flush/reconfigure -----------------------------------

def test_processor_concurrent_submit_flush_race():
    from birdnet_go_tpu.analysis.processor import Processor, WindowPrediction
    from tests.test_processor import make_labels

    from birdnet_go_tpu.config.settings import ModelSettings, Settings

    s = Settings()
    s.models = [ModelSettings(model_id="M", threshold=0.2)]
    s.dynamic_threshold.enabled = True
    approved = []
    p = Processor(s, {"M": make_labels()},
                  on_approved=lambda d, item: approved.append(d))
    stop = threading.Event()
    submitted = [0]

    def submitter(tid):
        def run():
            i = 0
            while not stop.is_set():
                t0 = time.time() - 100        # already past deadline
                p.submit(WindowPrediction(
                    source_id=f"src{tid}", model_id="M", start_time=t0 + i,
                    end_time=t0 + i + 3, indices=[tid % 2 * 4],
                    confidences=[0.95]))
                submitted[0] += 1
                i += 1
        return run

    def flusher():
        while not stop.is_set():
            p.flush()

    def reconfigurer():
        while not stop.is_set():
            p.set_included_species({"Turdus merula", "Parus major"})
            p.set_included_species(None)
            p.dynamic.clear()

    t = threading.Thread(target=lambda: (time.sleep(2), stop.set()))
    t.start()
    _hammer([submitter(i) for i in range(3)] + [flusher, reconfigurer])
    t.join()
    p.flush(now=time.time() + 1e7)
    st = p.stats
    # conservation: everything submitted is accounted for exactly once
    assert st.results_processed == submitted[0]
    assert st.detections_approved == len(approved)
    assert st.detections_approved + st.detections_discarded \
        == st.detections_pending
    assert len(p.pending_snapshot()) == 0


# -- notification inbox + event tracker under concurrency ------------------------------

def test_inbox_and_tracker_concurrency():
    from birdnet_go_tpu.analysis.eventtracker import EventTracker, EventType
    from birdnet_go_tpu.integrations.notification import (
        Notification,
        NotificationInbox,
    )

    inbox = NotificationInbox(capacity=200)
    tracker = EventTracker(default_interval_seconds=0.0)
    stop = threading.Event()
    added = [0]
    lock = threading.Lock()

    def producer():
        while not stop.is_set():
            inbox.add(Notification(title="t", message="m"))
            with lock:
                added[0] += 1
            tracker.track(EventType.LOG_TO_FILE, "Sp x")

    def consumer():
        while not stop.is_set():
            for n in inbox.list(limit=50):
                inbox.mark_read(n["id"])
            inbox.unread_count()
            inbox.mark_all_read()

    t = threading.Thread(target=lambda: (time.sleep(1.5), stop.set()))
    t.start()
    _hammer([producer, producer, consumer, consumer])
    t.join()
    assert added[0] > 0
    assert len(inbox.list(limit=500)) <= 200     # capacity respected


# -- thread-leak gate (goleak analogue) -------------------------------------------------

def test_app_thread_leak(tmp_path, monkeypatch):
    """Start + stop the full app; every thread it spawned must exit
    (reference: goleak gates in zz_goleak_test.go)."""
    from tests.test_app_integration import tiny_app as _unused  # noqa: F401
    import birdnet_go_tpu.app as app_mod
    from birdnet_go_tpu.app import Application
    from birdnet_go_tpu.config.settings import ModelSettings, Settings
    import jax.numpy as jnp

    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import (
        BlockSpec,
        EfficientNetConfig,
    )
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny_load_model(model_id, checkpoint=None, seed=0, **kw):
        m = BirdNETv24(num_species=4,
                       mel=MelConfig(sample_rate=48000, n_fft=256, hop=8192,
                                     n_mels=16),
                       compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                                   embedding_dim=8, num_classes=4)
        return m, m.init(jax.random.PRNGKey(0))

    monkeypatch.setattr(app_mod, "load_model", tiny_load_model)
    s = Settings()
    s.models = [ModelSettings(model_id="BirdNET_V2.4", threshold=0.5)]
    s.database.path = str(tmp_path / "leak.db")
    s.webserver.enabled = False
    s.realtime.sources = [{"type": "tone", "id": "t0"}]

    before = {t.name for t in threading.enumerate()}
    app = Application(s)
    app.setup()
    app.start(warmup=False)
    time.sleep(0.5)
    app.stop()
    deadline = time.time() + 10
    leaked_names: list[str] = []
    while time.time() < deadline:
        leaked_names = sorted(t.name for t in threading.enumerate()
                              if t.name not in before and t.is_alive())
        if not leaked_names:
            break
        time.sleep(0.1)
    assert not leaked_names, f"threads leaked: {leaked_names}"


# -- fuzz: parsers never crash uncontrolled ---------------------------------------------

@hsettings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_tflite_parser_controlled_failure(data):
    from birdnet_go_tpu.inference.tflite_import import parse_tflite

    try:
        parse_tflite(b"TFL3" + data)
    except Exception as e:
        assert isinstance(e, (ValueError, KeyError, IndexError,
                              struct_error_types())), type(e)


def struct_error_types():
    import struct

    return struct.error


@hsettings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_wav_reader_controlled_failure(data):
    import io

    from birdnet_go_tpu.audio.wav import read_wav

    try:
        read_wav(io.BytesIO(b"RIFF\x00\x00\x00\x00WAVE" + data))
    except (ValueError, struct_error_types()):
        pass


@hsettings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=9000),
       st.sampled_from([8000, 22050, 48000, 256000]))
def test_fuzz_flac_roundtrip(samples, rate):
    from birdnet_go_tpu.audio.flac import decode_flac, encode_flac

    pcm = np.array(samples, np.int16)
    dec, r = decode_flac(encode_flac(pcm, rate))
    assert r == rate
    np.testing.assert_array_equal(dec, pcm)


@hsettings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=5000),
       st.integers(min_value=1, max_value=3000),
       st.lists(st.integers(min_value=1, max_value=4000), min_size=1,
                max_size=8))
def test_fuzz_analysis_buffer_windows(overlap, read, chunks):
    """Window invariants hold for arbitrary dims/chunkings: every window is
    overlap+read long, fresh regions are contiguous input, overlap prefix
    chains from the previous window."""
    from birdnet_go_tpu.audio.buffers import AnalysisBuffer

    buf = AnalysisBuffer(overlap_samples=overlap, read_samples=read,
                         capacity_samples=4 * (overlap + read))
    chunks = [min(c, 3 * read) for c in chunks]   # never outpace capacity
    src = np.arange(1, sum(chunks) + 1, dtype=np.int16)
    pos = 0
    prev_tail = np.zeros(overlap, np.int16)
    consumed = 0
    for n in chunks:
        buf.write(src[pos:pos + n])
        pos += n
        while True:
            w = buf.read()
            if w is None:
                break
            assert len(w) == overlap + read
            np.testing.assert_array_equal(w[:overlap], prev_tail)
            np.testing.assert_array_equal(
                w[overlap:], src[consumed:consumed + read])
            consumed += read
            prev_tail = w[len(w) - overlap:] if overlap else prev_tail


def test_jobqueue_priority_concurrent_stress():
    """Hammer the priority job queue from parallel producers across all
    bands while workers drain and retries recycle: counters must balance
    exactly (enqueued = completed + failed + still-pending + requeue
    drops) and no critical job may be lost while lower-priority jobs
    remain shed-able. Guards the band/eviction locking added in round 4."""
    import random
    import threading
    import time as _t

    from birdnet_go_tpu.analysis.jobqueue import JobQueue, RetryConfig

    q = JobQueue(capacity=64, workers=3)
    q.start()
    done = {"critical": 0, "low": 0, "normal": 0}
    done_lock = threading.Lock()
    cats = [("database", "critical"), ("clip", "critical"),
            ("spectrogram", "normal"), ("log", "low"), ("mqtt", "low"),
            ("alert", "low")]

    def produce(seed):
        rng = random.Random(seed)
        for _ in range(400):
            cat, band = rng.choice(cats)

            def work(band=band):
                with done_lock:
                    done[band] += 1

            def flaky(band=band, rng_val=rng.random()):
                if rng_val < 0.5:
                    raise RuntimeError("transient")
                with done_lock:
                    done[band] += 1

            if rng.random() < 0.1:
                q.enqueue(flaky, "flaky",
                          retry=RetryConfig(enabled=True, max_retries=2,
                                            initial_delay=0.001,
                                            max_delay=0.002),
                          category=cat)
            else:
                q.enqueue(work, "w", category=cat)
            if rng.random() < 0.05:
                _t.sleep(0.001)

    threads = [threading.Thread(target=produce, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    q.stop(drain=True, timeout=20.0)

    st = q.stats
    # exact ledger: every ATTEMPT ends exactly one way — completed,
    # failed permanently, or dropped (at enqueue, by eviction, or on a
    # full-queue retry requeue). Nothing is double-counted or lost.
    assert q.pending() == 0
    assert st.completed + st.failed + st.dropped == 1600
    assert st.shed <= st.dropped
    # shedding discipline: critical jobs are never evicted
    for cat in ("database", "clip"):
        assert st.by_category.get(cat, {}).get("shed", 0) == 0
    # per-category ledgers sum to the global ones
    for counter in ("enqueued", "completed", "failed", "dropped", "shed"):
        assert getattr(st, counter) == sum(
            v[counter] for v in st.by_category.values())


def test_jobqueue_stop_drain_waits_for_inflight_retry():
    """Regression for the r4 ledger flake: a job that is IN FLIGHT when
    stop(drain=True) samples the queue must not be stranded when it
    requeues itself for retry after the sample. pending() cannot see a
    popped job, so drain must wait on outstanding() (queued + in-flight)
    — otherwise completed+failed+dropped comes up one short and the job
    sits in the bands forever (jobqueue/queue.go:59-204 lifecycle:
    every job ends exactly one way)."""
    import threading
    import time as _t

    from birdnet_go_tpu.analysis.jobqueue import JobQueue, RetryConfig

    q = JobQueue(capacity=8, workers=1)
    q.start()
    started = threading.Event()
    calls = []

    def flaky():
        calls.append(1)
        started.set()
        _t.sleep(0.05)      # hold the job in flight across the sample
        if len(calls) == 1:
            raise RuntimeError("transient")

    q.enqueue(flaky, "inflight-retry",
              retry=RetryConfig(enabled=True, max_retries=2,
                                initial_delay=0.001, max_delay=0.002),
              category="database")
    assert started.wait(5), "job never started"
    # the queue LOOKS empty (job is in flight), but drain must still wait
    assert q.pending() == 0
    assert q.outstanding() == 1
    q.stop(drain=True, timeout=10.0)

    st = q.stats
    assert q.pending() == 0, "retried job stranded in the queue"
    assert st.completed == 1 and st.failed == 0 and st.dropped == 0
    assert st.retried == 1
    assert st.completed + st.failed + st.dropped == 1
