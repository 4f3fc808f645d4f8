"""Regression tests for the third self-review batch: ONNX Expand two-way
broadcast, ONNX species probing in the model loader, MySQL FK hoisting /
optimize / type-keyed value coercion, species-tracker period seeding,
pipeline-stats unhealthy-interval logging, and native codec edge cases."""

from __future__ import annotations

import numpy as np
import pytest


def test_onnx_expand_lower_rank_shape():
    """ONNX Expand is a two-way broadcast: a shape input of LOWER rank
    than the data is valid (output rank = max of both)."""
    from tests.onnx_builder import model, node, tensor_proto
    from birdnet_go_tpu.inference.onnx_import import load_onnx

    blob = model(
        nodes=[node("Expand", ["x", "shp"], ["y"])],
        initializers=[tensor_proto("shp", np.array([3], np.int64))],
        inputs=["x"], outputs=["y"])
    g = load_onnx(blob)
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    (y,) = g.apply(g.params, x)
    np.testing.assert_array_equal(np.asarray(y), x)     # (2,3) unchanged
    # and a higher-rank shape still stretches
    blob2 = model(
        nodes=[node("Expand", ["x", "shp"], ["y"])],
        initializers=[tensor_proto("shp", np.array([4, 1, 3], np.int64))],
        inputs=["x"], outputs=["y"])
    g2 = load_onnx(blob2)
    (y2,) = g2.apply(g2.params, np.ones((2, 3), np.float32))
    assert np.asarray(y2).shape == (4, 2, 3)


def test_loader_probes_onnx_species(tmp_path):
    """load_model on an unregistered ONNX model id must discover the head
    width (predict_topk would crash on num_species=None)."""
    from tests.onnx_builder import model, node, tensor_proto, attr_int
    from birdnet_go_tpu.inference.loader import load_model

    w = np.random.default_rng(0).standard_normal((16, 11)).astype(np.float32)
    blob = model(
        nodes=[node("Gemm", ["x", "w"], ["pre"]),
               node("Sigmoid", ["pre"], ["y"])],
        initializers=[tensor_proto("w", w)],
        inputs=["x"], outputs=["y"])
    p = tmp_path / "custom.onnx"
    p.write_bytes(blob)
    m, params = load_model("CustomNet", checkpoint=str(p))
    assert m.num_species == 11
    assert m.spec.num_species == 11
    # transB=1: the head width is on the other axis
    blob2 = model(
        nodes=[node("Gemm", ["x", "w"], ["y"], [attr_int("transB", 1)])],
        initializers=[tensor_proto("w", w.T.copy())],
        inputs=["x"], outputs=["y"])
    p2 = tmp_path / "custom2.onnx"
    p2.write_bytes(blob2)
    m2, _ = load_model("CustomNet2", checkpoint=str(p2))
    assert m2.num_species == 11


def test_mysql_schema_hoists_fk_constraints():
    """Column-level REFERENCES are silently DISCARDED by MySQL; they must
    be hoisted into table-level FOREIGN KEY clauses so ON DELETE CASCADE
    exists on InnoDB."""
    from birdnet_go_tpu.datastore.mysql import translate_sql
    from birdnet_go_tpu.datastore.sqlite import _SCHEMA

    for stmt in _SCHEMA.split(";"):
        if "CREATE TABLE" not in stmt.upper():
            continue
        out = translate_sql(stmt)
        assert " REFERENCES " not in out.split("FOREIGN KEY")[0] \
            or "FOREIGN KEY" in out, out
    out = translate_sql(
        "CREATE TABLE t (id INTEGER PRIMARY KEY AUTOINCREMENT,"
        " detection_id INTEGER NOT NULL REFERENCES detections(id)"
        " ON DELETE CASCADE, v REAL)")
    assert "FOREIGN KEY (detection_id) REFERENCES detections(id)" \
        " ON DELETE CASCADE" in out
    assert "detection_id INTEGER NOT NULL," in out.replace("\n", "")


def test_species_tracker_period_seeding(tmp_path):
    """Restart must not reset this-year / this-season novelty."""
    import datetime as dt

    from birdnet_go_tpu.analysis.results import Detection, Species
    from birdnet_go_tpu.analysis.species_tracker import SpeciesTracker
    from birdnet_go_tpu.datastore.sqlite import Datastore

    ds = Datastore(tmp_path / "t.db")
    today = dt.date(2026, 7, 15)
    d = Detection(
        species=Species(scientific="Parus major", common="Great Tit"),
        confidence=0.9, begin_seconds=0, end_seconds=3, model_id="m",
        timestamp=dt.datetime(2026, 7, 10, 8, 0))
    ds.insert_detection(d)
    # a detection earlier in the year but before this season
    d2 = Detection(
        species=Species(scientific="Parus major", common="Great Tit"),
        confidence=0.9, begin_seconds=0, end_seconds=3, model_id="m",
        timestamp=dt.datetime(2026, 2, 1, 8, 0))
    ds.insert_detection(d2)

    tr = SpeciesTracker()
    tr.sync_from_datastore(ds, today=today)
    st = tr.observe("Parus major", when=today)
    assert not st.is_new_lifetime
    assert not st.is_new_this_year          # first seen Feb 1 this year
    assert not st.is_new_this_season        # first seen Jul 10 this season
    fs = tr.first_seen("Parus major", when=today)
    assert fs.this_year == dt.date(2026, 2, 1)
    assert fs.this_season == dt.date(2026, 7, 10)
    # a species never seen this season IS new this season after restart
    assert tr.observe("Turdus merula", when=today).is_new_lifetime


def test_pipeline_stats_logs_unhealthy_idle_interval():
    """Zero-throughput intervals with overruns or pending backlog must
    still log — those are exactly what an operator needs to see."""
    from birdnet_go_tpu.analysis.pipeline_stats import PipelineStatsLogger

    class _Stats:
        windows_processed = 0
        overruns = 3
        windows_deferred = 0
        last_batch_fill = 0.0
        last_latency_ms = 2000.0

    class _Batcher:
        stats = _Stats()

    class _Loop:
        windows_dropped = 0
        batchers = {"m": _Batcher()}

    logger = PipelineStatsLogger(device_loop=_Loop())
    line = logger.tick()
    assert line is not None and "overruns+3" in line


def test_opus_stream_small_out_cap_never_duplicates():
    """When the out buffer can't hold the next packet, unencoded frames
    stay in carry and are encoded exactly once on the next call."""
    from birdnet_go_tpu.audio import opusogg
    from birdnet_go_tpu.native import lib as native

    if not opusogg.opus_available():
        pytest.skip("libopus not present")
    import ctypes

    lib = native._load()
    pre = ctypes.c_int32()
    h = lib.bn_opus_stream_create(48000, 1, 64000, ctypes.byref(pre))
    assert h
    pcm = (np.sin(np.arange(48000 // 25) * 0.05) * 20000).astype(np.int16)
    n_pk = ctypes.c_int32()
    tiny = ctypes.create_string_buffer(8)    # can't hold any packet
    n = lib.bn_opus_stream_encode(
        ctypes.c_void_p(h), pcm.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int16)), len(pcm), tiny, 8,
        ctypes.byref(n_pk))
    assert n == 0 and n_pk.value == 0        # nothing consumed, no error
    big = ctypes.create_string_buffer(1 << 15)
    n2 = lib.bn_opus_stream_encode(
        ctypes.c_void_p(h), pcm.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int16)), 0, big, 1 << 15,
        ctypes.byref(n_pk))
    assert n2 > 0 and n_pk.value == 2        # both 20 ms frames, once each
    lib.bn_opus_stream_destroy(ctypes.c_void_p(h))


def test_ring_counters_null_safe():
    from birdnet_go_tpu.native import lib as native
    import ctypes

    lib = native._load()
    assert lib.bn_ring_available(ctypes.c_void_p(None)) == 0
    assert lib.bn_ring_lost(ctypes.c_void_p(None)) == 0
