"""Model gallery, BirdNET-Pi import, support bundle, training pipeline."""

import io
import json
import tarfile

import numpy as np
import pytest

from birdnet_go_tpu.models.catalog import (
    CatalogEntry,
    ModelManager,
    catalog_entries,
    get_entry,
)
from birdnet_go_tpu.utils.imports import (
    import_birdnet_pi,
    parse_birdnet_pi_log,
)
from birdnet_go_tpu.utils.support import collect_support_bundle, scrub


# -- catalog/manager -------------------------------------------------------------

def test_catalog_entries_cover_registry():
    ids = {e.model_id for e in catalog_entries()}
    assert {"BirdNET_V2.4", "Perch_V2", "BattyBirdNET"} <= ids
    assert get_entry("BirdNET_V2.4").file_name == "model.tflite"
    assert get_entry("nope") is None


def test_manager_install_from_file_and_loader(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from tflite_builder import ModelBuilder, fully_connected_options

    from birdnet_go_tpu.inference.tflite_import import Op

    mb = ModelBuilder()
    w = np.ones((3, 8), np.float32)
    x_t = mb.add_tensor([1, 8], "in")
    w_t = mb.add_tensor([3, 8], "w", w)
    y_t = mb.add_tensor([1, 3], "out")
    mb.add_op(Op.FULLY_CONNECTED, [x_t, w_t, -1], [y_t],
              lambda b: fully_connected_options(b))
    mb.inputs, mb.outputs = [x_t], [y_t]
    artifact = tmp_path / "toy.tflite"
    artifact.write_bytes(mb.finish())

    home = tmp_path / "models"
    mgr = ModelManager(home=home)
    dest = mgr.install_from_file("Toy_X", artifact)
    assert dest == home / "Toy_X" / "model.tflite"
    assert mgr.is_installed("Toy_X")
    inv = mgr.installed()
    assert inv[0]["model_id"] == "Toy_X" and inv[0]["bytes"] > 0

    # loader resolves the installed artifact
    import os

    from birdnet_go_tpu.inference import loader

    os.environ["BIRDNET_TPU_MODELS"] = str(home)
    try:
        model, params = loader.load_model("Toy_X")
        out = model.apply(params, np.ones((1, 8), np.float32))
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   [[8.0, 8.0, 8.0]], rtol=1e-5)
    finally:
        del os.environ["BIRDNET_TPU_MODELS"]
    assert mgr.remove("Toy_X")
    assert not mgr.is_installed("Toy_X")


def test_manager_refuses_unpinned_download(tmp_path):
    mgr = ModelManager(home=tmp_path)
    with pytest.raises(ValueError, match="unpinned|no artifact"):
        mgr.install_from_url(CatalogEntry(
            model_id="X", display_name="X", description="",
            url="http://example/x.onnx", sha256="", file_name="model.onnx"))


def test_manager_verifies_sha256(tmp_path):
    import hashlib

    payload = b"fake model bytes"

    class _Resp:
        headers = {"Content-Length": str(len(payload))}

        def raise_for_status(self):
            pass

        def iter_bytes(self, n):
            yield payload

        def __enter__(self):
            return self

        def __exit__(self, *a):
            pass

    class _Session:
        def stream(self, method, url):
            return _Resp()

    good = hashlib.sha256(payload).hexdigest()
    mgr = ModelManager(home=tmp_path, session=_Session())
    entry = CatalogEntry(model_id="Y", display_name="Y", description="",
                         url="http://example/y.onnx", sha256=good,
                         file_name="model.onnx")
    dest = mgr.install_from_url(entry)
    assert dest.read_bytes() == payload
    bad = dict(model_id="Z", display_name="Z", description="",
               url="http://example/z.onnx", sha256="0" * 64,
               file_name="model.onnx")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        mgr.install_from_url(CatalogEntry(**bad))


# -- BirdNET-Pi import ----------------------------------------------------------------

PI_LOG = """Date;Time;Sci_Name;Com_Name;Confidence;Lat;Lon;Cutoff;Week;Sens;Overlap
2026-05-01;06:15:00;Turdus merula;Eurasian Blackbird;0.91;60.1;24.9;0.0;18;1.25;0.0
2026-05-01;06:18:30;Parus major;Great Tit;0.67;60.1;24.9;0.0;18;1.25;0.0
2026-05-01;06:20:00;Turdus merula;Eurasian Blackbird;0.45;60.1;24.9;0.0;18;1.25;0.0
garbage line without enough columns
"""


def test_parse_birdnet_pi_log(tmp_path):
    p = tmp_path / "BirdDB.txt"
    p.write_text(PI_LOG)
    dets = parse_birdnet_pi_log(p)
    assert len(dets) == 3
    assert dets[0].species.scientific == "Turdus merula"
    assert dets[0].confidence == 0.91
    assert dets[0].timestamp.hour == 6


def test_import_with_dedup_and_threshold(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore

    p = tmp_path / "BirdDB.txt"
    p.write_text(PI_LOG)
    ds = Datastore(":memory:")
    res = import_birdnet_pi(ds, p, min_confidence=0.5)
    assert res.imported == 2 and res.skipped == 1
    # idempotent: second run dedups
    res2 = import_birdnet_pi(ds, p, min_confidence=0.5)
    assert res2.imported == 0 and res2.skipped == 3
    assert ds.count_detections() == 2


# -- support bundle -----------------------------------------------------------------------

def test_scrub_redacts_secrets():
    cfg = {"mqtt": {"password": "hunter2", "host": "x"},
           "url": "rtsp://admin:pw@cam/stream",
           "list": [{"api_key": "abc"}]}
    s = scrub(cfg)
    assert s["mqtt"]["password"] == "***"
    assert "pw" not in s["url"] and "admin" in s["url"]
    assert s["list"][0]["api_key"] == "***"
    assert s["mqtt"]["host"] == "x"


def test_support_bundle_contents():
    b = collect_support_bundle()
    with tarfile.open(fileobj=io.BytesIO(b.data)) as tar:
        names = {m.name for m in tar.getmembers()}
        assert "system.json" in names
        sysinfo = json.loads(tar.extractfile("system.json").read())
        assert "platform" in sysinfo


# -- training pipeline ----------------------------------------------------------------------

def test_train_cli_end_to_end(tmp_path):
    """Full `train` command on a synthetic 2-class tone dataset."""
    from birdnet_go_tpu.audio.wav import write_wav
    from birdnet_go_tpu.cli.main import main

    rng = np.random.default_rng(0)
    for cls, freq in (("lowtone", 500.0), ("hightone", 6000.0)):
        d = tmp_path / "ds" / cls
        d.mkdir(parents=True)
        for i in range(2):
            t = np.arange(48000 * 12) / 48000.0   # 12 s → 4 windows/file
            x = 0.4 * np.sin(2 * np.pi * freq * t) \
                + 0.01 * rng.standard_normal(len(t))
            write_wav(d / f"{i}.wav", x.astype(np.float32), 48000)

    out = tmp_path / "ckpt"
    rc = main(["train", str(tmp_path / "ds"), "--output", str(out),
               "--epochs", "15", "--batch-size", "4", "--tiny",
               "--learning-rate", "3e-3"])
    assert rc == 0
    assert json.loads((out / "labels.json").read_text()) == \
        ["hightone", "lowtone"]

    # reload the checkpoint and verify it separates the classes
    import jax
    import jax.numpy as jnp

    from birdnet_go_tpu.inference.checkpoint import load_params
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import (
        BlockSpec,
        EfficientNetConfig,
    )
    from birdnet_go_tpu.ops.melspec import MelConfig

    model = BirdNETv24(num_species=2,
                       mel=MelConfig(sample_rate=48000, n_fft=512,
                                     hop=4096, n_mels=32),
                       compute_dtype=jnp.float32)
    model.net = EfficientNetConfig(
        blocks=(BlockSpec(1, 8, 3, 2, 1), BlockSpec(4, 16, 3, 2, 1)),
        embedding_dim=32, num_classes=2)
    params = load_params(out)
    t = np.arange(48000 * 3) / 48000.0
    # same distribution as training: tone + the 0.01 noise floor (log-mel
    # makes a noiseless signal strongly out-of-distribution)
    noise = 0.01 * rng.standard_normal(len(t))
    low = 0.4 * np.sin(2 * np.pi * 500.0 * t) + noise
    high = 0.4 * np.sin(2 * np.pi * 6000.0 * t) + noise
    pcm = jnp.asarray(np.stack([low, high]), jnp.float32)
    logits = np.asarray(jax.jit(model.apply)(params, pcm)["logits"])
    # class order: ["hightone", "lowtone"]
    assert logits[0, 1] > logits[0, 0]      # low tone → "lowtone"
    assert logits[1, 0] > logits[1, 1]      # high tone → "hightone"


# -- legacy BirdNET-Go database migration ------------------------------------------

def _make_legacy_db(path):
    """Build a miniature of the reference's GORM schema
    (datastore/model.go: notes + results/note_reviews/note_comments/
    note_locks)."""
    import sqlite3

    conn = sqlite3.connect(path)
    conn.executescript("""
    CREATE TABLE notes (id INTEGER PRIMARY KEY, source_node TEXT,
      date TEXT, time TEXT, scientific_name TEXT, common_name TEXT,
      species_code TEXT, confidence REAL, latitude REAL, longitude REAL,
      threshold REAL, sensitivity REAL, clip_name TEXT);
    CREATE TABLE results (id INTEGER PRIMARY KEY, note_id INTEGER,
      species TEXT, confidence REAL);
    CREATE TABLE note_reviews (id INTEGER PRIMARY KEY, note_id INTEGER,
      verified TEXT, created_at TEXT, updated_at TEXT);
    CREATE TABLE note_comments (id INTEGER PRIMARY KEY, note_id INTEGER,
      entry TEXT, created_at TEXT, updated_at TEXT);
    CREATE TABLE note_locks (id INTEGER PRIMARY KEY, note_id INTEGER,
      locked_at TEXT);
    """)
    conn.execute(
        "INSERT INTO notes VALUES (1,'','2024-05-01','04:55:00',"
        "'Turdus merula','Eurasian Blackbird','eurbla',0.91,60.1,24.9,"
        "0.8,1.0,'blackbird.wav')")
    conn.execute(
        "INSERT INTO notes VALUES (2,'','2024-05-01','05:10:00',"
        "'Strix aluco','Tawny Owl','tawowl1',0.72,60.1,24.9,0.8,1.0,'')")
    conn.execute("INSERT INTO results VALUES (1,1,"
                 "'Turdus merula_Eurasian Blackbird',0.91)")
    conn.execute("INSERT INTO results VALUES (2,1,"
                 "'Turdus philomelos_Song Thrush',0.12)")
    conn.execute("INSERT INTO note_reviews VALUES (1,1,'correct','','')")
    conn.execute("INSERT INTO note_comments VALUES (1,1,'great song','','')")
    conn.execute("INSERT INTO note_locks VALUES (1,1,'2024-05-01')")
    conn.commit()
    conn.close()


def test_birdnet_go_db_migration(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from birdnet_go_tpu.utils.imports import import_birdnet_go_db

    legacy = tmp_path / "legacy.db"
    _make_legacy_db(legacy)
    ds = Datastore(":memory:")
    res = import_birdnet_go_db(ds, legacy)
    assert res.scanned == 2 and res.imported == 2 and res.errors == 0

    rows = ds.search_detections(order="asc")
    assert [r["scientific_name"] for r in rows] == [
        "Turdus merula", "Strix aluco"]
    blackbird = rows[0]
    assert blackbird["locked"] == 1
    # secondary results carried over, label "Sci_Common" split correctly
    results = ds.get_results(blackbird["id"])
    assert results[1]["scientific_name"] == "Turdus philomelos"
    assert results[1]["common_name"] == "Song Thrush"
    # review + comment carried over
    assert ds.get_reviews(blackbird["id"])[0]["verdict"] == "correct"
    assert ds.list_comments(blackbird["id"])[0]["text"] == "great song"
    # re-import is a no-op (dedup on timestamp+species)
    res2 = import_birdnet_go_db(ds, legacy)
    assert res2.imported == 0 and res2.skipped == 2


def test_birdnet_go_db_migration_rejects_foreign_db(tmp_path):
    import sqlite3

    import pytest

    from birdnet_go_tpu.utils.imports import parse_birdnet_go_db

    other = tmp_path / "foreign.db"
    conn = sqlite3.connect(other)
    conn.execute("CREATE TABLE stuff (x)")
    conn.commit()
    conn.close()
    with pytest.raises(ValueError, match="notes"):
        parse_birdnet_go_db(other)


def test_dataset_split_and_eval_metrics(tmp_path):
    """Stratified split keeps every (big-enough) class represented in
    val; make_eval_step reports top-1 accuracy correctly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from birdnet_go_tpu.train.dataset import WindowDataset
    from birdnet_go_tpu.train.trainer import evaluate, make_eval_step

    n = 40
    windows = np.random.default_rng(0).standard_normal(
        (n, 64)).astype(np.float32)
    labels = np.asarray([i % 2 for i in range(n)], np.int32)
    ds = WindowDataset(windows, labels, ["a", "b"])
    train, val = ds.split(0.25, seed=1)
    assert len(train) + len(val) == n
    assert set(val.labels.tolist()) == {0, 1}       # stratified
    assert len(val) == 10

    # a fake "model" that classifies by the sign of the first feature
    def apply_fn(params, pcm, train=False):
        s = pcm[:, 0]
        return {"logits": jnp.stack([-s, s], axis=-1) * 5.0}

    want = np.mean((val.windows[:, 0] > 0) == (val.labels == 1))
    m = evaluate(jax.jit(make_eval_step(apply_fn)), {}, val, batch_size=5)
    assert abs(m["accuracy"] - want) < 1e-6
    assert m["n"] == len(val)


def test_vendored_species_data_ships_with_repo(monkeypatch):
    """A fresh clone resolves REAL species names with no reference mount
    and no $BIRDNET_TPU_DATA: the 42-locale v2.4 label files, eBird code
    map, genus taxonomy, openfauna aliases, and speciesdict blobs are
    vendored under <repo>/data (reference embeds the same tables —
    internal/classifier/data/, models_embedded.go:14-22)."""
    monkeypatch.delenv("BIRDNET_TPU_DATA", raising=False)
    monkeypatch.chdir("/")                 # no cwd-relative ./data either
    from birdnet_go_tpu.taxonomy import openfauna, speciesdict
    from birdnet_go_tpu.taxonomy.labels import load_labels, resolve_data_dir

    base = resolve_data_dir()
    assert base is not None and (base / "genus_taxonomy.json").is_file()
    ls = load_labels(locale="fr")
    assert len(ls.species) == 6522
    assert ls.species[0].scientific == "Abroscopus albogularis"
    assert ls.species[0].common                 # real localized name
    assert "Synthetica" not in ls.species[0].scientific
    assert ls.code_for(ls.species[0])           # eBird code map loaded
    assert len(openfauna.load_aliases()) > 100
    assert "en" in speciesdict.available_locales()


def test_model_install_stages_labels_beside_weights(tmp_path, monkeypatch):
    """`model install` copies the model's label tables next to the
    artifact, and load_labels falls back to them when no shared data dir
    exists on the host (reference keeps labels+weights together)."""
    from birdnet_go_tpu.models.catalog import ModelManager
    from birdnet_go_tpu.taxonomy import labels as labels_mod

    art = tmp_path / "model.tflite"
    art.write_bytes(b"\x00" * 64)
    mgr = ModelManager(home=tmp_path / "home")
    mgr.install_from_file("BirdNET_V2.4", art)
    staged = tmp_path / "home" / "BirdNET_V2.4" / "labels"
    assert len(list(staged.glob("*.txt"))) == 42

    # host with NO data dir at all: only the staged copies resolve
    monkeypatch.delenv("BIRDNET_TPU_DATA", raising=False)
    monkeypatch.setattr(labels_mod, "_DEFAULT_DATA_DIRS", ())
    monkeypatch.setenv("BIRDNET_TPU_MODELS", str(tmp_path / "home"))
    ls = labels_mod.load_labels(model_id="BirdNET_V2.4", locale="de")
    assert len(ls.species) == 6522
    assert "Synthetica" not in ls.species[0].scientific
