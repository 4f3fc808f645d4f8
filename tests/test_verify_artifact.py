"""verify-artifact: one-command real-weight parity readiness
(VERDICT r4 #5; reference precedent:
/root/reference/internal/classifier/openvino_parity_functional_test.go
— golden functional parity per backend, and models_embedded.go:14-22 —
the embedded artifacts this command will verify the day they are
reachable)."""

from __future__ import annotations

import numpy as np
import pytest

from birdnet_go_tpu.inference.tflite_import import Op
from birdnet_go_tpu.inference.verify_artifact import verify_artifact
from tests.tflite_builder import ModelBuilder, fully_connected_options


@pytest.fixture()
def artifact(tmp_path):
    """A genuine flatbuffer artifact on disk (dense + sigmoid)."""
    mb = ModelBuilder()
    rng = np.random.default_rng(0)
    # input is a real PCM window ([1, 144000] @ 48 kHz/3 s) so the --wav
    # leg's offline pipeline can feed it directly
    n_in = 144000
    w = (rng.standard_normal((6, n_in)) / np.sqrt(n_in)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    x_t = mb.add_tensor([1, n_in], "input")
    w_t = mb.add_tensor([6, n_in], "weight", w)
    b_t = mb.add_tensor([6], "bias", b)
    h_t = mb.add_tensor([1, 6], "hidden")
    y_t = mb.add_tensor([1, 6], "output")
    mb.add_op(Op.FULLY_CONNECTED, [x_t, w_t, b_t], [h_t],
              lambda bb: fully_connected_options(bb, activation=0))
    mb.add_op(Op.LOGISTIC, [h_t], [y_t])
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    p = tmp_path / "model.tflite"
    p.write_bytes(mb.finish())
    return p


def test_record_then_match_then_mismatch(artifact, tmp_path):
    gold = tmp_path / "golden"
    r1 = verify_artifact(artifact, golden_dir=gold)
    assert r1.format == "tflite"
    assert r1.ops == {"FULLY_CONNECTED": 1, "LOGISTIC": 1}
    assert r1.golden_status == "recorded" and r1.ok

    r2 = verify_artifact(artifact, golden_dir=gold)
    assert r2.golden_status == "match" and r2.ok
    assert r2.fingerprint == r1.fingerprint     # deterministic input

    # a different artifact under the same digest file = numeric drift
    gfile = next(gold.glob("*.json"))
    rec = gfile.read_text().replace(r1.fingerprint[:8], "deadbeef")
    gfile.write_text(rec)
    r3 = verify_artifact(artifact, golden_dir=gold)
    assert r3.golden_status == "MISMATCH" and not r3.ok


def test_raven_table_diff_against_fixture(artifact, tmp_path):
    """The --wav leg runs the real offline pipeline and diffs the Raven
    selection table byte-for-byte against the recorded fixture."""
    from birdnet_go_tpu.audio.wav import write_wav

    wav = tmp_path / "probe.wav"
    rng = np.random.default_rng(7)
    write_wav(wav, (rng.standard_normal(4 * 48000) * 8000
                    ).astype(np.int16), 48000)
    gold = tmp_path / "golden"
    r1 = verify_artifact(artifact, wav=str(wav), golden_dir=gold,
                         model_id="tiny-dense")
    assert r1.raven_status == "recorded"
    r2 = verify_artifact(artifact, wav=str(wav), golden_dir=gold,
                         model_id="tiny-dense")
    assert r2.raven_status == "match" and r2.ok
    # corrupt the fixture → MISMATCH with a diff in details
    rfile = next(gold.glob("*.raven.txt"))
    rfile.write_text(rfile.read_text() + "tampered\n")
    r3 = verify_artifact(artifact, wav=str(wav), golden_dir=gold,
                         model_id="tiny-dense")
    assert r3.raven_status == "MISMATCH" and not r3.ok


def test_op_audit_reports_full_readiness():
    """Every published family's expected op inventory must be covered by
    the importer dispatch tables — the audit half of verify-artifact."""
    from birdnet_go_tpu.inference.opaudit import audit, audit_table

    rows = audit()
    assert len(rows) >= 6
    not_ready = [r for r in rows if not r.ready]
    assert not not_ready, \
        f"families with unsupported ops: " \
        f"{[(r.family, r.missing) for r in not_ready]}"
    table = audit_table()
    assert "BirdNET_V2.4" in table and "ready" in table


def test_cli_verify_artifact_end_to_end(artifact, tmp_path, capsys):
    from birdnet_go_tpu.cli.main import main

    rc = main(["verify-artifact", str(artifact),
               "--golden", str(tmp_path / "g")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PASS" in out and "fingerprint" in out
    rc2 = main(["verify-artifact", "--audit"])
    out2 = capsys.readouterr().out
    assert rc2 == 0 and "Perch_V2" in out2
