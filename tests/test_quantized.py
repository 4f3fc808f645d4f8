"""int8 post-training quantization: numerical parity with the f32 model
(the validation contract mirrors the reference's OpenVINO-vs-ORT parity
test, openvino_parity_functional_test.go — here int8-vs-f32)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny():
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import (
        BlockSpec,
        EfficientNetConfig,
    )
    from birdnet_go_tpu.ops.melspec import MelConfig

    m = BirdNETv24(
        num_species=40,
        mel=MelConfig(sample_rate=48000, n_fft=256, hop=4096, n_mels=32),
        compute_dtype=jnp.float32)
    m.net = EfficientNetConfig(
        blocks=(BlockSpec(1, 8, 3, 1, 1), BlockSpec(4, 16, 3, 2, 2),
                BlockSpec(4, 24, 5, 2, 1)),
        embedding_dim=32, num_classes=40)
    params = m.init(jax.random.PRNGKey(0))
    return m, params


def _mels(m, n=3, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        pcm = rng.standard_normal((batch, 48000)).astype(np.float32) * 0.3
        out.append(np.asarray(m.features(jnp.asarray(pcm))))
    return out

def test_quantized_topk_parity(tiny):
    from birdnet_go_tpu.models.efficientnet import apply_efficientnet
    from birdnet_go_tpu.ops.quant import (
        apply_efficientnet_int8,
        calibrate_efficientnet,
        quantize_efficientnet,
    )

    m, params = tiny
    cal = _mels(m, n=3, batch=4, seed=1)
    scales = calibrate_efficientnet(params, m.net, cal)
    assert scales["stem"] > 0 and "b0.in" in scales and "head" in scales
    q = quantize_efficientnet(params, m.net, scales)
    # backbone weights really are int8 (the stem stays float by design)
    assert "w_q" not in q["stem"] and q["stem"]["w"].dtype == jnp.float32
    assert all(b["project"]["w_q"].dtype == jnp.int8 for b in q["blocks"])

    mel = _mels(m, n=1, batch=8, seed=7)[0]
    ref = apply_efficientnet(params, jnp.asarray(mel), m.net,
                             compute_dtype=jnp.float32)
    out = apply_efficientnet_int8(q, jnp.asarray(mel), m.net)
    assert out["logits"].shape == ref["logits"].shape

    # detection-level contract: top-5 species substantially overlap and
    # the top-1 confidence is close after sigmoid
    k = 5
    ref_top = np.argsort(-np.asarray(ref["logits"]), axis=1)[:, :k]
    q_top = np.argsort(-np.asarray(out["logits"]), axis=1)[:, :k]
    overlap = np.mean([
        len(set(ref_top[b]) & set(q_top[b])) / k
        for b in range(ref_top.shape[0])])
    assert overlap >= 0.6, f"top-{k} overlap {overlap:.2f}"
    ref_c = jax.nn.sigmoid(np.asarray(ref["logits"]))
    q_c = jax.nn.sigmoid(np.asarray(out["logits"]))
    assert float(np.max(np.abs(ref_c - q_c))) < 0.15
    # replica-drift guard: calibrate/apply_int8 re-implement the MBConv
    # dataflow — a divergence from apply_efficientnet collapses this
    corr = float(np.corrcoef(np.asarray(ref["logits"]).ravel(),
                             np.asarray(out["logits"]).ravel())[0, 1])
    assert corr >= 0.9, f"int8-vs-f32 logit correlation {corr:.3f}"


def test_quantized_jit_compiles_and_is_deterministic(tiny):
    from birdnet_go_tpu.ops.quant import (
        apply_efficientnet_int8,
        calibrate_efficientnet,
        quantize_efficientnet,
    )

    m, params = tiny
    scales = calibrate_efficientnet(params, m.net, _mels(m, n=1))
    q = quantize_efficientnet(params, m.net, scales)
    mel = jnp.asarray(_mels(m, n=1, seed=3)[0])
    f = jax.jit(lambda qq, x: apply_efficientnet_int8(qq, x, m.net))
    a = np.asarray(f(q, mel)["logits"])
    b = np.asarray(f(q, mel)["logits"])
    np.testing.assert_array_equal(a, b)


def test_int8_dense_head_parity_full_width():
    """int8 FC head (VERDICT r3 #3): logits from the int8x int8->int32
    dot must track the f32 head closely enough that top-10 and
    confidences survive — checked at BirdNET v2.4's real head width
    (1280 -> 6522) and Perch's 14,795-wide Gemm."""
    import jax

    from birdnet_go_tpu.models import layers as L
    from birdnet_go_tpu.ops.postprocess import sigmoid_confidence
    from birdnet_go_tpu.ops.quant import (
        apply_dense_int8,
        quantize_dense_head,
    )

    rng = np.random.default_rng(11)
    for cout in (6522, 14795):
        w = (rng.standard_normal((1280, cout)) * 0.03).astype(np.float32)
        b = (rng.standard_normal(cout) * 0.01).astype(np.float32)
        # swish-pooled embeddings: mostly positive, moderate range
        emb = np.abs(rng.standard_normal((8, 1280))).astype(np.float32)
        p = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
        q = quantize_dense_head({"w": w, "b": b}, emb[:2])
        ref = np.asarray(L.apply_dense(p, jnp.asarray(emb), jnp.float32))
        got = np.asarray(apply_dense_int8(jax.device_put(q),
                                          jnp.asarray(emb)))
        # confidence-level tolerance (post-sigmoid)
        c_ref = np.asarray(sigmoid_confidence(jnp.asarray(ref), 1.0))
        c_got = np.asarray(sigmoid_confidence(jnp.asarray(got), 1.0))
        assert np.abs(c_ref - c_got).max() < 0.02
        # top-10 overlap per row >= 9/10
        for r in range(len(emb)):
            t_ref = set(np.argsort(ref[r])[-10:])
            t_got = set(np.argsort(got[r])[-10:])
            assert len(t_ref & t_got) >= 9


def test_int8_activation_boundaries_parity(tiny):
    """int8-stored inter-block activations (VERDICT r4 #6b): quantize in
    each block's epilogue, dequantize in the next prologue — the HBM
    byte-width lever on the conv-boundary-bound backbone. Contract: the
    lossy boundary cast stays within the same confidence tolerance as the
    int8 head (<0.02 post-sigmoid) and preserves top-5 ordering, and the
    compiled graph really materializes s8 buffers at the boundaries."""
    from birdnet_go_tpu.models.efficientnet import apply_efficientnet
    from birdnet_go_tpu.ops.postprocess import sigmoid_confidence

    m, params = tiny
    feats = jnp.asarray(_mels(m, n=1)[0])
    ref = apply_efficientnet(params, feats, m.net,
                             compute_dtype=jnp.float32)["logits"]
    got = apply_efficientnet(params, feats, m.net,
                             compute_dtype=jnp.float32,
                             act_int8=True)["logits"]
    c_ref = np.asarray(sigmoid_confidence(ref, 1.0))
    c_got = np.asarray(sigmoid_confidence(got, 1.0))
    assert np.abs(c_ref - c_got).max() < 0.02
    for r in range(c_ref.shape[0]):
        t_ref = set(np.argsort(c_ref[r])[-5:])
        t_got = set(np.argsort(c_got[r])[-5:])
        assert len(t_ref & t_got) >= 4
    # the int8 buffers must survive compilation (the optimization_barrier
    # pins them; without it XLA may elide quant->dequant entirely)
    hlo = jax.jit(lambda p, x: apply_efficientnet(
        p, x, m.net, compute_dtype=jnp.float32,
        act_int8=True)["logits"]).lower(params, feats).compile().as_text()
    assert "s8" in hlo
    # train mode never quantizes (boundaries would break gradients)
    tr = apply_efficientnet(params, feats, m.net,
                            compute_dtype=jnp.float32, act_int8=True,
                            train=True)["logits"]
    assert np.allclose(np.asarray(tr), np.asarray(
        apply_efficientnet(params, feats, m.net,
                           compute_dtype=jnp.float32,
                           train=True)["logits"]))


def test_act_int8_serving_option_wiring(tiny):
    """realtime.act_int8 reaches the loaded model via
    apply_serving_options (app.py start + load_model_runtime both call
    it); imported-graph stand-ins without the knob are left alone."""
    from birdnet_go_tpu.config.settings import RealtimeSettings
    from birdnet_go_tpu.inference.loader import apply_serving_options

    m, _ = tiny
    m.act_int8 = False
    apply_serving_options(m, RealtimeSettings(act_int8=True))
    assert m.act_int8 is True
    m.act_int8 = False
    apply_serving_options(m, RealtimeSettings())
    assert m.act_int8 is False

    class NoKnob:
        spec = None

    apply_serving_options(NoKnob(), RealtimeSettings(act_int8=True))
