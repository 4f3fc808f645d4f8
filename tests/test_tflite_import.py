"""TFLite importer tests against genuine hand-built flatbuffers."""

import numpy as np
import pytest

from birdnet_go_tpu.inference.tflite_import import (
    Op,
    load_tflite,
    parse_tflite,
)
from tests.tflite_builder import (
    ModelBuilder,
    conv2d_options,
    fully_connected_options,
    pool2d_options,
)


def _dense_model():
    mb = ModelBuilder()
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 4)).astype(np.float32)
    bias = np.array([0.1, -0.2, 0.3], np.float32)
    x_t = mb.add_tensor([1, 4], "input")
    w_t = mb.add_tensor([3, 4], "weight", w)
    b_t = mb.add_tensor([3], "bias", bias)
    h_t = mb.add_tensor([1, 3], "hidden")
    y_t = mb.add_tensor([1, 3], "output")
    mb.add_op(Op.FULLY_CONNECTED, [x_t, w_t, b_t], [h_t],
              lambda b: fully_connected_options(b, activation=1))  # RELU
    mb.add_op(Op.LOGISTIC, [h_t], [y_t])
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    return mb.finish(), w, bias


def test_parse_structure():
    buf, w, bias = _dense_model()
    m = parse_tflite(buf)
    assert m.description == "test model"
    assert len(m.tensors) == 5
    assert m.tensors[1].name == "weight"
    np.testing.assert_array_equal(m.tensors[1].data, w)
    assert [o.opcode for o in m.ops] == [Op.FULLY_CONNECTED, Op.LOGISTIC]
    assert m.inputs == [0] and m.outputs == [4]


def test_dense_numeric_parity():
    buf, w, bias = _dense_model()
    g = load_tflite(buf)
    x = np.array([[0.5, -1.0, 2.0, 0.1]], np.float32)
    (y,) = g.jitted()(g.params, x)
    ref = 1.0 / (1.0 + np.exp(-np.maximum(x @ w.T + bias, 0.0)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_conv_pool_pipeline_parity():
    mb = ModelBuilder()
    rng = np.random.default_rng(1)
    w = rng.standard_normal((2, 3, 3, 1)).astype(np.float32)  # OHWI
    bias = np.array([0.05, -0.05], np.float32)
    x_t = mb.add_tensor([1, 8, 8, 1], "input")
    w_t = mb.add_tensor([2, 3, 3, 1], "w", w)
    b_t = mb.add_tensor([2], "b", bias)
    c_t = mb.add_tensor([1, 8, 8, 2], "conv_out")
    p_t = mb.add_tensor([1, 4, 4, 2], "pool_out")
    mb.add_op(Op.CONV_2D, [x_t, w_t, b_t], [c_t],
              lambda b: conv2d_options(b, padding=0, activation=1))
    mb.add_op(Op.AVERAGE_POOL_2D, [p_t and c_t], [p_t],
              lambda b: pool2d_options(b, padding=1))
    mb.inputs = [x_t]
    mb.outputs = [p_t]
    g = load_tflite(mb.finish())

    x = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    (y,) = g.jitted()(g.params, x)

    # numpy reference: SAME conv 3x3 stride 1 + relu, then 2x2 avg pool
    xp = np.pad(x[0, :, :, 0], 1)
    conv = np.zeros((8, 8, 2), np.float32)
    for o in range(2):
        for i in range(8):
            for j in range(8):
                conv[i, j, o] = np.sum(xp[i:i + 3, j:j + 3]
                                       * w[o, :, :, 0]) + bias[o]
    conv = np.maximum(conv, 0.0)
    pooled = conv.reshape(4, 2, 4, 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(y)[0], pooled, rtol=1e-4,
                               atol=1e-5)


def test_dilated_conv_parity_vs_torch():
    """Conv2DOptions dilation lives at field ids 4/5 (not 5/6 like depthwise).

    Verified against torch's conv2d as an independent implementation
    (ADVICE r1: dilated standard convs silently mis-imported)."""
    torch = pytest.importorskip("torch")
    mb = ModelBuilder()
    rng = np.random.default_rng(7)
    w = rng.standard_normal((3, 3, 3, 2)).astype(np.float32)  # OHWI
    x_t = mb.add_tensor([1, 12, 10, 2], "input")
    w_t = mb.add_tensor([3, 3, 3, 2], "w", w)
    y_t = mb.add_tensor([1, 12, 10, 3], "out")
    mb.add_op(Op.CONV_2D, [x_t, w_t, -1], [y_t],
              lambda b: conv2d_options(b, padding=0, dilation_w=2,
                                       dilation_h=3))
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    g = load_tflite(mb.finish())
    x = rng.standard_normal((1, 12, 10, 2)).astype(np.float32)
    (y,) = g.jitted()(g.params, x)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))      # NCHW
    wt = torch.from_numpy(np.transpose(w, (0, 3, 1, 2)))      # OIHW
    # SAME padding with dilation: effective kernel (1 + (k-1)*d)
    eff_h, eff_w = 1 + 2 * 3, 1 + 2 * 2
    ph, pw = (eff_h - 1) // 2, (eff_w - 1) // 2
    xt = torch.nn.functional.pad(xt, (pw, eff_w - 1 - pw, ph, eff_h - 1 - ph))
    ref = torch.nn.functional.conv2d(xt, wt, dilation=(3, 2))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_depthwise_and_elementwise():
    mb = ModelBuilder()
    rng = np.random.default_rng(2)
    w = rng.standard_normal((1, 3, 3, 2)).astype(np.float32)  # [1,H,W,C]
    x_t = mb.add_tensor([1, 6, 6, 2], "input")
    w_t = mb.add_tensor([1, 3, 3, 2], "w", w)
    d_t = mb.add_tensor([1, 6, 6, 2], "dw_out")
    y_t = mb.add_tensor([1, 6, 6, 2], "out")
    mb.add_op(Op.DEPTHWISE_CONV_2D, [x_t, w_t, -1], [d_t],
              lambda b: conv2d_options(b, padding=0))
    mb.add_op(Op.MUL, [d_t, d_t], [y_t])
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    g = load_tflite(mb.finish())
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    (y,) = g.jitted()(g.params, x)

    xp = np.pad(x[0], ((1, 1), (1, 1), (0, 0)))
    ref = np.zeros((6, 6, 2), np.float32)
    for c in range(2):
        for i in range(6):
            for j in range(6):
                ref[i, j, c] = np.sum(xp[i:i + 3, j:j + 3, c] * w[0, :, :, c])
    ref = ref * ref
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=1e-4, atol=1e-5)


def test_fp16_weights_dequantized():
    mb = ModelBuilder()
    w16 = np.array([[0.5, -1.5]], np.float16)
    x_t = mb.add_tensor([1, 2], "input")
    w_t = mb.add_tensor([1, 2], "w16", w16, ttype=ModelBuilder.TTYPE_F16)
    y_t = mb.add_tensor([1, 1], "out")
    mb.add_op(Op.FULLY_CONNECTED, [x_t, w_t, -1], [y_t],
              lambda b: fully_connected_options(b))
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    g = load_tflite(mb.finish())
    assert g.params["t1"].dtype == np.float32      # FP16 → f32 at load
    x = np.array([[2.0, 1.0]], np.float32)
    (y,) = g.jitted()(g.params, x)
    np.testing.assert_allclose(np.asarray(y), [[2.0 * 0.5 - 1.5]], rtol=1e-3)


def test_unsupported_op_raises():
    mb = ModelBuilder()
    x_t = mb.add_tensor([1, 2], "input")
    y_t = mb.add_tensor([1, 2], "out")
    mb.add_op(Op.RNN, [x_t], [y_t])      # RNN: not in the supported set
    mb.inputs = [x_t]
    mb.outputs = [y_t]
    with pytest.raises(NotImplementedError, match="RNN"):
        load_tflite(mb.finish())


def test_mean_reshape_softmax():
    mb = ModelBuilder()
    axes = np.array([1, 2], np.int32)
    x_t = mb.add_tensor([1, 4, 4, 3], "input")
    a_t = mb.add_tensor([2], "axes", axes, ttype=ModelBuilder.TTYPE_I32)
    m_t = mb.add_tensor([1, 3], "mean_out")
    s_t = mb.add_tensor([1, 3], "softmax_out")
    mb.add_op(Op.MEAN, [x_t, a_t], [m_t])
    mb.add_op(Op.SOFTMAX, [m_t], [s_t])
    mb.inputs = [x_t]
    mb.outputs = [s_t]
    g = load_tflite(mb.finish())
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    (y,) = g.jitted()(g.params, x)
    m = x.mean(axis=(1, 2))
    ref = np.exp(m) / np.exp(m).sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)
