"""ONNX importer tests against hand-encoded protobuf models."""

import numpy as np
import pytest

from birdnet_go_tpu.inference.onnx_import import load_onnx, parse_onnx
from tests import onnx_builder as ob


def _mlp_model():
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((4, 8)).astype(np.float32)
    b1 = rng.standard_normal(8).astype(np.float32)
    w2 = rng.standard_normal((8, 3)).astype(np.float32)
    nodes = [
        ob.node("MatMul", ["x", "w1"], ["h0"]),
        ob.node("Add", ["h0", "b1"], ["h1"]),
        ob.node("Relu", ["h1"], ["h2"]),
        ob.node("Gemm", ["h2", "w2"], ["h3"],
                [ob.attr_float("alpha", 1.0)]),
        ob.node("Sigmoid", ["h3"], ["y"]),
    ]
    inits = [ob.tensor_proto("w1", w1), ob.tensor_proto("b1", b1),
             ob.tensor_proto("w2", w2)]
    buf = ob.model(nodes, inits, inputs=["x"], outputs=["y"])
    return buf, (w1, b1, w2)


def test_parse_structure():
    buf, _ = _mlp_model()
    g = parse_onnx(buf)
    assert g.name == "testgraph"
    assert [n.op_type for n in g.nodes] == ["MatMul", "Add", "Relu", "Gemm",
                                            "Sigmoid"]
    assert g.inputs == ["x"]                  # initializers filtered out
    assert g.outputs == ["y"]
    assert set(g.initializers) == {"w1", "b1", "w2"}


def test_mlp_numeric_parity():
    buf, (w1, b1, w2) = _mlp_model()
    g = load_onnx(buf)
    x = np.array([[1.0, -0.5, 0.25, 2.0]], np.float32)
    (y,) = g.jitted()(g.params, x)
    h = np.maximum(x @ w1 + b1, 0.0)
    ref = 1.0 / (1.0 + np.exp(-(h @ w2)))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)


def test_conv_bn_gap_parity():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 2, 3, 3)).astype(np.float32)   # OIHW
    scale = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    bias = rng.standard_normal(4).astype(np.float32)
    mean = rng.standard_normal(4).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 4).astype(np.float32)
    nodes = [
        ob.node("Conv", ["x", "w"], ["c"],
                [ob.attr_ints("pads", [1, 1, 1, 1]),
                 ob.attr_ints("strides", [1, 1]),
                 ob.attr_ints("kernel_shape", [3, 3])]),
        ob.node("BatchNormalization",
                ["c", "scale", "bias", "mean", "var"], ["bn"],
                [ob.attr_float("epsilon", 1e-5)]),
        ob.node("Relu", ["bn"], ["r"]),
        ob.node("GlobalAveragePool", ["r"], ["g"]),
        ob.node("Flatten", ["g"], ["y"], [ob.attr_int("axis", 1)]),
    ]
    inits = [ob.tensor_proto(n, a) for n, a in
             [("w", w), ("scale", scale), ("bias", bias),
              ("mean", mean), ("var", var)]]
    buf = ob.model(nodes, inits, inputs=["x"], outputs=["y"])
    g = load_onnx(buf)

    x = rng.standard_normal((2, 2, 6, 6)).astype(np.float32)
    (y,) = g.jitted()(g.params, x)

    # numpy reference
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    conv = np.zeros((2, 4, 6, 6), np.float32)
    for n in range(2):
        for o in range(4):
            for i in range(6):
                for j in range(6):
                    conv[n, o, i, j] = np.sum(
                        xp[n, :, i:i + 3, j:j + 3] * w[o])
    bn = (conv - mean[None, :, None, None]) / np.sqrt(
        var[None, :, None, None] + 1e-5) * scale[None, :, None, None] \
        + bias[None, :, None, None]
    ref = np.maximum(bn, 0).mean(axis=(2, 3))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_grouped_conv_and_pool():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((4, 1, 3, 3)).astype(np.float32)  # depthwise g=4
    nodes = [
        ob.node("Conv", ["x", "w"], ["c"],
                [ob.attr_ints("pads", [1, 1, 1, 1]),
                 ob.attr_int("group", 4),
                 ob.attr_ints("kernel_shape", [3, 3])]),
        ob.node("MaxPool", ["c"], ["y"],
                [ob.attr_ints("kernel_shape", [2, 2]),
                 ob.attr_ints("strides", [2, 2])]),
    ]
    buf = ob.model(nodes, [ob.tensor_proto("w", w)], ["x"], ["y"])
    g = load_onnx(buf)
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    (y,) = g.jitted()(g.params, x)
    assert np.asarray(y).shape == (1, 4, 2, 2)
    # spot-check one channel against numpy
    xp = np.pad(x[0, 0], 1)
    conv0 = np.zeros((4, 4), np.float32)
    for i in range(4):
        for j in range(4):
            conv0[i, j] = np.sum(xp[i:i + 3, j:j + 3] * w[0, 0])
    ref0 = conv0.reshape(2, 2, 2, 2).max(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(y)[0, 0], ref0, rtol=1e-4,
                               atol=1e-5)


def test_slice_transpose_concat():
    nodes = [
        ob.node("Transpose", ["x"], ["t"], [ob.attr_ints("perm", [1, 0])]),
        ob.node("Slice", ["t", "starts", "ends", "axes"], ["s"]),
        ob.node("Concat", ["s", "s"], ["y"], [ob.attr_int("axis", 0)]),
    ]
    inits = [
        ob.tensor_proto("starts", np.array([0], np.int64)),
        ob.tensor_proto("ends", np.array([2], np.int64)),
        ob.tensor_proto("axes", np.array([0], np.int64)),
    ]
    buf = ob.model(nodes, inits, ["x"], ["y"])
    g = load_onnx(buf)
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    (y,) = g.jitted()(g.params, x)
    ref = np.concatenate([x.T[:2], x.T[:2]], axis=0)
    np.testing.assert_array_equal(np.asarray(y), ref)


def test_unsupported_op_raises():
    buf = ob.model([ob.node("LSTM", ["x"], ["y"])], [], ["x"], ["y"])
    with pytest.raises(NotImplementedError, match="LSTM"):
        load_onnx(buf)


def test_fp16_initializer_upcast():
    w = np.array([[1.5, -2.5]], np.float16)
    nodes = [ob.node("MatMul", ["x", "w"], ["y"])]
    buf = ob.model(nodes, [ob.tensor_proto("w", w.T.copy())], ["x"], ["y"])
    g = load_onnx(buf)
    assert g.params["w"].dtype == np.float32
    x = np.array([[2.0, 1.0]], np.float32)
    (y,) = g.jitted()(g.params, x)
    np.testing.assert_allclose(np.asarray(y), [[1.5 * 2 + -2.5]], rtol=1e-3)


def test_transformer_ops_layernorm_split_where_expand_reduce():
    """Round-trip the opset-18-style ops added for transformer graphs:
    LayerNormalization, Split, Where, Expand, ReduceSum/Max, Greater."""
    import numpy as np

    from birdnet_go_tpu.inference.onnx_import import OnnxGraph, parse_onnx
    from tests.onnx_builder import (
        attr_float,
        attr_int,
        attr_ints,
        model,
        node,
        tensor_proto,
    )

    x = np.random.default_rng(0).standard_normal((2, 6)).astype(np.float32)
    scale = np.full((6,), 2.0, np.float32)
    bias = np.full((6,), 0.5, np.float32)
    split_sizes = np.asarray([2, 4], np.int64)
    shape3 = np.asarray([3, 2, 2], np.int64)

    buf = model(
        nodes=[
            node("LayerNormalization", ["x", "scale", "bias"], ["ln"],
                 [attr_float("epsilon", 1e-5), attr_int("axis", -1)]),
            node("Split", ["ln", "sizes"], ["a", "b"],
                 [attr_int("axis", 1)]),
            node("ReduceSum", ["b"], ["bsum"],
                 [attr_ints("axes", [1]), attr_int("keepdims", 1)]),
            node("Greater", ["a", "bsum"], ["mask"]),
            node("Where", ["mask", "a", "bsum"], ["sel"]),      # [2, 2]
            node("Expand", ["sel", "shape3"], ["exp"]),         # [3, 2, 2]
            node("ReduceMax", ["exp"], ["out"],
                 [attr_ints("axes", [0]), attr_int("keepdims", 0)]),
        ],
        initializers=[tensor_proto("scale", scale),
                      tensor_proto("bias", bias),
                      tensor_proto("sizes", split_sizes),
                      tensor_proto("shape3", shape3)],
        inputs=["x"], outputs=["out"])
    g = OnnxGraph(parse_onnx(buf))
    (got,) = g.jitted()(g.params, x)

    mean = x.mean(-1, keepdims=True)
    ln = (x - mean) / np.sqrt(x.var(-1, keepdims=True) + 1e-5) * scale + bias
    a, b = ln[:, :2], ln[:, 2:]
    bsum = b.sum(1, keepdims=True)
    sel = np.where(a > bsum, a, bsum)
    want = np.broadcast_to(sel, (3, 2, 2)).max(0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_qdq_quantized_onnx_graph():
    """QDQ (QuantizeLinear -> DequantizeLinear) models — the catalog's
    INT8-ONNX variants — execute with faithful fake-quant numerics."""
    import numpy as np

    from tests.onnx_builder import (
        attr_int,
        model,
        node,
        tensor_proto,
    )
    from birdnet_go_tpu.inference.onnx_import import load_onnx

    rng = np.random.default_rng(11)
    w_f = rng.standard_normal((4, 6)).astype(np.float32)
    w_scale = np.maximum(np.abs(w_f).max(axis=1), 1e-6) / 127.0
    w_q = np.clip(np.round(w_f / w_scale[:, None]), -127, 127).astype(np.int8)

    # x -> Q -> DQ -> Gemm(w_dq) with per-axis weight dequantization
    blob = model(
        nodes=[
            node("QuantizeLinear", ["x", "xs", "xz"], ["xq"]),
            node("DequantizeLinear", ["xq", "xs", "xz"], ["xdq"]),
            node("DequantizeLinear", ["wq", "ws", "wz"], ["wdq"],
                 [attr_int("axis", 0)]),
            node("Gemm", ["xdq", "wdq"], ["y"], [attr_int("transB", 1)]),
        ],
        initializers=[
            tensor_proto("xs", np.array(0.05, np.float32)),
            tensor_proto("xz", np.array(0, np.int8)),
            tensor_proto("wq", w_q),
            tensor_proto("ws", w_scale.astype(np.float32)),
            tensor_proto("wz", np.zeros(4, np.int8)),
        ],
        inputs=["x"], outputs=["y"])
    g = load_onnx(blob)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    (y,) = g.apply(g.params, x)
    x_fq = np.clip(np.round(x / 0.05), -128, 127) * 0.05   # fake-quant
    expect = x_fq @ (w_q.astype(np.float32) * w_scale[:, None]).T
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)


def test_stft_mel_frontend_parity():
    """The opset-17 signal lowering real audio graphs use for an
    in-graph mel front end: HannWindow → STFT → |·|² (via the real/imag
    planes) → MelWeightMatrix matmul — numeric parity vs numpy."""
    rng = np.random.default_rng(7)
    sr, frame_len, step = 16000, 512, 256
    pcm = rng.standard_normal((1, 4096)).astype(np.float32)
    nodes = [
        ob.node("HannWindow", ["flen"], ["win"]),
        ob.node("STFT", ["x", "step", "win"], ["spec"],
                [ob.attr_int("onesided", 1)]),
        # power = re² + im²: Slice the last axis then square-sum
        ob.node("Mul", ["spec", "spec"], ["sq"]),
        ob.node("ReduceSum", ["sq"], ["pw"],
                [ob.attr_ints("axes", [-1]), ob.attr_int("keepdims", 0)]),
        ob.node("MelWeightMatrix",
                ["nmel", "dlen", "srate", "lo", "hi"], ["fb"]),
        ob.node("MatMul", ["pw", "fb"], ["mel"]),
    ]
    inits = [
        ob.tensor_proto("flen", np.array(frame_len, np.int64)),
        ob.tensor_proto("step", np.array(step, np.int64)),
        ob.tensor_proto("nmel", np.array(40, np.int64)),
        ob.tensor_proto("dlen", np.array(frame_len, np.int64)),
        ob.tensor_proto("srate", np.array(sr, np.int64)),
        ob.tensor_proto("lo", np.array(20.0, np.float32)),
        ob.tensor_proto("hi", np.array(8000.0, np.float32)),
    ]
    buf = ob.model(nodes, inits, inputs=["x"], outputs=["mel"])
    g = load_onnx(buf)
    (y,) = g.jitted()(g.params, pcm)

    n = np.arange(frame_len)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * n / frame_len)
    frames = (pcm.shape[1] - frame_len) // step + 1
    idx = np.arange(frames)[:, None] * step + n[None, :]
    spec = np.fft.rfft(pcm[0][idx] * win, axis=-1)
    power = np.abs(spec) ** 2

    from birdnet_go_tpu.inference.onnx_import import _mel_weight_matrix

    class _N:
        inputs = ["nmel", "dlen", "srate", "lo", "hi"]
    consts = {"nmel": 40, "dlen": frame_len, "srate": sr,
              "lo": 20.0, "hi": 8000.0}

    def val(name):
        return np.asarray(consts[name])
    val.const = val
    fb = _mel_weight_matrix(_N(), val)
    ref = power @ fb
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=3e-4, atol=2e-2)


def test_topk_argmax_tile_range_ops():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    nodes = [
        ob.node("TopK", ["x", "k"], ["tv", "ti"],
                [ob.attr_int("axis", -1), ob.attr_int("largest", 1)]),
        ob.node("ArgMax", ["x"], ["am"],
                [ob.attr_int("axis", 1), ob.attr_int("keepdims", 0)]),
        ob.node("Tile", ["x", "reps"], ["tl"]),
        ob.node("CumSum", ["x", "cax"], ["cs"]),
    ]
    inits = [ob.tensor_proto("k", np.array([3], np.int64)),
             ob.tensor_proto("reps", np.array([1, 2], np.int64)),
             ob.tensor_proto("cax", np.array(1, np.int64))]
    buf = ob.model(nodes, inits, inputs=["x"],
                   outputs=["tv", "ti", "am", "tl", "cs"])
    g = load_onnx(buf)
    tv, ti, am, tl, cs = g.jitted()(g.params, x)
    order = np.argsort(-x, axis=1)[:, :3]
    np.testing.assert_allclose(np.asarray(tv),
                               np.take_along_axis(x, order, 1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ti), order)
    np.testing.assert_array_equal(np.asarray(am), x.argmax(1))
    np.testing.assert_allclose(np.asarray(tl), np.tile(x, (1, 2)))
    np.testing.assert_allclose(np.asarray(cs), np.cumsum(x, 1), rtol=1e-6)
