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


# -- extended op coverage toward the real published graphs (VERDICT r3 #8) ----


def _opts(n_slots):
    """Tiny builder for options tables of int32 slots."""
    def make(b, *vals):
        b.StartObject(n_slots)
        for slot, v in enumerate(vals):
            if v is not None:
                b.PrependInt32Slot(slot, v, 0)
        return b.EndObject()
    return make


def test_stft_style_frontend_parity():
    """tf.signal.stft lowers to framing (STRIDED_SLICE/PACK) →
    EXPAND_DIMS → RFFT2D → COMPLEX_ABS; mel projection is a
    BATCH_MATMUL. This mirrors that exact lowering on a miniature and
    checks numeric parity against a numpy oracle."""
    rng = np.random.default_rng(3)
    pcm = rng.standard_normal((1, 512)).astype(np.float32)
    fb = rng.random((129, 8)).astype(np.float32)

    mb = ModelBuilder()
    x_t = mb.add_tensor([1, 512], "pcm")
    i32 = ModelBuilder.TTYPE_I32
    beg0 = mb.add_tensor([2], "b0", np.array([0, 0], np.int32), ttype=i32)
    end0 = mb.add_tensor([2], "e0", np.array([1, 256], np.int32), ttype=i32)
    beg1 = mb.add_tensor([2], "b1", np.array([0, 256], np.int32), ttype=i32)
    end1 = mb.add_tensor([2], "e1", np.array([1, 512], np.int32), ttype=i32)
    strd = mb.add_tensor([2], "s", np.array([1, 1], np.int32), ttype=i32)
    f0 = mb.add_tensor([1, 256], "f0")
    f1 = mb.add_tensor([1, 256], "f1")
    mb.add_op(Op.STRIDED_SLICE, [x_t, beg0, end0, strd], [f0])
    mb.add_op(Op.STRIDED_SLICE, [x_t, beg1, end1, strd], [f1])
    frames = mb.add_tensor([1, 2, 256], "frames")
    mb.add_op(Op.PACK, [f0, f1], [frames],
              lambda b: _opts(2)(b, 2, 1))          # values_count=2, axis=1
    ax = mb.add_tensor([1], "ax", np.array([2], np.int32), ttype=i32)
    fr4 = mb.add_tensor([1, 2, 1, 256], "frames4")
    mb.add_op(Op.EXPAND_DIMS, [frames, ax], [fr4])
    flen = mb.add_tensor([2], "flen", np.array([1, 256], np.int32), ttype=i32)
    spec_c = mb.add_tensor([1, 2, 1, 129], "spec_c", ttype=8)  # complex64
    mb.add_op(Op.RFFT2D, [fr4, flen], [spec_c])
    mag = mb.add_tensor([1, 2, 1, 129], "mag")
    mb.add_op(Op.COMPLEX_ABS, [spec_c], [mag])
    pw = mb.add_tensor([1, 2, 1, 129], "power")
    mb.add_op(Op.SQUARE, [mag], [pw])
    shp = mb.add_tensor([3], "shp", np.array([1, 2, 129], np.int32),
                        ttype=i32)
    pw3 = mb.add_tensor([1, 2, 129], "power3")
    mb.add_op(Op.RESHAPE, [pw, shp], [pw3])
    fb_t = mb.add_tensor([129, 8], "fb", fb)
    mel = mb.add_tensor([1, 2, 8], "mel")
    mb.add_op(Op.BATCH_MATMUL, [pw3, fb_t], [mel])
    mb.inputs = [x_t]
    mb.outputs = [mel]

    g = load_tflite(mb.finish())
    (y,) = g.jitted()(g.params, pcm)

    frames_ref = np.stack([pcm[0, :256], pcm[0, 256:]])[None]
    spec = np.fft.rfft(frames_ref, n=256, axis=-1)
    ref = (np.abs(spec) ** 2).astype(np.float32) @ fb
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=1e-3)


def test_slice_tile_broadcast_select_chain():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6)).astype(np.float32)
    mb = ModelBuilder()
    i32 = ModelBuilder.TTYPE_I32
    x_t = mb.add_tensor([2, 6], "x")
    beg = mb.add_tensor([2], "beg", np.array([0, 1], np.int32), ttype=i32)
    size = mb.add_tensor([2], "size", np.array([2, 3], np.int32), ttype=i32)
    sl = mb.add_tensor([2, 3], "sl")
    mb.add_op(Op.SLICE, [x_t, beg, size], [sl])
    reps = mb.add_tensor([2], "reps", np.array([1, 2], np.int32), ttype=i32)
    tl = mb.add_tensor([2, 6], "tl")
    mb.add_op(Op.TILE, [sl, reps], [tl])
    zero = mb.add_tensor([1], "zero", np.zeros(1, np.float32))
    gt = mb.add_tensor([2, 6], "gt", ttype=6)              # bool
    mb.add_op(Op.GREATER, [tl, zero], [gt])
    neg = mb.add_tensor([2, 6], "neg")
    mb.add_op(Op.NEG, [tl], [neg])
    out = mb.add_tensor([2, 6], "out")
    mb.add_op(Op.SELECT_V2, [gt, tl, neg], [out])
    mb.inputs = [x_t]
    mb.outputs = [out]

    g = load_tflite(mb.finish())
    (y,) = g.jitted()(g.params, x)
    t = np.tile(x[:, 1:4], (1, 2))
    np.testing.assert_allclose(np.asarray(y), np.abs(t), rtol=1e-6)


def test_split_v_unpack_reduce_argmax():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 10)).astype(np.float32)
    mb = ModelBuilder()
    i32 = ModelBuilder.TTYPE_I32
    x_t = mb.add_tensor([2, 10], "x")
    sizes = mb.add_tensor([2], "sizes", np.array([3, -1], np.int32),
                          ttype=i32)
    axis = mb.add_tensor([1], "axis", np.array([1], np.int32), ttype=i32)
    a_t = mb.add_tensor([2, 3], "a")
    b_t = mb.add_tensor([2, 7], "b")
    mb.add_op(Op.SPLIT_V, [x_t, sizes, axis], [a_t, b_t])
    red_ax = mb.add_tensor([1], "rax", np.array([1], np.int32), ttype=i32)
    mx = mb.add_tensor([2], "mx")
    mb.add_op(Op.REDUCE_MAX, [b_t, red_ax], [mx])
    sm = mb.add_tensor([2], "sm")
    mb.add_op(Op.SUM, [a_t, red_ax], [sm])
    am_ax = mb.add_tensor([1], "amax", np.array([1], np.int32), ttype=i32)
    am = mb.add_tensor([2], "am", ttype=i32)
    mb.add_op(Op.ARG_MAX, [x_t, am_ax], [am])
    mb.inputs = [x_t]
    mb.outputs = [mx, sm, am]

    g = load_tflite(mb.finish())
    mxv, smv, amv = g.jitted()(g.params, x)
    np.testing.assert_allclose(np.asarray(mxv), x[:, 3:].max(1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(smv), x[:, :3].sum(1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(amv), x.argmax(1))


def test_cast_mirror_pad_cumsum_resize():
    x = np.arange(12, dtype=np.int32).reshape(1, 3, 4)
    mb = ModelBuilder()
    i32 = ModelBuilder.TTYPE_I32
    x_t = mb.add_tensor([1, 3, 4], "x", ttype=i32)
    xf = mb.add_tensor([1, 3, 4], "xf")
    mb.add_op(Op.CAST, [x_t, ], [xf])
    pads = mb.add_tensor([3, 2], "pads",
                         np.array([[0, 0], [1, 1], [0, 0]], np.int32),
                         ttype=i32)
    pd = mb.add_tensor([1, 5, 4], "pd")
    mb.add_op(Op.MIRROR_PAD, [xf, pads], [pd],
              lambda b: _opts(1)(b, None))       # mode slot default REFLECT
    cax = mb.add_tensor([1], "cax", np.array([2], np.int32), ttype=i32)
    cs = mb.add_tensor([1, 5, 4], "cs")
    mb.add_op(Op.CUMSUM, [pd, cax], [cs])
    mb.inputs = [x_t]
    mb.outputs = [cs]

    g = load_tflite(mb.finish())
    (y,) = g.jitted()(g.params, x)
    ref = np.cumsum(np.pad(x.astype(np.float32), [(0, 0), (1, 1), (0, 0)],
                           mode="reflect"), axis=2)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6)


def test_resize_nearest_parity():
    x = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2)
    mb = ModelBuilder()
    i32 = ModelBuilder.TTYPE_I32
    x_t = mb.add_tensor([1, 2, 2, 2], "x")
    hw = mb.add_tensor([2], "hw", np.array([4, 4], np.int32), ttype=i32)
    out = mb.add_tensor([1, 4, 4, 2], "out")
    mb.add_op(Op.RESIZE_NEAREST_NEIGHBOR, [x_t, hw], [out])
    mb.inputs = [x_t]
    mb.outputs = [out]
    g = load_tflite(mb.finish())
    (y,) = g.jitted()(g.params, x)
    ref = x.repeat(2, axis=1).repeat(2, axis=2)
    np.testing.assert_allclose(np.asarray(y), ref)


def test_stft_lowering_gather_framing_mid_scale():
    """The real tf.signal.stft export frames via gathers over precomputed
    index tables at tens of frames per window — exercise that lowering at
    a realistic frame count (43 frames x 2048-point rFFT) end-to-end
    through the importer against a numpy oracle."""
    rng = np.random.default_rng(9)
    sr, n_fft, hop = 48000, 2048, 1024
    frames = (sr - n_fft) // hop + 1          # 45 at 1 s
    pcm = rng.standard_normal((1, sr)).astype(np.float32)
    fb = rng.random((n_fft // 2 + 1, 64)).astype(np.float32)
    idx = (np.arange(frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).astype(np.int32)

    mb = ModelBuilder()
    i32 = ModelBuilder.TTYPE_I32
    x_t = mb.add_tensor([1, sr], "pcm")
    idx_t = mb.add_tensor([frames, n_fft], "frame_idx", idx, ttype=i32)
    fr = mb.add_tensor([1, frames, n_fft], "frames")
    mb.add_op(Op.GATHER, [x_t, idx_t], [fr],
              lambda b: _opts(1)(b, 1))              # axis=1
    ax = mb.add_tensor([1], "ax", np.array([2], np.int32), ttype=i32)
    fr4 = mb.add_tensor([1, frames, 1, n_fft], "frames4")
    mb.add_op(Op.EXPAND_DIMS, [fr, ax], [fr4])
    flen = mb.add_tensor([2], "flen", np.array([1, n_fft], np.int32),
                         ttype=i32)
    spec = mb.add_tensor([1, frames, 1, n_fft // 2 + 1], "spec", ttype=8)
    mb.add_op(Op.RFFT2D, [fr4, flen], [spec])
    mag = mb.add_tensor([1, frames, 1, n_fft // 2 + 1], "mag")
    mb.add_op(Op.COMPLEX_ABS, [spec], [mag])
    pw = mb.add_tensor([1, frames, 1, n_fft // 2 + 1], "pw")
    mb.add_op(Op.SQUARE, [mag], [pw])
    shp = mb.add_tensor([3], "shp",
                        np.array([1, frames, n_fft // 2 + 1], np.int32),
                        ttype=i32)
    pw3 = mb.add_tensor([1, frames, n_fft // 2 + 1], "pw3")
    mb.add_op(Op.RESHAPE, [pw, shp], [pw3])
    fb_t = mb.add_tensor(list(fb.shape), "fb", fb)
    mel = mb.add_tensor([1, frames, 64], "mel")
    mb.add_op(Op.BATCH_MATMUL, [pw3, fb_t], [mel])
    mb.inputs = [x_t]
    mb.outputs = [mel]

    g = load_tflite(mb.finish())
    (y,) = g.jitted()(g.params, pcm)

    fr_ref = pcm[0][idx]                              # [frames, n_fft]
    ref = (np.abs(np.fft.rfft(fr_ref, axis=-1)) ** 2) @ fb
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=3e-4,
                               atol=2e-2)
