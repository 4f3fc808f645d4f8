"""FULL-SCALE recorded-fixture parity (VERDICT r3 #4).

Real BirdNET weights are not fetchable here, so parity is proven on a
*full-scale replica*: a genuine TFLite flatbuffer with the mel front end
expressed IN-GRAPH (windowed-DFT conv → power → mel filterbank → log,
exactly how the reference's model embeds its spectrogram —
internal/classifier/analyze.go feeds raw PCM), the complete
EfficientNet-B0 stage schedule, and all 6,522 outputs. The oracle is an
INDEPENDENT torch implementation running the same weights; goldens pin
the imported model's outputs so any op-semantics regression at real
scale fails loudly (openvino_parity_functional_test.go precedent).

Also covered: the FP16 MData range-filter model at full scale
(96-feature sinusoidal MLP → 6,522 sigmoid scores), imported, verified
against torch, converted to Geomodel params, and loaded back through
load_geomodel's installed-artifact path (geomodel is NOT random-init
when an artifact exists). A real-artifact run is env-gated behind
BIRDNET_V24_TFLITE for networks that allow the pinned fetch.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

from birdnet_go_tpu.inference.tflite_import import Op, load_tflite
from tests.test_golden_parity import _golden_check
from tests.tflite_builder import (
    ModelBuilder,
    conv2d_options,
    dwconv2d_options,
    fully_connected_options,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional

N_FFT, HOP, N_MELS = 2048, 512, 96
CLIP = 144000
FRAMES = (CLIP - N_FFT) // HOP + 1            # 278
N_BINS = N_FFT // 2 + 1                       # 1025
NUM_SPECIES = 6522
LOG_OFFSET = 1e-6

# B0 stage schedule (expand, cout, kernel, stride, repeats)
B0 = ((1, 16, 3, 1, 1), (6, 24, 3, 2, 2), (6, 40, 5, 2, 2),
      (6, 80, 3, 2, 3), (6, 112, 5, 1, 3), (6, 192, 5, 2, 4),
      (6, 320, 3, 1, 1))


def _mean_options(b, keep_dims):
    b.StartObject(1)
    b.PrependBoolSlot(0, keep_dims, 0)
    return b.EndObject()


def _strided_slice_inputs(mb, name, begin, end, strides):
    i32 = ModelBuilder.TTYPE_I32
    return [mb.add_tensor([len(begin)], f"{name}_b",
                          np.asarray(begin, np.int32), ttype=i32),
            mb.add_tensor([len(end)], f"{name}_e",
                          np.asarray(end, np.int32), ttype=i32),
            mb.add_tensor([len(strides)], f"{name}_s",
                          np.asarray(strides, np.int32), ttype=i32)]


def _dft_kernel():
    """Windowed real-DFT basis as a conv kernel [2*bins, n_fft] f32:
    rows 0..1024 cosine, rows 1025..2049 sine."""
    n = np.arange(N_FFT)
    k = np.arange(N_BINS)[:, None]
    win = np.hanning(N_FFT).astype(np.float64)
    ang = 2.0 * np.pi * k * n / N_FFT
    return np.concatenate([np.cos(ang) * win,
                           -np.sin(ang) * win]).astype(np.float32)


def _mel_fb():
    """[n_mels, n_bins] triangular filterbank (librosa-style HTK mels)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(15000.0), N_MELS + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((N_FFT + 1) * freqs / 48000.0).astype(int)
    fb = np.zeros((N_MELS, N_BINS), np.float32)
    for m in range(1, N_MELS + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for i in range(lo, c):
            if c > lo:
                fb[m - 1, i] = (i - lo) / (c - lo)
        for i in range(c, hi):
            if hi > c:
                fb[m - 1, i] = (hi - i) / (hi - c)
    return fb


def build_v24_fullscale(rng):
    """Full-scale replica flatbuffer + weight dict for the torch twin."""
    mb = ModelBuilder()
    W = {}

    def wtensor(shape, name, scale=None):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        s = scale if scale is not None else np.sqrt(2.0 / max(fan_in, 1))
        data = (rng.standard_normal(shape) * s).astype(np.float32)
        W[name] = data
        return mb.add_tensor(list(data.shape), name, data)

    def const(shape, name, data):
        W[name] = np.asarray(data, np.float32)
        return mb.add_tensor(list(W[name].shape), name, W[name])

    x_in = mb.add_tensor([1, CLIP], "pcm")
    shp = ModelBuilder.TTYPE_I32
    r1 = mb.add_tensor([4], "rs1", np.asarray([1, CLIP, 1, 1], np.int32),
                       ttype=shp)
    t_4d = mb.add_tensor([1, CLIP, 1, 1], "pcm4d")
    mb.add_op(Op.RESHAPE, [x_in, r1], [t_4d])

    # STFT: conv [2050, 2048, 1, 1] stride (512, 1) VALID — the windowed
    # DFT basis as convolution (how graph-embedded front ends express it)
    dft = _dft_kernel().reshape(2 * N_BINS, N_FFT, 1, 1)
    t_dftw = const(list(dft.shape), "dft_w", dft)
    t_dftb = const([2 * N_BINS], "dft_b", np.zeros(2 * N_BINS))
    t_stft = mb.add_tensor([1, FRAMES, 1, 2 * N_BINS], "stft")
    mb.add_op(Op.CONV_2D, [t_4d, t_dftw, t_dftb], [t_stft],
              lambda b: conv2d_options(b, padding=1, stride_h=HOP,
                                       stride_w=1))          # VALID
    t_sq = mb.add_tensor([1, FRAMES, 1, 2 * N_BINS], "stft_sq")
    mb.add_op(Op.MUL, [t_stft, t_stft], [t_sq])
    t_cos = mb.add_tensor([1, FRAMES, 1, N_BINS], "pow_cos")
    mb.add_op(Op.STRIDED_SLICE,
              [t_sq] + _strided_slice_inputs(
                  mb, "sc", [0, 0, 0, 0], [1, FRAMES, 1, N_BINS],
                  [1, 1, 1, 1]), [t_cos])
    t_sin = mb.add_tensor([1, FRAMES, 1, N_BINS], "pow_sin")
    mb.add_op(Op.STRIDED_SLICE,
              [t_sq] + _strided_slice_inputs(
                  mb, "ss", [0, 0, 0, N_BINS],
                  [1, FRAMES, 1, 2 * N_BINS], [1, 1, 1, 1]), [t_sin])
    t_pow = mb.add_tensor([1, FRAMES, 1, N_BINS], "power")
    mb.add_op(Op.ADD, [t_cos, t_sin], [t_pow])

    # mel projection + log
    r2 = mb.add_tensor([2], "rs2", np.asarray([FRAMES, N_BINS], np.int32),
                       ttype=shp)
    t_p2 = mb.add_tensor([FRAMES, N_BINS], "power2d")
    mb.add_op(Op.RESHAPE, [t_pow, r2], [t_p2])
    t_fbw = const([N_MELS, N_BINS], "mel_fb", _mel_fb())
    t_fbb = const([N_MELS], "mel_b", np.zeros(N_MELS))
    t_mel = mb.add_tensor([FRAMES, N_MELS], "mel")
    mb.add_op(Op.FULLY_CONNECTED, [t_p2, t_fbw, t_fbb], [t_mel],
              lambda b: fully_connected_options(b, activation=0))
    t_off = const([1], "log_off", [LOG_OFFSET])
    t_melo = mb.add_tensor([FRAMES, N_MELS], "mel_off")
    mb.add_op(Op.ADD, [t_mel, t_off], [t_melo])
    t_logm = mb.add_tensor([FRAMES, N_MELS], "logmel")
    mb.add_op(Op.LOG, [t_melo], [t_logm])
    r3 = mb.add_tensor([4], "rs3",
                       np.asarray([1, FRAMES, N_MELS, 1], np.int32),
                       ttype=shp)
    feats = mb.add_tensor([1, FRAMES, N_MELS, 1], "features")
    mb.add_op(Op.RESHAPE, [t_logm, r3], [feats])

    def out_hw(h, w, stride):
        return -(-h // stride), -(-w // stride)     # ceil (SAME)

    # stem 3x3 s2 relu6
    h, w = FRAMES, N_MELS
    t_sw = wtensor((32, 3, 3, 1), "stem_w")
    t_sb = wtensor((32,), "stem_b", scale=0.01)
    h, w = out_hw(h, w, 2)
    cur = mb.add_tensor([1, h, w, 32], "stem_out")
    mb.add_op(Op.CONV_2D, [feats, t_sw, t_sb], [cur],
              lambda b: conv2d_options(b, padding=0, stride_w=2,
                                       stride_h=2, activation=3))
    cin = 32
    bi = 0
    for (expand, cout, kernel, stride, repeats) in B0:
        for r in range(repeats):
            s = stride if r == 0 else 1
            n = f"b{bi}"
            cexp = cin * expand
            x_block = cur
            if expand != 1:
                we = wtensor((cexp, 1, 1, cin), f"{n}_exp_w")
                be = wtensor((cexp,), f"{n}_exp_b", scale=0.01)
                t = mb.add_tensor([1, h, w, cexp], f"{n}_exp")
                mb.add_op(Op.CONV_2D, [cur, we, be], [t],
                          lambda b: conv2d_options(b, padding=0,
                                                   activation=3))
                cur = t
            wd = wtensor((1, kernel, kernel, cexp), f"{n}_dw_w")
            bd = wtensor((cexp,), f"{n}_dw_b", scale=0.01)
            h, w = out_hw(h, w, s)
            t = mb.add_tensor([1, h, w, cexp], f"{n}_dw")
            mb.add_op(Op.DEPTHWISE_CONV_2D, [cur, wd, bd], [t],
                      lambda b, s=s: dwconv2d_options(
                          b, padding=0, stride_w=s, stride_h=s,
                          activation=3))
            cur = t
            # SE
            cse = max(1, cexp // 4)
            axes = mb.add_tensor([2], f"{n}_se_ax",
                                 np.asarray([1, 2], np.int32), ttype=shp)
            t_m = mb.add_tensor([1, 1, 1, cexp], f"{n}_se_m")
            mb.add_op(Op.MEAN, [cur, axes], [t_m],
                      lambda b: _mean_options(b, True))
            wr = wtensor((cse, cexp), f"{n}_se_rw")
            br = wtensor((cse,), f"{n}_se_rb", scale=0.01)
            t_r = mb.add_tensor([1, 1, 1, cse], f"{n}_se_r")
            mb.add_op(Op.FULLY_CONNECTED, [t_m, wr, br], [t_r],
                      lambda b: fully_connected_options(b, activation=1))
            wx = wtensor((cexp, cse), f"{n}_se_xw")
            bx = wtensor((cexp,), f"{n}_se_xb", scale=0.01)
            t_x = mb.add_tensor([1, 1, 1, cexp], f"{n}_se_x")
            mb.add_op(Op.FULLY_CONNECTED, [t_r, wx, bx], [t_x],
                      lambda b: fully_connected_options(b, activation=0))
            t_sg = mb.add_tensor([1, 1, 1, cexp], f"{n}_se_s")
            mb.add_op(Op.LOGISTIC, [t_x], [t_sg])
            t_se = mb.add_tensor([1, h, w, cexp], f"{n}_se")
            mb.add_op(Op.MUL, [cur, t_sg], [t_se])
            cur = t_se
            # project (linear)
            wp = wtensor((cout, 1, 1, cexp), f"{n}_proj_w")
            bp = wtensor((cout,), f"{n}_proj_b", scale=0.01)
            t = mb.add_tensor([1, h, w, cout], f"{n}_proj")
            mb.add_op(Op.CONV_2D, [cur, wp, bp], [t],
                      lambda b: conv2d_options(b, padding=0))
            cur = t
            if s == 1 and cin == cout:
                t = mb.add_tensor([1, h, w, cout], f"{n}_res")
                mb.add_op(Op.ADD, [cur, x_block], [t])
                cur = t
            cin = cout
            bi += 1

    # head: 1x1 conv → 1280 relu6 → GAP → FC 6522
    wh = wtensor((1280, 1, 1, cin), "head_w")
    bh = wtensor((1280,), "head_b", scale=0.01)
    t = mb.add_tensor([1, h, w, 1280], "head")
    mb.add_op(Op.CONV_2D, [cur, wh, bh], [t],
              lambda b: conv2d_options(b, padding=0, activation=3))
    gax = mb.add_tensor([2], "gap_ax", np.asarray([1, 2], np.int32),
                        ttype=shp)
    t_g = mb.add_tensor([1, 1280], "gap")
    mb.add_op(Op.MEAN, [t, gax], [t_g], lambda b: _mean_options(b, False))
    wc = wtensor((NUM_SPECIES, 1280), "cls_w", scale=0.02)
    bc = wtensor((NUM_SPECIES,), "cls_b", scale=0.01)
    t_l = mb.add_tensor([1, NUM_SPECIES], "logits")
    mb.add_op(Op.FULLY_CONNECTED, [t_g, wc, bc], [t_l],
              lambda b: fully_connected_options(b, activation=0))
    mb.inputs = [x_in]
    mb.outputs = [t_l]
    return mb.finish(), W


# ------------------------------------------------------------- torch twin

def _same_pad(x, k, s):
    """TF SAME padding (asymmetric: extra on bottom/right)."""
    ih, iw = x.shape[2], x.shape[3]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def torch_v24(W, pcm_np):
    """Independent full-scale forward with the flatbuffer's weights."""
    with torch.no_grad():
        x = torch.from_numpy(pcm_np).reshape(1, 1, CLIP)
        dft = torch.from_numpy(W["dft_w"]).reshape(2 * N_BINS, 1, N_FFT)
        st = F.conv1d(x, dft, stride=HOP)             # [1, 2050, F]
        st = st.permute(0, 2, 1)                      # [1, F, 2050]
        p = st * st
        power = p[..., :N_BINS] + p[..., N_BINS:]
        mel = power.reshape(FRAMES, N_BINS) \
            @ torch.from_numpy(W["mel_fb"]).T
        feats = torch.log(mel + LOG_OFFSET)
        x = feats.reshape(1, 1, FRAMES, N_MELS)       # NCHW

        def conv(x, wn, bn, stride=1, act=True, groups=1):
            wt = torch.from_numpy(np.ascontiguousarray(
                W[wn].transpose(0, 3, 1, 2)))         # OHWI → OIHW
            if groups > 1:                            # [1,kh,kw,C]→[C,1,k,k]
                wt = torch.from_numpy(np.ascontiguousarray(
                    W[wn].transpose(3, 0, 1, 2)))
            x = _same_pad(x, wt.shape[2], stride)
            y = F.conv2d(x, wt, torch.from_numpy(W[bn]), stride=stride,
                         groups=groups)
            return y.clamp(0, 6) if act else y

        x = conv(x, "stem_w", "stem_b", stride=2)
        cin = 32
        bi = 0
        for (expand, cout, kernel, stride, repeats) in B0:
            for r in range(repeats):
                s = stride if r == 0 else 1
                n = f"b{bi}"
                xb = x
                cexp = cin * expand
                if expand != 1:
                    x = conv(x, f"{n}_exp_w", f"{n}_exp_b")
                x = conv(x, f"{n}_dw_w", f"{n}_dw_b", stride=s,
                         groups=cexp)
                m = x.mean((2, 3))                    # [1, cexp]
                g = F.relu(m @ torch.from_numpy(W[f"{n}_se_rw"]).T
                           + torch.from_numpy(W[f"{n}_se_rb"]))
                g = torch.sigmoid(
                    g @ torch.from_numpy(W[f"{n}_se_xw"]).T
                    + torch.from_numpy(W[f"{n}_se_xb"]))
                x = x * g[:, :, None, None]
                x = conv(x, f"{n}_proj_w", f"{n}_proj_b", act=False)
                if s == 1 and cin == cout:
                    x = x + xb
                cin = cout
                bi += 1
        x = conv(x, "head_w", "head_b")
        g = x.mean((2, 3))
        logits = g @ torch.from_numpy(W["cls_w"]).T \
            + torch.from_numpy(W["cls_b"])
        return logits.numpy()


@pytest.fixture(scope="module")
def v24_replica():
    rng = np.random.default_rng(424)
    buf, W = build_v24_fullscale(rng)
    return buf, W


def test_fullscale_v24_replica_parity(v24_replica):
    """Imported full-scale graph == independent torch twin, raw PCM in,
    all 6,522 logits out, mel front end inside the graph."""
    buf, W = v24_replica
    assert len(buf) > 40 * 1024 * 1024        # genuinely full-scale
    model = load_tflite(buf)
    t = np.arange(CLIP) / 48000.0
    pcm = (0.25 * np.sin(2 * np.pi * 2000.0 * t)
           + 0.1 * np.sin(2 * np.pi * 5500.0 * t)).astype(np.float32)

    got = np.asarray(model.apply(model.params, pcm[None, :])[0])
    want = torch_v24(W, pcm)
    assert got.shape == (1, NUM_SPECIES)
    corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
    assert corr > 0.9999, corr
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)
    # recorded fixture: any op-semantics change at full scale fails here
    _golden_check("v24_fullscale_replica_logits", got)


# ----------------------------------------------- FP16 MData range filter

def build_mdata_fullscale(rng):
    """Full-scale FP16 geomodel flatbuffer: 96 sinusoidal features →
    512×512×512 relu MLP → 6,522 sigmoid scores (MData encoding: every
    weight stored f16)."""
    mb = ModelBuilder()
    W = {}
    dims = [96, 512, 512, 512, NUM_SPECIES]

    def wtensor(shape, name):
        data = (rng.standard_normal(shape)
                * np.sqrt(2.0 / shape[-1])).astype(np.float32)
        W[name] = data.astype(np.float16).astype(np.float32)  # f16 truth
        return mb.add_tensor(list(shape), name, data.astype(np.float16),
                             ttype=ModelBuilder.TTYPE_F16)

    x_in = mb.add_tensor([1, 96], "features")
    cur = x_in
    for i in range(len(dims) - 1):
        w = wtensor((dims[i + 1], dims[i]), f"l{i}_w")
        b = wtensor((dims[i + 1],), f"l{i}_b")
        t = mb.add_tensor([1, dims[i + 1]], f"l{i}_out")
        act = 1 if i < len(dims) - 2 else 0           # RELU / linear
        mb.add_op(Op.FULLY_CONNECTED, [cur, w, b], [t],
                  lambda bb, act=act: fully_connected_options(bb, act))
        cur = t
    t_s = mb.add_tensor([1, NUM_SPECIES], "scores")
    mb.add_op(Op.LOGISTIC, [cur], [t_s])
    mb.inputs = [x_in]
    mb.outputs = [t_s]
    return mb.finish(), W


def test_fullscale_mdata_fp16_and_geomodel_artifact(tmp_path, monkeypatch):
    rng = np.random.default_rng(77)
    buf, W = build_mdata_fullscale(rng)
    model = load_tflite(buf)
    feats = rng.standard_normal((1, 96)).astype(np.float32)

    got = np.asarray(model.apply(model.params, feats)[0])
    with torch.no_grad():
        x = torch.from_numpy(feats)
        for i in range(3):
            x = F.relu(x @ torch.from_numpy(W[f"l{i}_w"]).T
                       + torch.from_numpy(W[f"l{i}_b"]))
        x = x @ torch.from_numpy(W["l3_w"]).T + torch.from_numpy(W["l3_b"])
        want = torch.sigmoid(x).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    _golden_check("mdata_fullscale_scores", got, atol=1e-3)

    # imported weights → Geomodel params → installed artifact →
    # load_geomodel serves THEM, not random init
    from birdnet_go_tpu.inference import loader
    from birdnet_go_tpu.inference.checkpoint import save_params
    from birdnet_go_tpu.models.geomodel import Geomodel, GeomodelConfig

    params = {"mlp": [{"w": W[f"l{i}_w"].T, "b": W[f"l{i}_b"]}
                      for i in range(4)]}
    home = tmp_path / "models"
    save_params(params, home / "Geomodel")
    monkeypatch.setenv(loader._MODELS_ENV, str(home))
    g, gparams = loader.load_geomodel()
    assert isinstance(g, Geomodel)
    np.testing.assert_allclose(np.asarray(gparams["mlp"][0]["w"]),
                               W["l0_w"].T, rtol=1e-6)
    # served scores flow from the artifact: geomodel.apply(encode(x))
    # must equal the flatbuffer's MLP on the same encoded features
    cfg = GeomodelConfig()
    import jax.numpy as jnp

    coords = jnp.asarray([[44.0, -72.0, 20.0]], jnp.float32)
    enc = np.asarray(g.encode(coords))
    scores_geo = np.asarray(g.apply(gparams, coords))
    scores_fb = np.asarray(model.apply(model.params,
                                       enc.astype(np.float32))[0])
    np.testing.assert_allclose(scores_geo, scores_fb, rtol=1e-3,
                               atol=1e-4)
    assert cfg.num_species == NUM_SPECIES


# ------------------------------------------------- real-artifact opt-in

@pytest.mark.skipif("BIRDNET_V24_TFLITE" not in os.environ,
                    reason="set BIRDNET_V24_TFLITE=/path/to/real.tflite "
                           "(pinned HF artifact) to run real-weight "
                           "parity")
def test_real_artifact_import_and_golden():
    """With the real pinned artifact present: import it, run the test
    WAV, and pin the top species as a golden (REGEN_GOLDEN=1 to record
    the first time)."""
    path = Path(os.environ["BIRDNET_V24_TFLITE"])
    model = load_tflite(path.read_bytes())
    from birdnet_go_tpu.audio.wav import read_wav

    samples, info = read_wav(Path("/root/reference/tawnyowl.wav"))
    n = min(len(samples), CLIP)
    pcm = np.zeros(CLIP, np.float32)
    pcm[:n] = samples[:n]
    out = np.asarray(model.apply(model.params, pcm[None, :])[0])
    _golden_check("real_v24_artifact_logits", out, atol=1e-3)


# ------------------------------------------------ Perch v2-scale ONNX

def test_fullscale_perch_onnx_parity():
    """Full-scale Perch v2-shaped ONNX: conv backbone (Conv+BN+Relu
    stride-2 stack over the 5 s/32 kHz mel grid) → GlobalAveragePool →
    1280-dim embedding → the defining 14,795-wide head — imported and
    torch-verified end to end, golden-pinned (VERDICT r3 #4 second
    half; reference perch ONNX via internal/inference/onnx)."""
    from birdnet_go_tpu.inference.onnx_import import load_onnx
    from tests.onnx_builder import (
        attr_int,
        attr_ints,
        model,
        node,
        tensor_proto,
    )

    rng = np.random.default_rng(99)
    N_SP, EMB = 14795, 1280
    W = {}

    def t(name, shape, scale=None):
        fan = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        s = scale if scale is not None else np.sqrt(2.0 / max(fan, 1))
        W[name] = (rng.standard_normal(shape) * s).astype(np.float32)
        return tensor_proto(name, W[name])

    chans = [1, 64, 128, 256, 512]
    inits, nodes = [], []
    cur = "mel"
    for i in range(4):
        cin, cout = chans[i], chans[i + 1]
        inits += [t(f"c{i}_w", (cout, cin, 3, 3)),
                  t(f"c{i}_b", (cout,), 0.01),
                  t(f"c{i}_g", (cout,), 0.1), t(f"c{i}_be", (cout,), 0.01),
                  t(f"c{i}_m", (cout,), 0.01), t(f"c{i}_v", (cout,), 0.0)]
        W[f"c{i}_v"] = np.abs(W[f"c{i}_v"]) + 1.0   # variance must be >0
        inits[-1] = tensor_proto(f"c{i}_v", W[f"c{i}_v"])
        nodes += [
            node("Conv", [cur, f"c{i}_w", f"c{i}_b"], [f"conv{i}"],
                 [attr_ints("strides", [2, 2]),
                  attr_ints("pads", [1, 1, 1, 1])]),
            node("BatchNormalization",
                 [f"conv{i}", f"c{i}_g", f"c{i}_be", f"c{i}_m",
                  f"c{i}_v"], [f"bn{i}"]),
            node("Relu", [f"bn{i}"], [f"act{i}"]),
        ]
        cur = f"act{i}"
    inits += [t("emb_w", (512, EMB), 0.05), t("emb_b", (EMB,), 0.01),
              t("head_w", (EMB, N_SP), 0.02), t("head_b", (N_SP,), 0.01)]
    nodes += [
        node("GlobalAveragePool", [cur], ["gap"]),
        node("Flatten", ["gap"], ["flat"], [attr_int("axis", 1)]),
        node("Gemm", ["flat", "emb_w", "emb_b"], ["pre_emb"]),
        node("Relu", ["pre_emb"], ["embedding"]),
        node("Gemm", ["embedding", "head_w", "head_b"], ["logits"]),
    ]
    buf = model(nodes, inits, inputs=["mel"], outputs=["logits"])
    assert len(buf) > 70 * 1024 * 1024           # genuinely full-scale
    g = load_onnx(buf)
    x = rng.standard_normal((1, 1, 160, 128)).astype(np.float32)
    (got,) = g.jitted()(g.params, x)
    got = np.asarray(got)

    with torch.no_grad():
        h = torch.from_numpy(x)
        for i in range(4):
            h = F.conv2d(h, torch.from_numpy(W[f"c{i}_w"]),
                         torch.from_numpy(W[f"c{i}_b"]), stride=2,
                         padding=1)
            k = W[f"c{i}_g"] / np.sqrt(W[f"c{i}_v"] + 1e-5)
            h = h * torch.from_numpy(k)[None, :, None, None] \
                + torch.from_numpy(W[f"c{i}_be"] - W[f"c{i}_m"] * k)[
                    None, :, None, None]
            h = F.relu(h)
        e = h.mean((2, 3))
        e = F.relu(e @ torch.from_numpy(W["emb_w"])
                   + torch.from_numpy(W["emb_b"]))
        want = (e @ torch.from_numpy(W["head_w"])
                + torch.from_numpy(W["head_b"])).numpy()
    assert got.shape == (1, N_SP)
    corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
    assert corr > 0.9999, corr
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)
    _golden_check("perch_fullscale_onnx_logits", got)
