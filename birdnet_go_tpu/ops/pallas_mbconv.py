"""Fused stride-1 MBConv Pallas kernels (TPU).

The EfficientNet backbone is HBM-bound: XLA cannot fuse across conv
boundaries, so each MBConv block (expand 1×1 → swish → depthwise → SE →
project 1×1) materializes its 6×-expanded activations four times
(expand write, depthwise read/write, SE-scaled write, project read) —
~38·C bytes of HBM traffic per position against a ~15·C theoretical
floor (docs/ARCHITECTURE.md throughput anatomy; reference behavior:
internal/classifier, EfficientNet-B0 backbone of BirdNET v2.4).

This module closes most of that gap for stride-1 blocks with TWO
kernels per block:

  kernel A  x[S, C] ─ expand matmul ─ BN·swish ─ depthwise(taps) ─
            BN·swish → y[S, 6C] + channel pool (SE squeeze input)
  (SE mid: two tiny FCs on [B, 6C] — plain XLA, negligible)
  kernel B  y[S, 6C] ─ ×SE scale ─ project matmul ─ BN ─ (+residual)
            → out[S, C']

Traffic per block drops from ~38·C to ~15·C units: the expanded tensor
is written once and read once instead of 3×/3×.

TPU-layout design:
- activations are flattened [B, S=H·W, C] with spatial in SUBLANES and
  channels in LANES — 1×1 convs become plain [S, C] @ [C, C'] MXU dots
  with M = whole image (S up to 6.7k rows), no relayouts;
- the depthwise conv is tap-decomposed: out[s] = Σ_t k_t · in[s + d_t]
  with d_t = dy·W + dx. Each tap is a static sublane roll
  (pltpu.roll) plus an edge mask built from a 2-D iota (w+dx and h+dy
  in range) — positions whose roll wrapped across a row or image edge
  contribute zero, exactly SAME-padding semantics;
- one grid step = one whole image (grid (B,)): no halo exchange, no
  manual DMA, every BlockSpec is a plain aligned block;
- HBM DMA moves dense bytes, so lane padding of small C costs compute
  lanes only, not bandwidth — the early small-C blocks (where most of
  the backbone's traffic lives) fuse profitably too.

MEASURED NEGATIVE RESULT (v5e, B=1024, kept for the record): the
tap-decomposed depthwise is the defeat. Each pltpu.roll materializes a
full shifted copy of the expanded activations in VMEM, so a k×k block
moves ~2·k²·S·Cm bytes of VMEM traffic — more than the HBM traffic the
fusion saves. Measured per block (fused vs XLA): stage2-r1 23.0 vs
7.5 ms, stage3-r1 10.7 vs 5.6 ms, stage5-r1 8.0 vs 5.3 ms; the
no-expand stage-1 shape fails to compile (lane-padded C=32 inflates the
rolled copies past VMEM). XLA's conv kernels reuse sliding-window
registers across taps, which Pallas value-land cannot express today —
so the production path keeps XLA convs (which measure AT the
conv-boundary HBM roofline, docs/ARCHITECTURE.md) and
apply_efficientnet's `fused_blocks` flag stays False. The kernels and
their interpret-mode parity suite (tests/test_pallas_mbconv.py) remain
as the documented experiment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3


def _fold_bn(p) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inference BN as y = x·k + b (f32 row vectors [1, C])."""
    k = p["scale"] * jax.lax.rsqrt(p["var"] + _BN_EPS)
    b = p["bias"] - p["mean"] * k
    return k[None, :].astype(jnp.float32), b[None, :].astype(jnp.float32)


def _taps(k: int, w: int) -> list[tuple[int, int, int]]:
    """(dy, dx, flat offset) for a k×k SAME depthwise at image width w."""
    r = k // 2
    return [(dy, dx, dy * w + dx)
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def fused_block_ok(stride: int, h: int, w: int, train: bool) -> bool:
    """Gate: stride-1 inference blocks with enough spatial rows to keep
    the MXU M-dimension occupied (tail stages with S=h·w < 64 stay on
    the XLA path — their traffic is negligible and M would be <50%
    occupied)."""
    return stride == 1 and not train and h * w >= 64


def expand_dw_pool(x, wexp, kexp, bexp, dwk, kdw, bdw, *,
                   height: int, width: int, kernel: int,
                   out_dtype=jnp.bfloat16, dot_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """Kernel A. x [B, S, C] → (y [B, S, Cm], pool_sum [B, Cm] f32).

    wexp [C, Cm] or None (expand-less blocks, Cm == C); dwk [k·k, Cm]
    tap-major depthwise weights; kexp/bexp/kdw/bdw folded-BN [1, Cm]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c = x.shape
    cm = dwk.shape[1]
    taps = _taps(kernel, width)
    has_expand = wexp is not None

    def kern(*refs):
        if has_expand:
            (x_ref, we_ref, ke_ref, be_ref, dk_ref, kd_ref, bd_ref,
             y_ref, p_ref) = refs
        else:
            (x_ref, ke_ref, be_ref, dk_ref, kd_ref, bd_ref,
             y_ref, p_ref) = refs
        xv = x_ref[0]
        if has_expand:
            h = jnp.dot(xv.astype(dot_dtype),
                        we_ref[:].astype(dot_dtype),
                        preferred_element_type=jnp.float32)
            h = h * ke_ref[:] + be_ref[:]
            h = h * jax.nn.sigmoid(h)                     # swish
        else:
            h = xv.astype(jnp.float32)
        # depthwise: static sublane rolls + edge masks (SAME padding)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
        wcol = sidx % width
        hrow = sidx // width
        acc = jnp.zeros((s, cm), jnp.float32)
        for t, (dy, dx, d) in enumerate(taps):
            # roll is circular and requires shift >= 0: -d ≡ (-d) mod S
            src = pltpu.roll(h, (-d) % s, axis=0) if d else h
            ok = ((wcol + dx >= 0) & (wcol + dx < width)
                  & (hrow + dy >= 0) & (hrow + dy < height))
            acc = acc + jnp.where(ok, src, 0.0) * dk_ref[t, :]
        acc = acc * kd_ref[:] + bd_ref[:]
        acc = acc * jax.nn.sigmoid(acc)                    # swish
        y_ref[0] = acc.astype(y_ref.dtype)
        p_ref[0, 0, :] = jnp.sum(acc, axis=0)

    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda bi: (0,) * len(shape)), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, s, c), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    if has_expand:
        in_specs.append(const(c, cm))
        args.append(wexp)
    in_specs += [const(1, cm), const(1, cm), const(len(taps), cm),
                 const(1, cm), const(1, cm)]
    args += [kexp, bexp, dwk, kdw, bdw]
    y, pool = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, s, cm), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            # pool rides as [B, 1, Cm]: a (1, 1, cm) block's trailing
            # dims equal the array dims, satisfying the TPU block rule
            # (a rank-2 (1, cm) block would need 8-divisible sublanes)
            pl.BlockSpec((1, 1, cm), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, cm), out_dtype),
            jax.ShapeDtypeStruct((b, 1, cm), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return y, pool[:, 0, :]


def scale_project(y, se, wproj, kpr, bpr, res, *,
                  out_dtype=jnp.bfloat16, dot_dtype=jnp.bfloat16,
                  interpret: bool = False):
    """Kernel B. y [B, S, Cm] × se [B, Cm] → project → BN → (+res).

    res is the block input [B, S, C'] for identity-residual blocks, or
    None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, cm = y.shape
    c2 = wproj.shape[1]
    has_res = res is not None

    def kern(*refs):
        if has_res:
            y_ref, se_ref, w_ref, k_ref, b_ref, r_ref, o_ref = refs
        else:
            y_ref, se_ref, w_ref, k_ref, b_ref, o_ref = refs
        z = y_ref[0].astype(jnp.float32) * se_ref[0]
        o = jnp.dot(z.astype(dot_dtype),
                    w_ref[:].astype(dot_dtype),
                    preferred_element_type=jnp.float32)
        o = o * k_ref[:] + b_ref[:]
        if has_res:
            o = o + r_ref[0].astype(jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, (lambda bi: (0,) * len(shape)), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, s, cm), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cm), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        const(cm, c2), const(1, c2), const(1, c2),
    ]
    args = [y, se[:, None, :], wproj, kpr, bpr]
    if has_res:
        in_specs.append(pl.BlockSpec((1, s, c2), lambda bi: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(res)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, c2), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c2), out_dtype),
        interpret=interpret,
    )(*args)


def mbconv_fused(p, x, *, kernel: int, compute_dtype=jnp.bfloat16,
                 dot_dtype=jnp.bfloat16, interpret: bool = False):
    """Drop-in for layers.apply_mbconv (stride-1, inference) using the
    two fused kernels. x, return: NHWC [B, H, W, C]."""
    bsz, height, width, cin = x.shape
    s = height * width
    xf = x.reshape(bsz, s, cin)

    cm = p["dw"]["w"].shape[-1]
    dwk = p["dw"]["w"][:, :, 0, :].reshape(kernel * kernel, cm)
    kdw, bdw = _fold_bn(p["dw_bn"])
    if "expand_conv" in p:
        wexp = p["expand_conv"]["w"][0, 0]                 # [C, Cm]
        kexp, bexp = _fold_bn(p["expand_bn"])
    else:
        # no expand stage: the kernel skips the matmul, so its BN consts
        # are unused — identity placeholders keep the arg list uniform
        wexp = None
        kexp = jnp.ones((1, cm), jnp.float32)
        bexp = jnp.zeros((1, cm), jnp.float32)

    y, pool = expand_dw_pool(
        xf, wexp, kexp, bexp, dwk.astype(jnp.float32), kdw, bdw,
        height=height, width=width, kernel=kernel,
        out_dtype=compute_dtype, dot_dtype=dot_dtype, interpret=interpret)

    # SE mid: identical math to layers.apply_se on the pooled mean
    from birdnet_go_tpu.models import layers as L

    if "se" in p:
        pooled = (pool / float(s)).astype(compute_dtype)
        mid = L.swish(L.apply_dense(p["se"]["reduce"], pooled,
                                    compute_dtype))
        sev = jax.nn.sigmoid(L.apply_dense(p["se"]["expand"], mid,
                                           compute_dtype))
        sev = sev.astype(jnp.float32)
    else:
        sev = jnp.ones((bsz, cm), jnp.float32)

    wproj = p["project_conv"]["w"][0, 0]                   # [Cm, C2]
    kpr, bpr = _fold_bn(p["project_bn"])
    cout = wproj.shape[1]
    res = xf if cin == cout else None
    out = scale_project(y, sev, wproj, kpr, bpr, res,
                        out_dtype=compute_dtype, dot_dtype=dot_dtype,
                        interpret=interpret)
    return out.reshape(bsz, height, width, cout)
