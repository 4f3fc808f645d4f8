"""Fused mel-spectrogram Pallas kernel (TPU).

The XLA path (ops.melspec) materializes windowed frames in HBM
([B, F, n_fft] f32 ≈ 2.3 MB/window) between the framing gather and the
DFT matmuls. This kernel keeps everything in VMEM: each grid step DMAs a
raw int16 PCM tile from HBM, converts + windows + runs a two-stage matmul
DFT + mel projection on chip, and writes only the [F_tile, n_mels] mel
rows back — HBM traffic drops from ~5 MB to ~0.4 MB per window.

TPU-layout design (everything lane-aligned, no cross-lane reshapes):
- radix split A=16, B=128 (lane width), so frame sample n = a·128 + b —
  i.e. a frame IS 16 contiguous sublane rows of the [rows, 128] PCM tile.
  Requires hop % 128 == 0 and n_fft % 128 == 0.
- stage 1 runs per GROUP of G frames as ONE block-diagonal matmul:
  wblk[G·16, G·16] @ xg[G·16, 128] — the [16,16] DFT-over-a matrix
  repeated down the diagonal, replacing 2·G tiny [16,16]@[16,128] dots
  whose pass latency dominated v1 (34.6 ms/1024-batch). v3: G=8 with
  the group loop STATICALLY UNROLLED and the gather in value-land —
  each block-diagonal dot is exactly one full MXU pass
  ([128,128]@[128,128]), the redundant-FLOP factor halves vs G=16, and
  unrolling lets Mosaic pipeline group i+1's VPU windowing under group
  i's dots. Measured on v5e, 1024 windows: v1 34.6 → v2 (G=16+fori)
  16.9 → v3 12.6 ms. (Same sweep: G=16+unroll 14.7, G=8+fori 17.1 —
  BOTH changes are needed; bf16 staging measured 12.8, within noise of
  f32, so staging stays f32 — re-measured under v4 in round 4:
  bf16 8.59 vs f32 8.27 ms median, still no win.)
- v4 (packed=True, the DEFAULT since round 4): the stage-1 DFT input is
  REAL, so S[16−r] = conj(S[r]) — a stage-timing probe showed stage 1
  at 9.0 of v3's 12.5 ms, at its MXU pass floor. One PACKED real
  [16,16] matrix (rows re(S[0..8]), im(S[1..7])) replaces the separate
  re/im dots, halving stage-1 passes; the conjugate-symmetry signs for
  r > 8 are pre-baked into per-residue stage-2 twiddle slab PAIRS
  (twa·sr + twb·si, K=128 each) and r ∈ {0, 8} skip the imaginary dot
  entirely. Scratch S also halves. Parity-tested in interpret mode AND
  landed on device in round 4: v5e compile 32–66 s (the r3 69-min
  compile hang never reproduced), interleaved A/B medians over 6
  trials: v4 8.23 ms vs v3 9.08 ms per 1024-batch (−9.4%, spread
  <0.15 ms). BIRDNET_MEL_PACKED=0 restores v3.
- stage 2 per residue r: one packed dot [F, 256] @ [256, 2·J2] computing
  re|im together from the adjacent sr|si scratch halves. J2 is trimmed to
  the mel filterbank's actual bin support (bin = r + 16·j; fmax=15 kHz →
  j ≤ 41 → J2=64), halving stage-2/mel work vs the padded J=128 of v1
  (whose j>64 columns were all zeros anyway).
- mel per residue: power[F, J2] @ fb_r[J2, n_mels], accumulated — the
  (r, j) → bin permutation is absorbed into the per-r filterbank slabs.

Grid: (batch, frame_tiles). Inputs are padded so the last tile's DMA
stays in bounds; padded frames produce rows the caller slices off.
`interpret=True` runs anywhere (CPU tests).

Numerics: in-kernel MXU matmuls run at hardware precision (bf16-class for
f32 inputs), giving ~7e-2 max-rel vs the HIGHEST-precision XLA path on raw
mel values; at the detection level this is ≲0.002 confidence delta and
98.75% top-10 overlap — inside float tolerance for the bf16 CNN it feeds.
Enabled automatically on TPU via BirdNETv24.apply_int16.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from birdnet_go_tpu.ops.melspec import (
    MelConfig,
    _mel_filterbank_permuted_np,
    _rdft_matmul_consts,
    _window_fn,
)

_INT16_SCALE = 1.0 / 32768.0
_A = 16                       # radix: B = n_fft // 16 must equal 128
_LANE = 128
_G = 16                       # frames per stage-1 block-diagonal dot


@functools.lru_cache(maxsize=8)
def _kernel_consts(sample_rate: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float, g: int = _G, packed: bool = False):
    war, wai, twr, twi, _, a_sz, b_sz, j_sz = _rdft_matmul_consts(n_fft, _A)
    assert a_sz == _A and b_sz == _LANE
    half = a_sz // 2

    # permuted filterbank [A*j_sz, m] → decide the j support actually used
    fbp = _mel_filterbank_permuted_np(sample_rate, n_fft, n_mels, fmin,
                                      fmax, _A).reshape(a_sz, j_sz, n_mels)
    used = np.nonzero(fbp.any(axis=(0, 2)))[0]
    j_need = int(used[-1]) + 1 if len(used) else 1
    # J2: filterbank support rounded to a sublane multiple, capped at j_sz.
    # 48 kHz / fmax 15 kHz → 41 → 48; full-band configs fall back to 128.
    j2 = min(-(-j_need // 8) * 8, -(-j_sz // 8) * 8)
    js = min(j2, j_sz)

    # fb2 [A, j2, m] (zero rows beyond the real j_sz)
    fb2 = np.zeros((a_sz, j2, n_mels), np.float32)
    fb2[:, :js, :] = fbp[:, :js, :]

    if not packed:
        # v3 stage 1: separate re/im block-diagonal matrices
        wblk_r = np.zeros((g * a_sz, g * a_sz), np.float32)
        wblk_i = np.zeros((g * a_sz, g * a_sz), np.float32)
        for gi in range(g):
            lo, hi = gi * a_sz, (gi + 1) * a_sz
            wblk_r[lo:hi, lo:hi] = war
            wblk_i[lo:hi, lo:hi] = wai
        # stage-2 packed twiddles [A, 2B, 2*j2]:
        #   [sr | si] @ [[twr, twi], [-twi, twr]] = [re | im]
        # j2 may exceed the real j_sz when the filterbank uses the top
        # DFT bins (fmax near Nyquist) — clamp the copy, pad with zero.
        twp = np.zeros((a_sz, 2 * b_sz, 2 * j2), np.float32)
        twp[:, :b_sz, :js] = twr[:, :, :js]
        twp[:, :b_sz, j2:j2 + js] = twi[:, :, :js]
        twp[:, b_sz:, :js] = -twi[:, :, :js]
        twp[:, b_sz:, j2:j2 + js] = twr[:, :, :js]
        return (wblk_r, wblk_i), (twp,), fb2, j2

    # v4 stage 1 (packed): the A-point DFT input is REAL, so
    # S[A-r] = conj(S[r]) — only re(S[0..8]) and im(S[1..7]) are
    # independent. ONE packed real [A, A] matrix (rows 0..half = re,
    # rows half+1.. = im of r=1..7) computes them all, HALVING stage-1
    # MXU passes vs separate war/wai dots (which spent 9.0 of the
    # 12.5 ms v3 step, at the pass-latency floor).
    wpk = np.zeros((a_sz, a_sz), np.float32)
    wpk[:half + 1, :] = war[:half + 1, :]
    wpk[half + 1:, :] = wai[1:half, :]
    wblk = np.zeros((g * a_sz, g * a_sz), np.float32)
    for gi in range(g):
        wblk[gi * a_sz:(gi + 1) * a_sz, gi * a_sz:(gi + 1) * a_sz] = wpk

    # stage-2 twiddles as per-residue PAIRS contracted against the packed
    # rows (p1 = re row, p2 = im row), symmetry signs baked in:
    #   r <= 8:  re = sr_r·twr − si_r·twi,  im = sr_r·twi + si_r·twr
    #   r >  8:  sr_r = sr_{A−r}, si_r = −si_{A−r} → B slab negated.
    twa = np.zeros((a_sz, b_sz, 2 * j2), np.float32)
    twb = np.zeros((a_sz, b_sz, 2 * j2), np.float32)
    for r in range(a_sz):
        twa[r, :, :js] = twr[r, :, :js]
        twa[r, :, j2:j2 + js] = twi[r, :, :js]
        if r % half:                       # r = 0, 8 have im(S) = 0
            sign = 1.0 if r < half else -1.0
            twb[r, :, :js] = -sign * twi[r, :, :js]
            twb[r, :, j2:j2 + js] = sign * twr[r, :, :js]
    return (wblk,), (twa, twb), fb2, j2


def melspec_fused(pcm_i16: jnp.ndarray, cfg: MelConfig,
                  tile_f: int | None = None,
                  interpret: bool = False,
                  out_dtype=jnp.float32,
                  groups: int = 8,
                  unroll: bool = True,
                  stage_dtype=jnp.float32,
                  packed: bool | None = None,
                  _profile_stage: str = "full") -> jnp.ndarray:
    """int16 PCM [B, T] → mel [B, F, n_mels] (cfg.mag_scale applied).

    `out_dtype=bfloat16` writes the CNN's input dtype directly — halves
    the mel→backbone HBM round trip (the consumer casts to bf16 anyway).
    `groups` = frames per stage-1 block-diagonal dot (perf knob);
    `unroll` statically unrolls the stage-1 group loop so Mosaic can
    software-pipeline the VPU gather of group i+1 under group i's dots.
    `packed` selects the v4 conjugate-symmetry stage 1 (half the MXU
    passes); ON by default — measured 8.23 vs 9.08 ms/1024-batch on
    v5e (see header); BIRDNET_MEL_PACKED=0 restores v3."""
    import os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if packed is None:
        packed = os.environ.get("BIRDNET_MEL_PACKED", "1") == "1"

    if cfg.power != 2.0:
        raise ValueError("fused kernel supports power spectrogram only")
    if cfg.hop % _LANE or cfg.n_fft % _LANE or cfg.n_fft // _A != _LANE:
        raise ValueError(
            f"fused kernel needs hop%128==0 and n_fft==2048 "
            f"(got hop={cfg.hop}, n_fft={cfg.n_fft})")

    b, t = pcm_i16.shape
    g = groups
    n_frames = cfg.num_frames(t)
    if tile_f is None:
        # One tile per window when it fits: the stage-2 dots become
        # [n_frames, 256] @ [256, ·] — tall MXU shapes instead of M=32
        # slivers. Cap by the f32 scratch budget
        # (tile_f × A × 2·LANE × 4 B ≤ ~8 MB VMEM).
        tile_f = min(n_frames, 512)
    hop_rows = cfg.hop // _LANE
    frame_rows = cfg.n_fft // _LANE                   # = 16
    # stage 1 reads frame GROUPS of g frames; group start row
    # i·g·hop_rows must be a multiple of 8 (Mosaic sublane rule).
    if (g * hop_rows) % 8:
        raise ValueError(f"groups*hop_rows must be a multiple of 8 "
                         f"(got {g}*{hop_rows})")
    tile_f = -(-tile_f // g) * g
    n_tiles = math.ceil(n_frames / tile_f)
    block_rows = -(-((g - 1) * hop_rows + frame_rows) // 8) * 8
    tile_rows = (tile_f // g - 1) * g * hop_rows + block_rows
    tile_rows = -(-tile_rows // 16) * 16    # sublane-align the DMA (int16)
    padded_rows = (n_tiles - 1) * tile_f * hop_rows + tile_rows
    t_rows = math.ceil(t / _LANE)
    if padded_rows > t_rows:
        pcm_i16 = jnp.pad(pcm_i16,
                          ((0, 0), (0, padded_rows * _LANE - t)))
    elif t % _LANE:
        pcm_i16 = jnp.pad(pcm_i16, ((0, 0), (0, _LANE - t % _LANE)))
        padded_rows = max(padded_rows, t_rows)
    pcm3 = pcm_i16[:, :padded_rows * _LANE].reshape(b, padded_rows, _LANE)

    w1s, tws, fb2, j2 = _kernel_consts(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, g,
        packed)
    win2 = _window_fn(cfg).reshape(frame_rows, _LANE)
    ga = g * _A
    half = _A // 2
    s_lanes = _LANE if packed else 2 * _LANE

    def kernel(pcm_ref, win_ref, *refs):
        if packed:
            wbk_ref, twa_ref, twb_ref, fb_ref, out_ref, s_ref, xg_ref = refs
        else:
            wbr_ref, wbi_ref, twp_ref, fb_ref, out_ref, s_ref, xg_ref = refs
        bi = pl.program_id(0)
        ft = pl.program_id(1)

        def body(tile_ref, dma_sem):
            start_row = ft * (tile_f * hop_rows)
            dma = pltpu.make_async_copy(
                pcm_ref.at[bi, pl.ds(start_row, tile_rows), :],
                tile_ref, dma_sem)
            dma.start()
            dma.wait()

            # stage 1 per group: gather + window g frames into xg
            # [g·16, 128], then the block-diagonal dot(s): one per re/im
            # (v3), or ONE packed-rDFT dot using conjugate symmetry (v4
            # — see _kernel_consts). Scratch s is frame-major
            # [tile_f, A, lanes]; dim 0 of a rank-3 ref is untiled, so
            # per-group dynamic writes are legal.
            def s1(i, _):
                block = (tile_ref[pl.ds(i * g * hop_rows, block_rows), :]
                         .astype(jnp.float32) * _INT16_SCALE)
                if unroll:
                    # value-land gather: no scratch round-trip, so Mosaic
                    # can overlap group i+1's VPU windowing with group
                    # i's MXU dots
                    xg = jnp.concatenate(
                        [block[j * hop_rows:j * hop_rows + frame_rows, :]
                         * win_ref[:] for j in range(g)], axis=0)
                else:
                    for j in range(g):
                        xg_ref[j * frame_rows:(j + 1) * frame_rows, :] = (
                            block[j * hop_rows:j * hop_rows + frame_rows, :]
                            * win_ref[:])
                    xg = xg_ref[:]
                if packed:
                    sp = jnp.dot(wbk_ref[:], xg,
                                 preferred_element_type=jnp.float32)
                    s_ref[pl.ds(i * g, g), :, :] = (
                        sp.reshape(g, _A, _LANE).astype(stage_dtype))
                else:
                    sr = jnp.dot(wbr_ref[:], xg,
                                 preferred_element_type=jnp.float32)
                    si = jnp.dot(wbi_ref[:], xg,
                                 preferred_element_type=jnp.float32)
                    s_ref[pl.ds(i * g, g), :, :] = jnp.concatenate(
                        [sr.reshape(g, _A, _LANE),
                         si.reshape(g, _A, _LANE)],
                        axis=2).astype(stage_dtype)
                return 0

            if unroll:
                for i in range(tile_f // g):
                    s1(i, 0)
            else:
                jax.lax.fori_loop(0, tile_f // g, s1, 0)

            # stage 2 + mel, statically unrolled over residues r (static
            # middle-dim indices avoid dynamic sublane slicing): per-r
            # re|im — from the [sr|si] rows via one 2B-wide dot (v3) or
            # from the packed rows (p1 = re, p2 = im, symmetry signs
            # pre-baked into twb — v4) — then power @ filterbank slab.
            s_all = s_ref[:]              # [tile_f, A, lanes]
            mel = jnp.zeros((tile_f, cfg.n_mels), jnp.float32)
            if _profile_stage == "s1":    # timing probe: stage 1 only
                # scalar reduce keeps stage 1 live without the trailing-1
                # slice Mosaic's layout inference rejects
                mel = mel + jnp.sum(s_all)
            else:
                for r in range(_A):
                    if packed:
                        p1 = r if r <= half else _A - r
                        reim = jnp.dot(s_all[:, p1, :],
                                       twa_ref[r].astype(stage_dtype),
                                       preferred_element_type=jnp.float32)
                        if r % half:      # r = 0, 8: im(S_r) = 0
                            p2 = half + (r if r < half else _A - r)
                            reim = reim + jnp.dot(
                                s_all[:, p2, :],
                                twb_ref[r].astype(stage_dtype),
                                preferred_element_type=jnp.float32)
                    else:
                        reim = jnp.dot(s_all[:, r, :],
                                       twp_ref[r].astype(stage_dtype),
                                       preferred_element_type=jnp.float32)
                    power = reim[:, :j2] ** 2 + reim[:, j2:] ** 2
                    if _profile_stage == "s2":   # probe: skip mel dot
                        mel = mel + jnp.sum(power)
                    else:
                        mel = mel + jnp.dot(power, fb_ref[r],
                                            preferred_element_type=jnp.float32)
            if cfg.mag_scale == "log":
                scaled = jnp.log(mel + cfg.log_offset)
            elif cfg.mag_scale == "db":
                scaled = 10.0 * jnp.log10(mel + cfg.log_offset)
            elif cfg.mag_scale == "nonlinear":
                scaled = jnp.power(jnp.maximum(mel, 0.0), 1.0 / 1.3)
            else:
                scaled = mel
            out_ref[0, :, :] = scaled.astype(out_ref.dtype)

        pl.run_scoped(
            body,
            pltpu.VMEM((tile_rows, _LANE), jnp.int16),
            pltpu.SemaphoreType.DMA,
        )

    grid = (b, n_tiles)
    const_ops = [jnp.asarray(w) for w in (*w1s, *tws)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # pcm3 in HBM
            pl.BlockSpec((frame_rows, _LANE), lambda bi, ft: (0, 0),
                         memory_space=pltpu.VMEM),            # window
            *[pl.BlockSpec(w.shape, lambda bi, ft, _n=w.ndim: (0,) * _n,
                           memory_space=pltpu.VMEM)           # DFT consts
              for w in const_ops],
            pl.BlockSpec((_A, j2, cfg.n_mels), lambda bi, ft: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # fb2
        ],
        out_specs=pl.BlockSpec((1, tile_f, cfg.n_mels),
                               lambda bi, ft: (bi, ft, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_f, cfg.n_mels),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_f, _A, s_lanes), stage_dtype),    # S rows
            pltpu.VMEM((ga, _LANE), jnp.float32),              # xg
        ],
        interpret=interpret,
    )(pcm3, jnp.asarray(win2), *const_ops, jnp.asarray(fb2))
    return out[:, :n_frames, :]
