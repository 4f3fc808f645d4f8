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
- stage 1 per frame: war[16,16] @ x[16,128]  → s[r, b]   (unrolled over
  the frame tile, accumulated into an [16·r, F, 128·b] scratch);
- stage 2 per residue r: s_r[F,128] @ tw_r[128, 128·jpad] (j padded to
  the lane width; padding columns are zero);
- mel per residue: p_r[F,128] @ fb_r[128, n_mels], accumulated — the
  (r, j) → bin permutation is absorbed into the per-r filterbank slabs.

Grid: (batch, frame_tiles). Inputs are padded so the last tile's DMA
stays in bounds; padded frames produce rows the caller slices off.
`interpret=True` runs anywhere (CPU tests).

Measured on TPU v5e (batch 256 × 3 s windows): 16.1 ms vs 24.2 ms for the
XLA melspec path (1.5×). In-kernel MXU matmuls run at hardware precision
(bf16-class for f32 inputs), giving ~7e-2 max-rel vs the HIGHEST-precision
XLA path on raw mel values; at the detection level this is ≲0.002
confidence delta and 98.75% top-10 overlap — inside float tolerance for
the bf16 CNN it feeds. Enabled automatically on TPU via
BirdNETv24.apply_int16.
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


@functools.lru_cache(maxsize=8)
def _kernel_consts(sample_rate: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float):
    war, wai, twr, twi, _, a_sz, b_sz, j_sz = _rdft_matmul_consts(n_fft, _A)
    assert a_sz == _A and b_sz == _LANE
    j_pad = _LANE
    # tw3: [A, B, j_pad] zero-padded beyond j_sz
    tw3r = np.zeros((a_sz, b_sz, j_pad), np.float32)
    tw3i = np.zeros((a_sz, b_sz, j_pad), np.float32)
    tw3r[:, :, :j_sz] = twr
    tw3i[:, :, :j_sz] = twi
    # fb3: [A, j_pad, n_mels] from the permuted filterbank (r-major, J=j_sz)
    fbp = _mel_filterbank_permuted_np(sample_rate, n_fft, n_mels, fmin,
                                      fmax, _A)            # [A*j_sz, m]
    fb3 = np.zeros((a_sz, j_pad, n_mels), np.float32)
    fb3[:, :j_sz, :] = fbp.reshape(a_sz, j_sz, n_mels)
    return war, wai, tw3r, tw3i, fb3, j_sz


def melspec_fused(pcm_i16: jnp.ndarray, cfg: MelConfig,
                  tile_f: int | None = None,
                  interpret: bool = False,
                  out_dtype=jnp.float32) -> jnp.ndarray:
    """int16 PCM [B, T] → mel [B, F, n_mels] (cfg.mag_scale applied).

    `out_dtype=bfloat16` writes the CNN's input dtype directly — halves
    the mel→backbone HBM round trip (the consumer casts to bf16 anyway)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if cfg.power != 2.0:
        raise ValueError("fused kernel supports power spectrogram only")
    if cfg.hop % _LANE or cfg.n_fft % _LANE or cfg.n_fft // _A != _LANE:
        raise ValueError(
            f"fused kernel needs hop%128==0 and n_fft==2048 "
            f"(got hop={cfg.hop}, n_fft={cfg.n_fft})")

    b, t = pcm_i16.shape
    n_frames = cfg.num_frames(t)
    if tile_f is None:
        # One tile per window when it fits: the stage-2 dots become
        # [n_frames, 128] @ [128, ·] — tall MXU shapes instead of M=32
        # slivers. Measured on v5e (3 s/48 kHz window, batch 1024):
        # 29.7 ms vs 45.7 ms for tile_f=32 (1.54×). Cap by the f32
        # scratch budget (2 × tile_f × A × LANE × 4 B ≤ ~8 MB VMEM).
        tile_f = min(n_frames, 512)
    hop_rows = cfg.hop // _LANE
    frame_rows = cfg.n_fft // _LANE                   # = 16
    # stage 1 reads frame GROUPS of g frames so every dynamic sublane
    # slice start (i·g·hop_rows) is a multiple of 8 (Mosaic tiling rule):
    # g = 8 / gcd(hop_rows, 8)
    g = 8 // math.gcd(hop_rows, 8)
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

    war, wai, tw3r, tw3i, fb3, j_sz = _kernel_consts(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    win2 = _window_fn(cfg).reshape(frame_rows, _LANE)

    def kernel(pcm_ref, win_ref, war_ref, wai_ref, twr_ref, twi_ref,
               fb_ref, out_ref, sr_ref, si_ref):
        bi = pl.program_id(0)
        ft = pl.program_id(1)

        def body(tile_ref, dma_sem):
            start_row = ft * (tile_f * hop_rows)
            dma = pltpu.make_async_copy(
                pcm_ref.at[bi, pl.ds(start_row, tile_rows), :],
                tile_ref, dma_sem)
            dma.start()
            dma.wait()

            # stage 1, frame GROUPS: group i reads an 8-row-aligned block;
            # its g frames are static sub-slices of the loaded value.
            # Scratch is frame-major [tile_f, A, LANE] — dim 0 of a rank-3
            # ref is untiled, so per-frame dynamic writes are legal.
            def s1(i, _):
                block = (tile_ref[pl.ds(i * g * hop_rows, block_rows), :]
                         .astype(jnp.float32) * _INT16_SCALE)
                for j in range(g):
                    x = (block[j * hop_rows:j * hop_rows + frame_rows, :]
                         * win_ref[:])
                    sr_ref[pl.ds(i * g + j, 1), :, :] = jnp.dot(
                        war_ref[:], x,
                        preferred_element_type=jnp.float32)[None]
                    si_ref[pl.ds(i * g + j, 1), :, :] = jnp.dot(
                        wai_ref[:], x,
                        preferred_element_type=jnp.float32)[None]
                return 0

            jax.lax.fori_loop(0, tile_f // g, s1, 0)

            # stage 2 + mel, statically unrolled over residues r (static
            # middle-dim indices avoid dynamic sublane slicing)
            sr_all = sr_ref[:]            # [tile_f, A, LANE]
            si_all = si_ref[:]
            mel = jnp.zeros((tile_f, cfg.n_mels), jnp.float32)
            for r in range(_A):
                sr_r = sr_all[:, r, :]
                si_r = si_all[:, r, :]
                re = (jnp.dot(sr_r, twr_ref[r],
                              preferred_element_type=jnp.float32)
                      - jnp.dot(si_r, twi_ref[r],
                                preferred_element_type=jnp.float32))
                im = (jnp.dot(sr_r, twi_ref[r],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(si_r, twr_ref[r],
                                preferred_element_type=jnp.float32))
                power = re * re + im * im
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
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # pcm3 in HBM
            pl.BlockSpec((frame_rows, _LANE), lambda bi, ft: (0, 0),
                         memory_space=pltpu.VMEM),            # window
            pl.BlockSpec((_A, _A), lambda bi, ft: (0, 0),
                         memory_space=pltpu.VMEM),            # war
            pl.BlockSpec((_A, _A), lambda bi, ft: (0, 0),
                         memory_space=pltpu.VMEM),            # wai
            pl.BlockSpec((_A, _LANE, _LANE), lambda bi, ft: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # twr
            pl.BlockSpec((_A, _LANE, _LANE), lambda bi, ft: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # twi
            pl.BlockSpec((_A, _LANE, cfg.n_mels), lambda bi, ft: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # fb3
        ],
        out_specs=pl.BlockSpec((1, tile_f, cfg.n_mels),
                               lambda bi, ft: (bi, ft, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_f, cfg.n_mels),
                                       out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_f, _A, _LANE), jnp.float32),     # sr (f-major)
            pltpu.VMEM((tile_f, _A, _LANE), jnp.float32),     # si
        ],
        interpret=interpret,
    )(pcm3, jnp.asarray(win2), jnp.asarray(war), jnp.asarray(wai),
      jnp.asarray(tw3r), jnp.asarray(tw3i), jnp.asarray(fb3))
    return out[:, :n_frames, :]
