"""Fused MBConv kernels vs the XLA path (interpret mode).

The fused path must be a drop-in for layers.apply_mbconv on stride-1
inference blocks — same params, same semantics (SAME-padded depthwise,
SE on the post-dw mean, folded BN, identity residual)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdnet_go_tpu.models import layers as L
from birdnet_go_tpu.ops.pallas_mbconv import fused_block_ok, mbconv_fused

CASES = [
    # (cin, cout, kernel, expand, H, W)  — mirror of the B0 stage shapes
    (32, 16, 3, 1, 20, 12),     # stage-1-like (no expand, cin != cout)
    (24, 24, 3, 6, 17, 12),     # small-C residual block (odd H)
    (40, 40, 5, 6, 9, 6),       # 5×5 depthwise
    (80, 112, 5, 6, 6, 6),      # channel-change (no residual)
]


@pytest.mark.parametrize("cin,cout,k,expand,h,w", CASES)
def test_fused_matches_xla_mbconv(cin, cout, k, expand, h, w):
    key = jax.random.PRNGKey(hash((cin, cout, k, expand)) % 2**31)
    p = L.init_mbconv(key, cin, cout, k, expand)
    # non-trivial BN stats so folding is actually exercised
    for bn in ("expand_bn", "dw_bn", "project_bn"):
        if bn in p:
            c = p[bn]["mean"].shape[0]
            kb, kv = jax.random.split(jax.random.PRNGKey(c))
            p[bn]["mean"] = 0.1 * jax.random.normal(kb, (c,))
            p[bn]["var"] = 1.0 + 0.2 * jax.random.uniform(kv, (c,))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, h, w, cin),
                          jnp.float32)

    # exactness: all-f32 compute isolates structure (taps, masks, BN
    # folding, SE, residual) from MXU/bf16 rounding-order differences
    ref32 = np.asarray(L.apply_mbconv(p, x, stride=1,
                                      compute_dtype=jnp.float32),
                       np.float32)
    got32 = np.asarray(mbconv_fused(p, x, kernel=k,
                                    compute_dtype=jnp.float32,
                                    dot_dtype=jnp.float32,
                                    interpret=True), np.float32)
    assert got32.shape == ref32.shape
    rel = np.abs(ref32 - got32) / (np.abs(ref32) + 1e-3)
    assert rel.max() < 1e-3, rel.max()

    # production dtype: both paths round through bf16 with different
    # reduction orders — agreement within a few bf16 ulps
    ref = np.asarray(L.apply_mbconv(p, x.astype(jnp.bfloat16), stride=1),
                     np.float32)
    got = np.asarray(mbconv_fused(p, x.astype(jnp.bfloat16), kernel=k,
                                  interpret=True), np.float32)
    denom = np.abs(ref) + 0.25
    assert np.max(np.abs(ref - got) / denom) < 0.1, \
        np.max(np.abs(ref - got) / denom)


def test_gate():
    assert fused_block_ok(1, 18, 6, train=False)
    assert not fused_block_ok(2, 18, 6, train=False)      # stride-2
    assert not fused_block_ok(1, 9, 3, train=False)       # S < 64 tail
    assert not fused_block_ok(1, 18, 6, train=True)       # training
