"""Headline benchmark: realtime 48 kHz stream capacity per chip.

Runs the exact production per-window device step (the scheduler's
ModelBatcher graph: int16 PCM → f32 → mel front end → BirdNET v2.4 CNN →
sigmoid → top-K on device) at the production megabatch size and converts
steady-state window throughput into concurrent-realtime-stream capacity:
each realtime 48 kHz stream produces one 3 s window per 1.5 s (50%
overlap — reference internal/classifier/model.go:40-54), so

    streams_per_chip = windows_per_second × 1.5

The measurement loop runs on device (lax.scan with a cross-iteration data
dependency) — the axon platform's block_until_ready does not actually
block, and per-dispatch tunnel round-trips (~30 ms) would otherwise
dominate; the pipelined scheduler amortizes dispatch the same way.

Baseline: the reference sustains ~5 concurrent streams on a desktop AMD64
CPU (~100 ms/window, ARCHITECTURE.md:1687; BASELINE.md). vs_baseline is
ours / 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STREAMS = 5.0          # reference desktop AMD64 (ARCHITECTURE.md:1687)
WINDOW_HOP_SECONDS = 1.5        # 3 s window, 50% overlap
BATCH = 1024                    # production megabatch (scheduler max_batch)
MEASURE_ITERS = 8


def main() -> None:
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.ops.postprocess import sigmoid_confidence, top_k_results

    model = BirdNETv24()
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))

    def one_step(params, pcm_i16, bias):
        # bias (int16 scalar from the previous iteration's output) creates
        # the cross-iteration dependency; the step is the production
        # apply_int16 path (fused Pallas front end on TPU)
        out = model.apply_int16(params, pcm_i16 + bias)
        conf = sigmoid_confidence(out["logits"], 1.0)
        return top_k_results(conf, 10)

    @jax.jit
    def run(params, pcm_i16):
        def body(carry, _):
            vals, idx = one_step(params, pcm_i16, carry)
            # value is always 0 at runtime but not symbolically foldable,
            # so the data dependency between iterations survives
            return (jnp.sum(vals) * 1e-9).astype(jnp.int16), None

        last, _ = jax.lax.scan(body, jnp.int16(0), None,
                               length=MEASURE_ITERS)
        return last

    rng = np.random.default_rng(0)
    pcm_host = (rng.standard_normal((BATCH, model.spec.clip_samples))
                * 0.05 * 32767).astype(np.int16)
    pcm = jax.device_put(jnp.asarray(pcm_host))

    float(run(params, pcm))                 # compile + warmup (blocking)
    t0 = time.perf_counter()
    float(run(params, pcm))                 # blocking scalar fetch
    elapsed = time.perf_counter() - t0

    windows_per_sec = BATCH * MEASURE_ITERS / elapsed
    streams = windows_per_sec * WINDOW_HOP_SECONDS
    print(json.dumps({
        "metric": "realtime_48khz_streams_per_chip",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / BASELINE_STREAMS, 2),
    }))


if __name__ == "__main__":
    main()
