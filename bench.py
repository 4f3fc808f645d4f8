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

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STREAMS = 5.0          # reference desktop AMD64 (ARCHITECTURE.md:1687)
WINDOW_HOP_SECONDS = 1.5        # 3 s window, 50% overlap
BATCH = 1024                    # throughput megabatch
MEASURE_ITERS = 8
PROD_BATCH = 256                # scheduler default max_batch (latency probe)
LATENCY_TRIALS = 12             # scan-length-differencing samples
LATENCY_BATCHES = 6             # tunneled end-to-end diagnostic samples


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

    # Per-window latency at the PRODUCTION batch size (scheduler default
    # max_batch=256): every window in a megabatch completes when the batch
    # materializes, so the batch step time IS the per-window serving
    # latency (north star: p50 <50 ms).
    #
    # This environment reaches the TPU through a remote tunnel (~30 ms
    # fixed RTT, ~85 MB/s H2D — measured), which a production host with a
    # locally-attached chip does not pay (PCIe H2D for the 74 MB int16
    # megabatch is ~5 ms). To report the hardware's latency rather than
    # the tunnel's, the probe times jitted scans of length 1 and length
    # 1+K over the SAME production step with a cross-iteration data
    # dependency: (t_long − t_short)/K isolates one on-device batch step,
    # cancelling every fixed tunnel cost. The raw tunneled end-to-end
    # p50 (ModelBatcher dispatch→harvest) is reported alongside as a
    # transport diagnostic.
    @functools.partial(jax.jit, static_argnums=(2,))
    def run_prod(params, pcm_i16, n):
        def body(carry, _):
            vals, idx = one_step(params, pcm_i16, carry)
            return (jnp.sum(vals) * 1e-9).astype(jnp.int16), None

        last, _ = jax.lax.scan(body, jnp.int16(0), None, length=n)
        return last

    pcm_prod = jax.device_put(jnp.asarray(pcm_host[:PROD_BATCH]))
    k_iters = 8
    float(run_prod(params, pcm_prod, 1))          # compile short
    float(run_prod(params, pcm_prod, 1 + k_iters))  # compile long
    slopes_ms = []
    for _ in range(LATENCY_TRIALS):
        t0 = time.perf_counter()
        float(run_prod(params, pcm_prod, 1))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_prod(params, pcm_prod, 1 + k_iters))
        t_long = time.perf_counter() - t0
        slopes_ms.append(max(0.0, (t_long - t_short) / k_iters * 1000.0))
    slopes_ms.sort()
    p50 = slopes_ms[len(slopes_ms) // 2]
    p95 = slopes_ms[min(len(slopes_ms) - 1, int(len(slopes_ms) * 0.95))]

    # transport diagnostic: tunneled end-to-end through the ModelBatcher
    from birdnet_go_tpu.inference.backend import JaxClassifier
    from birdnet_go_tpu.scheduler.loop import ModelBatcher

    clf = JaxClassifier(model, params)
    batcher = ModelBatcher(clf, max_batch=PROD_BATCH)
    batcher.warmup()
    e2e_ms = []
    for _ in range(LATENCY_BATCHES):
        for j in range(PROD_BATCH):
            batcher.offer(pcm_host[j], "bench", 0.0)
        batcher.dispatch()
        batcher.harvest()
        e2e_ms.append(batcher.stats.last_latency_ms)
    e2e_ms.sort()

    print(json.dumps({
        "metric": "realtime_48khz_streams_per_chip",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / BASELINE_STREAMS, 2),
        "p50_window_latency_ms": round(p50, 1),
        "p95_window_latency_ms": round(p95, 1),
        "latency_batch_size": PROD_BATCH,
        "p50_tunneled_e2e_ms": round(e2e_ms[len(e2e_ms) // 2], 1),
        "latency_note": "p50/p95 = on-device batch step (tunnel RTT/H2D "
                        "excluded via scan-length differencing); tunneled "
                        "e2e includes the dev tunnel's ~85 MB/s H2D",
    }))


if __name__ == "__main__":
    main()
