"""Headline benchmark: realtime 48 kHz stream capacity per chip.

Runs the full per-window device step of the flagship model (BirdNET v2.4:
mel front end + CNN + sigmoid + top-K) at a production batch size and
converts steady-state window throughput into concurrent-realtime-stream
capacity: each realtime 48 kHz stream produces one 3 s window per 1.5 s
(50% overlap — reference internal/classifier/model.go:40-54), so

    streams_per_chip = windows_per_second × 1.5

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
BATCH = 256
WARMUP_ITERS = 3
MEASURE_ITERS = 10


def main() -> None:
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.ops.postprocess import sigmoid_confidence, top_k_results

    model = BirdNETv24()
    params = model.init(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    def one_step(params, pcm):
        out = model.apply(params, pcm)
        conf = sigmoid_confidence(out["logits"], 1.0)
        return top_k_results(conf, 10)

    # The whole measurement runs as one on-device scan: each iteration's
    # input is perturbed by the previous output (a true data dependency, so
    # steps serialize on device and nothing can be cached or overlapped with
    # host timing), and only the final [B, K] results cross back to the host.
    # This measures pure device throughput, amortizing the host→device
    # round-trip the way the real pipelined scheduler does.
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def run(params, pcm, n_iters):
        def body(carry, _):
            pcm_i, feedback = carry
            vals, idx = one_step(params, pcm_i + feedback * 1e-9)
            return (pcm_i, jnp.sum(vals)), None

        (_, last), _ = jax.lax.scan(body, (pcm, jnp.float32(0.0)),
                                    None, length=n_iters)
        return last

    rng = np.random.default_rng(0)
    pcm_host = rng.standard_normal(
        (BATCH, model.spec.clip_samples)).astype(np.float32) * 0.05
    pcm = jax.device_put(jnp.asarray(pcm_host))

    float(run(params, pcm, MEASURE_ITERS))  # compile + warmup (blocking)

    t0 = time.perf_counter()
    float(run(params, pcm, MEASURE_ITERS))  # blocking scalar fetch
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
