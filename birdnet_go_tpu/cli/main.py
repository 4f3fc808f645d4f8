"""CLI entry point: analyze / serve / benchmark / rangefilter.

Global flags mirror the reference's persistent flags (cmd/root.go:86-106):
threshold, sensitivity, overlap, locale, latitude/longitude.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="birdnet-tpu",
        description="TPU-native bioacoustic analysis (BirdNET-class models)")
    p.add_argument("--debug", action="store_true")
    sub = p.add_subparsers(dest="command", required=True)

    def common_model_flags(sp):
        sp.add_argument("--model", default="BirdNET_V2.4",
                        help="model family id (default BirdNET_V2.4)")
        sp.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint with converted weights")
        sp.add_argument("--sensitivity", type=float, default=1.0,
                        help="sigmoid sensitivity 0.0-1.5 (default 1.0)")
        sp.add_argument("--threshold", type=float, default=0.8,
                        help="confidence threshold (default 0.8)")
        sp.add_argument("--overlap", type=float, default=0.0,
                        help="window overlap seconds on 3 s base (0-2.9)")
        sp.add_argument("--locale", default="en_us")
        sp.add_argument("--data-dir", default=None,
                        help="taxonomy/label data directory")
        sp.add_argument("--latitude", type=float, default=None)
        sp.add_argument("--longitude", type=float, default=None)

    a = sub.add_parser("analyze", help="offline analysis of WAV file(s)")
    a.add_argument("input", help="WAV file or directory")
    a.add_argument("--output", default="output",
                   help="output directory for Raven tables (default output/)")
    a.add_argument("--batch-size", type=int, default=64)
    a.add_argument("--all-results", action="store_true",
                   help="emit every top-K result above threshold per window")
    common_model_flags(a)

    b = sub.add_parser("benchmark", help="device inference throughput")
    b.add_argument("--batch-size", type=int, default=256)
    b.add_argument("--iters", type=int, default=10)
    common_model_flags(b)

    r = sub.add_parser("rangefilter", help="print included species for a location")
    r.add_argument("--week", type=int, default=-1,
                   help="BirdNET week 1-48, -1 = today")
    r.add_argument("--rf-threshold", type=float, default=0.01)
    r.add_argument("--csv", action="store_true")
    common_model_flags(r)

    s = sub.add_parser("serve", help="realtime analysis server")
    s.add_argument("--config", default=None, help="YAML config file")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8080)
    common_model_flags(s)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    if args.command == "analyze":
        return _cmd_analyze(args)
    if args.command == "benchmark":
        return _cmd_benchmark(args)
    if args.command == "rangefilter":
        return _cmd_rangefilter(args)
    if args.command == "serve":
        return _cmd_serve(args)
    return 2


def _load_classifier(args, range_mask=None):
    from birdnet_go_tpu.inference.backend import JaxClassifier
    from birdnet_go_tpu.inference.loader import load_model

    model, params = load_model(args.model, checkpoint=args.checkpoint)
    return JaxClassifier(model, params, range_mask=range_mask)


def _range_mask_if_located(args, num_species):
    """Build the included-species mask when a location is configured
    (reference: BuildRangeFilter at startup, range_filter.go:100)."""
    if args.latitude is None or args.longitude is None:
        return None
    import datetime

    import numpy as np

    from birdnet_go_tpu.inference.backend import JaxRangeFilter
    from birdnet_go_tpu.inference.loader import load_geomodel
    from birdnet_go_tpu.models.geomodel import birdnet_week

    g, gparams = load_geomodel(num_species=num_species)
    rf = JaxRangeFilter(g, gparams)
    week = birdnet_week(datetime.date.today())
    scores = rf.predict(args.latitude, args.longitude, week)
    thr = getattr(args, "rf_threshold", 0.01)
    return (scores >= thr).astype(np.float32)


def _cmd_analyze(args) -> int:
    from birdnet_go_tpu.analysis.offline import OfflineAnalyzer, OfflineConfig
    from birdnet_go_tpu.analysis.raven import write_raven_table
    from birdnet_go_tpu.taxonomy.labels import load_labels

    clf = _load_classifier(args)
    mask = _range_mask_if_located(args, clf.num_species)
    if mask is not None:
        clf.set_range_mask(mask)
    labels = load_labels(args.data_dir, locale=args.locale,
                         model_id=args.model,
                         expected_count=clf.num_species)
    if len(labels) != clf.num_species:
        print(f"warning: label count {len(labels)} != model outputs "
              f"{clf.num_species}", file=sys.stderr)
    analyzer = OfflineAnalyzer(clf, labels, OfflineConfig(
        threshold=args.threshold, sensitivity=args.sensitivity,
        overlap=args.overlap, batch_size=args.batch_size,
        all_results=args.all_results))

    inp = Path(args.input)
    files = sorted(inp.glob("*.wav")) if inp.is_dir() else [inp]
    if not files:
        print(f"no WAV files under {inp}", file=sys.stderr)
        return 1
    failures = 0
    for f in files:
        try:
            report = analyzer.analyze_file(f)
        except (ValueError, OSError) as e:
            print(f"{f}: {e}", file=sys.stderr)
            failures += 1
            continue
        out = write_raven_table(report.detections, f, args.output)
        print(f"{f.name}: {report.duration_seconds:.0f}s audio, "
              f"{len(report.windows)} windows, "
              f"{len(report.detections)} detections in "
              f"{report.elapsed_seconds:.2f}s "
              f"({report.realtime_factor:.0f}x realtime)")
        print(f"Output written to {out}")
    return 1 if failures else 0


def _cmd_benchmark(args) -> int:
    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    clf = _load_classifier(args)
    clip = clf.model.spec.clip_samples
    rng = np.random.default_rng(0)
    pcm = rng.standard_normal((args.batch_size, clip)).astype(np.float32) * .05
    clf.predict_topk(pcm)                      # compile + warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        vals, _ = clf.predict_topk(pcm)
    elapsed = time.perf_counter() - t0
    wps = args.batch_size * args.iters / elapsed
    hop = clf.model.spec.buffer_interval_seconds
    print(json.dumps({
        "model": args.model,
        "batch": args.batch_size,
        "windows_per_second": round(wps, 1),
        "window_latency_ms": round(1000 * elapsed / args.iters, 1),
        "realtime_streams": round(wps * hop, 1),
    }))
    return 0


def _cmd_rangefilter(args) -> int:
    import datetime

    from birdnet_go_tpu.inference.backend import JaxRangeFilter
    from birdnet_go_tpu.inference.loader import load_geomodel
    from birdnet_go_tpu.models.geomodel import birdnet_week
    from birdnet_go_tpu.taxonomy.labels import load_labels

    if args.latitude is None or args.longitude is None:
        print("rangefilter requires --latitude and --longitude",
              file=sys.stderr)
        return 1
    labels = load_labels(args.data_dir, locale=args.locale)
    g, gparams = load_geomodel(num_species=len(labels))
    rf = JaxRangeFilter(g, gparams)
    week = args.week if args.week > 0 else birdnet_week(datetime.date.today())
    scores = rf.predict(args.latitude, args.longitude, week)
    rows = [(labels[i], float(s)) for i, s in enumerate(scores)
            if s >= args.rf_threshold]
    rows.sort(key=lambda r: -r[1])
    if args.csv:
        print("scientific_name,common_name,score")
        for sp, s in rows:
            print(f"{sp.scientific},{sp.common},{s:.4f}")
    else:
        print(f"{len(rows)} species probable at "
              f"({args.latitude}, {args.longitude}) week {week}:")
        for sp, s in rows[:50]:
            print(f"  {s:.3f}  {sp.common} ({sp.scientific})")
        if len(rows) > 50:
            print(f"  ... and {len(rows) - 50} more (use --csv for all)")
    return 0


def _cmd_serve(args) -> int:
    import signal
    import threading

    from birdnet_go_tpu.app import Application
    from birdnet_go_tpu.config.settings import ModelSettings, load_settings

    settings = load_settings(args.config)
    if args.config is None:
        settings.models = [ModelSettings(
            model_id=args.model, checkpoint=args.checkpoint,
            sensitivity=args.sensitivity, threshold=args.threshold,
            overlap=args.overlap, locale=args.locale)]
    if args.latitude is not None:
        settings.location.latitude = args.latitude
        settings.location.longitude = args.longitude
    if args.data_dir:
        settings.data_dir = args.data_dir
    settings.webserver.host = args.host
    settings.webserver.port = args.port

    app = Application(settings)
    app.setup()
    app.start()
    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *a: stop.set())
    signal.signal(signal.SIGTERM, lambda *a: stop.set())
    print(f"serving on http://{args.host}:{args.port} — Ctrl-C to stop")
    try:
        stop.wait()
    finally:
        app.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
