"""Cross-cutting utilities: suncalc, metrics, events, health."""
