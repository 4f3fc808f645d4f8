"""Taxonomy & labels: species label files, eBird code map, locale handling.

Reference: internal/classifier/taxonomy.go, label_files.go, names.go and
the data files under internal/classifier/data/ (42 locale label files of
6,522 "Scientific_Common" lines + eBird taxonomy code JSON).

Label/taxonomy *data* is not vendored into this repo; it is loaded at
runtime from a data directory (config/env-resolved), with a deterministic
synthetic fallback so every layer stays testable without the data files —
the same philosophy as the reference's `noembed` test builds (TESTING.md).
"""

from birdnet_go_tpu.taxonomy.labels import (
    Species,
    LabelSet,
    load_labels,
    load_ebird_codes,
    resolve_data_dir,
    synthetic_labels,
)

__all__ = [
    "Species",
    "LabelSet",
    "load_labels",
    "load_ebird_codes",
    "resolve_data_dir",
    "synthetic_labels",
]
