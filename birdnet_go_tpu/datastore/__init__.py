"""Persistence layer (reference: internal/datastore — GORM over
SQLite/MySQL, 62-method interface, v2 normalized schema).

SQLite-first here (WAL mode, thread-safe), with the core surface the API
and processor consume: detection CRUD + search, reviews/locks, model
contributions (cross-model consensus records), dynamic-threshold
persistence, and the analytics aggregations behind the dashboard.
"""

from birdnet_go_tpu.datastore.sqlite import Datastore

__all__ = ["Datastore"]
