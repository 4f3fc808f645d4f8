"""HTTP API (reference: internal/api/v2 — Echo REST + SSE under /api/v2).

aiohttp implementation running on its own thread/event loop so the
threaded realtime pipeline (device loop, processor, job queue) stays
framework-agnostic; cross-thread events reach SSE clients via
call_soon_threadsafe.
"""

from birdnet_go_tpu.api.server import ApiServer

__all__ = ["ApiServer"]
