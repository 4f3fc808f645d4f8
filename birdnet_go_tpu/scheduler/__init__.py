"""The batched device loop.

Replaces the reference's goroutine-per-(source,model) polling monitors
(internal/analysis/buffer_manager.go:390 analysisBufferMonitor) with ONE
loop per model that packs every ready window across all streams into a
fixed-shape device megabatch each tick — this is where the
2,000-streams/chip target is won (SURVEY.md §7 step 4).
"""

from birdnet_go_tpu.scheduler.loop import ModelBatcher, DeviceLoop
from birdnet_go_tpu.scheduler.results_queue import ResultsQueue

__all__ = ["ModelBatcher", "DeviceLoop", "ResultsQueue"]
