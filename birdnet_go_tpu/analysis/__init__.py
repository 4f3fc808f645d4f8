"""Analysis pipeline: offline file analysis, detection types, Raven output.

Realtime detection processing (consensus, Deep Detection, dynamic
thresholds, actions) lives in birdnet_go_tpu.analysis.processor.
"""

from birdnet_go_tpu.analysis.results import Detection, WindowResult

__all__ = ["Detection", "WindowResult"]
