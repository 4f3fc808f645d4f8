"""Host audio pipeline (the reference's internal/audiocore, rebuilt).

Capture/decode, ring buffers with the reference's exact overlapped-window
semantics, frame routing with bounded queues + drop accounting, and source
management. Everything here is host-side numpy; device work happens in
birdnet_go_tpu.ops / .scheduler.
"""

from birdnet_go_tpu.audio.wav import read_wav, write_wav, WavInfo
from birdnet_go_tpu.audio.buffers import AnalysisBuffer, CaptureBuffer
from birdnet_go_tpu.audio.source import AudioSource, SourceType

__all__ = [
    "read_wav",
    "write_wav",
    "WavInfo",
    "AnalysisBuffer",
    "CaptureBuffer",
    "AudioSource",
    "SourceType",
]
