"""Native (C++) host-side components.

The reference leans on native third-party binaries for host work (ffmpeg
subprocess, OpenCV, MediaPipe — SURVEY.md §2 language note).  This package
holds our first-party C++ equivalents, exposed over ctypes:

  * medialoader — libavformat/libavcodec/swscale/swresample demux + decode of
    video frames (RGB24) and audio (f32 mono @ target rate) from mp4/webm/wav.

Build: `python -m multimodalemotionrecognition_tpu.native.build`
"""

from multimodalemotionrecognition_tpu.native import medialoader

__all__ = ["medialoader"]
