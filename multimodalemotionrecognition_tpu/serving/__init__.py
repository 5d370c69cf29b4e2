"""Serving stack: preprocessing, predictor, dynamic batcher, streaming
sessions, and HTTP/WebSocket apps (direct + queued API contracts)."""

from multimodalemotionrecognition_tpu.serving.predictor import EmotionPredictor
from multimodalemotionrecognition_tpu.serving.preprocess import EmotionPreprocessService
from multimodalemotionrecognition_tpu.serving.streaming import (
    StreamingEmotionSession,
    StreamingSessionManager,
    decode_frame_b64,
    decode_pcm16_b64,
)

__all__ = [
    "EmotionPredictor",
    "EmotionPreprocessService",
    "StreamingEmotionSession",
    "StreamingSessionManager",
    "decode_frame_b64",
    "decode_pcm16_b64",
]
