"""WebSocket streaming sessions (reference `backend/app/streaming.py`).

Pure host logic ported with identical semantics: sliding 3 s window over
frame/audio ring buffers (6 s cap), inference cadence of 0.5 s gated on
>=3 s audio AND >=2 frames, base64 JPEG frame and PCM16 audio decoding, and
the same result annotations (session_id, window_seconds, buffered counts).
"""

from __future__ import annotations

import base64
import time
import uuid
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Deque, Dict, List, Optional, Tuple

import numpy as np

from multimodalemotionrecognition_tpu.config import ServeConfig

__all__ = [
    "decode_frame_b64",
    "decode_pcm16_b64",
    "StreamingEmotionSession",
    "StreamingSessionManager",
]

_DEFAULTS = ServeConfig()


def decode_frame_b64(image_b64: str) -> np.ndarray:
    """Base64 JPEG/PNG -> BGR image (reference `:19-27`)."""
    import cv2

    encoded = image_b64.split(",", 1)[-1]
    raw = base64.b64decode(encoded)
    arr = np.frombuffer(raw, dtype=np.uint8)
    frame = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if frame is None:
        raise ValueError("Failed to decode frame payload.")
    return frame


def decode_pcm16_b64(pcm_b64: str) -> np.ndarray:
    """Base64 int16 PCM -> float32 in [-1, 1] (reference `:30-36`)."""
    raw = base64.b64decode(pcm_b64)
    pcm = np.frombuffer(raw, dtype=np.int16).astype(np.float32)
    if pcm.size == 0:
        return np.zeros(0, dtype=np.float32)
    return pcm / 32768.0


@dataclass
class StreamingEmotionSession:
    predictor: Any
    window_seconds: float = _DEFAULTS.stream_window_sec
    step_seconds: float = _DEFAULTS.stream_step_sec
    max_buffer_seconds: float = _DEFAULTS.stream_max_buffer_sec
    session_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    use_face_crop: bool = True
    waveform_sample_rate: int = 16000
    frames: Deque[Tuple[float, np.ndarray]] = field(default_factory=deque)
    audio_chunks: Deque[np.ndarray] = field(default_factory=deque)
    audio_sample_count: int = 0
    last_prediction_ts: float = 0.0

    def add_frame(self, frame: np.ndarray, timestamp: Optional[float] = None) -> None:
        now = float(timestamp if timestamp is not None else time.monotonic())
        self.frames.append((now, frame))
        self._prune_frames(now)

    def add_audio_chunk(
        self, chunk: np.ndarray, sample_rate: int, timestamp: Optional[float] = None
    ) -> None:
        del timestamp
        self.waveform_sample_rate = int(sample_rate)
        self.audio_chunks.append(np.asarray(chunk, dtype=np.float32).reshape(-1))
        self.audio_sample_count += int(chunk.size)
        self._prune_audio()

    def _prune_frames(self, now: float) -> None:
        cutoff = now - float(self.max_buffer_seconds)
        while self.frames and self.frames[0][0] < cutoff:
            self.frames.popleft()

    def _prune_audio(self) -> None:
        max_samples = max(1, int(self.waveform_sample_rate * self.max_buffer_seconds))
        while self.audio_sample_count > max_samples and self.audio_chunks:
            dropped = self.audio_chunks.popleft()
            self.audio_sample_count -= int(dropped.size)

    def ready_for_inference(self, now: Optional[float] = None) -> bool:
        now = float(now if now is not None else time.monotonic())
        enough_audio = self.audio_sample_count >= int(
            self.waveform_sample_rate * self.window_seconds
        )
        enough_frames = len(self.frames) >= 2
        cadence_ok = (now - self.last_prediction_ts) >= self.step_seconds
        return enough_audio and enough_frames and cadence_ok

    def build_window(
        self, now: Optional[float] = None
    ) -> Tuple[List[np.ndarray], np.ndarray]:
        now = float(now if now is not None else time.monotonic())
        frame_cutoff = now - float(self.window_seconds)
        window_frames = [frame for ts, frame in self.frames if ts >= frame_cutoff]
        if not window_frames:
            window_frames = [frame for _, frame in self.frames]
        waveform = (
            np.concatenate(list(self.audio_chunks), axis=0)
            if self.audio_chunks
            else np.zeros(0, dtype=np.float32)
        )
        target_samples = max(1, int(self.waveform_sample_rate * self.window_seconds))
        if waveform.size > target_samples:
            waveform = waveform[-target_samples:]
        return window_frames, waveform

    def infer(self, now: Optional[float] = None) -> Dict[str, Any]:
        now = float(now if now is not None else time.monotonic())
        frames, waveform = self.build_window(now)
        result = self.predictor.predict_stream(
            frames,
            waveform,
            waveform_sample_rate=self.waveform_sample_rate,
            use_face_crop=self.use_face_crop,
        )
        self.last_prediction_ts = now
        result["session_id"] = self.session_id
        result["window_seconds"] = self.window_seconds
        result["num_buffered_frames"] = len(frames)
        result["num_audio_samples"] = int(waveform.size)
        return result


class StreamingSessionManager:
    def __init__(self, predictor: Any) -> None:
        self.predictor = predictor
        self.sessions: Dict[str, StreamingEmotionSession] = {}

    def create_session(self, use_face_crop: bool = True) -> StreamingEmotionSession:
        session = StreamingEmotionSession(
            predictor=self.predictor, use_face_crop=use_face_crop
        )
        self.sessions[session.session_id] = session
        return session

    def close_session(self, session_id: str) -> None:
        self.sessions.pop(session_id, None)
