"""Serving-side preprocessing (reference `backend/app/preprocess.py:30-441`).

File path: video decode + face-crop + normalize, audio decoded from the SAME
container in-process via the native libav loader (the reference shells out to
an ffmpeg subprocess and writes a temp WAV, `:354-383`).

Stream path: in-memory frame list + waveform with the reference's quirk
preserved: streaming TAIL-crops audio (keep the most recent 3 s, `:320-323`)
while file/training audio HEAD-crops.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

from multimodalemotionrecognition_tpu.config import AudioConfig, VideoConfig
from multimodalemotionrecognition_tpu.data.face import crop_with_padding, get_face_detector
from multimodalemotionrecognition_tpu.data.media import (
    load_audio_wav,
    load_video_frames,
    resample_waveform,
)
from multimodalemotionrecognition_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from multimodalemotionrecognition_tpu.ops.image import uniform_frame_indices

__all__ = ["EmotionPreprocessService"]


class EmotionPreprocessService:
    def __init__(
        self,
        audio: AudioConfig = AudioConfig(),
        video: VideoConfig = VideoConfig(),
    ):
        self.audio = audio
        self.video = video

    # ------------------------------------------------------------- video

    def load_video_frames(
        self, video_path: str | Path, use_face_crop: bool = True
    ) -> np.ndarray:
        """[T, 3, H, W] normalized frames from a container file."""
        return load_video_frames(
            video_path,
            num_frames=self.video.num_frames,
            size=self.video.size,
            augment=False,
            use_face_crop=use_face_crop,
        )

    def load_video_frames_from_memory(
        self, frames: Sequence[np.ndarray], use_face_crop: bool = True, frames_are_bgr: bool = True
    ) -> np.ndarray:
        """In-memory frames (browser JPEG decodes are BGR) -> [T, 3, H, W]
        (reference `load_video_frames_from_memory`, `:215-252`)."""
        import cv2

        size = self.video.size
        num_frames = self.video.num_frames
        if not frames:
            zeros = np.zeros((num_frames, size, size, 3), dtype=np.float32)
            return self._normalize(zeros)

        indices = uniform_frame_indices(len(frames), num_frames)
        selected = [frames[i] for i in indices]
        processed = []
        bbox = None
        for frame in selected:
            if frame.ndim != 3 or frame.shape[2] != 3:
                continue
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if frames_are_bgr else frame
            if use_face_crop:
                if bbox is None:
                    detector = get_face_detector()
                    if detector is not None:
                        bbox = detector.detect_face_bbox(rgb)
                if bbox is not None:
                    rgb = crop_with_padding(rgb, bbox, pad_ratio=self.video.face_pad_ratio)
            rgb = cv2.resize(rgb, (size, size), interpolation=cv2.INTER_LINEAR)
            processed.append(rgb)

        if not processed:
            processed = [np.zeros((size, size, 3), dtype=np.uint8)] * num_frames
        if len(processed) < num_frames:
            processed.extend([processed[-1]] * (num_frames - len(processed)))
        arr = np.stack(processed[:num_frames]).astype(np.float32) / 255.0
        return self._normalize(arr)

    @staticmethod
    def _normalize(frames_thw3: np.ndarray) -> np.ndarray:
        mean = np.asarray(IMAGENET_MEAN, dtype=np.float32)
        std = np.asarray(IMAGENET_STD, dtype=np.float32)
        out = (frames_thw3 - mean) / std
        return out.transpose(0, 3, 1, 2)

    # ------------------------------------------------------------- audio

    def prepare_audio_waveform(
        self, waveform: np.ndarray, sample_rate: int
    ) -> np.ndarray:
        """In-memory waveform -> [1, target_len]; TAIL-crop (streaming quirk,
        reference `:320-323`) and zero-pad short input."""
        wav = np.asarray(waveform, dtype=np.float32).reshape(-1)
        if wav.size == 0:
            wav = np.zeros(1, dtype=np.float32)
        if sample_rate != self.audio.sample_rate:
            wav = resample_waveform(wav, sample_rate, self.audio.sample_rate)
        target = self.audio.target_len
        if wav.size < target:
            wav = np.pad(wav, (0, target - wav.size))
        elif wav.size > target:
            wav = wav[-target:]
        return wav[None, :].astype(np.float32)

    def _mel(self, wav_1t: np.ndarray) -> np.ndarray:
        # Host path MUST stay numpy: eager jnp ops here would round-trip the
        # TPU tunnel per op (see ops/mel.log_mel_spectrogram_np docstring).
        from multimodalemotionrecognition_tpu.ops.mel import log_mel_spectrogram_np

        return log_mel_spectrogram_np(
            wav_1t,
            sample_rate=self.audio.sample_rate,
            n_fft=self.audio.n_fft,
            win_length=self.audio.win_length,
            hop_length=self.audio.hop_length,
            n_mels=self.audio.n_mels,
        )

    # ------------------------------------------------------------- entry points

    def preprocess_video_audio(
        self,
        video_path: str | Path,
        use_face_crop: bool = True,
        use_wavlm: bool = False,
        raw_uint8: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """File -> (video [1,T,3,H,W], audio [1,1,...]).  Audio comes straight
        from the container via libav (no ffmpeg subprocess / temp WAV).

        raw_uint8=True skips ImageNet normalization and returns uint8 frames —
        4x less host->device transfer; the jitted forward normalizes on-device
        (JaxModelRunner device_normalize)."""
        if raw_uint8:
            from multimodalemotionrecognition_tpu.data.media import (
                load_video_frames,
            )

            frames = load_video_frames(
                video_path,
                num_frames=self.video.num_frames,
                size=self.video.size,
                augment=False,
                use_face_crop=use_face_crop,
                normalize=False,
            )  # [T,3,H,W] float 0..1
            video = np.clip(frames * 255.0 + 0.5, 0, 255).astype(np.uint8)[None]
            wav = load_audio_wav(
                video_path,
                sample_rate=self.audio.sample_rate,
                duration_sec=self.audio.duration_sec,
                augment=False,
            )
            audio = wav if use_wavlm else self._mel(wav)
            return video, audio[None].astype(np.float32)
        video = self.load_video_frames(video_path, use_face_crop=use_face_crop)[None]
        wav = load_audio_wav(
            video_path,
            sample_rate=self.audio.sample_rate,
            duration_sec=self.audio.duration_sec,
            augment=False,
        )  # [1, target]
        audio = wav if use_wavlm else self._mel(wav)
        return video.astype(np.float32), audio[None].astype(np.float32)

    def preprocess_payload(
        self,
        filename: str,
        payload: bytes,
        use_face_crop: bool = True,
        use_wavlm: bool = False,
        raw_uint8: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, bool]:
        """Uploaded bytes -> (video [1,T,3,H,W], audio, blank_video).

        Audio-only .wav uploads take a zero-copy in-memory path: no temp
        file, no container probing — RIFF decode + resample + head-crop/pad,
        video all-zeros with blank_video=True so the batcher can skip
        shipping 300 KB of zero frames per clip over the wire.  Containers
        go through the temp-file + libav path."""
        from pathlib import Path as _Path

        suffix = _Path(filename).suffix.lower()
        if suffix == ".wav":
            from multimodalemotionrecognition_tpu.data.media import decode_wav_bytes

            wav, sr = decode_wav_bytes(payload)
            if sr != self.audio.sample_rate:
                wav = resample_waveform(wav, sr, self.audio.sample_rate)
            target = self.audio.target_len
            if wav.size < target:  # head-crop/zero-pad (training convention)
                wav = np.pad(wav, (0, target - wav.size))
            else:
                wav = wav[:target]
            wav = wav[None, :].astype(np.float32)
            audio = wav if use_wavlm else self._mel(wav)
            t, s = self.video.num_frames, self.video.size
            dtype = np.uint8 if raw_uint8 else np.float32
            video = np.zeros((1, t, 3, s, s), dtype=dtype)
            if not raw_uint8:
                # normalized zeros are (0 - mean) / std, not 0.0
                mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 1, 3, 1, 1)
                std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 1, 3, 1, 1)
                video = np.broadcast_to(-mean / std, video.shape).astype(np.float32)
            return video, audio[None].astype(np.float32), True

        import tempfile

        with tempfile.NamedTemporaryFile(suffix=suffix or ".mp4", delete=False) as tmp:
            tmp.write(payload)
            media_path = _Path(tmp.name)
        try:
            video, audio = self.preprocess_video_audio(
                media_path,
                use_face_crop=use_face_crop,
                use_wavlm=use_wavlm,
                raw_uint8=raw_uint8,
            )
            return video, audio, False
        finally:
            media_path.unlink(missing_ok=True)

    def preprocess_stream_window(
        self,
        frames: Sequence[np.ndarray],
        waveform: np.ndarray,
        waveform_sample_rate: int,
        use_face_crop: bool = True,
        use_wavlm: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        video = self.load_video_frames_from_memory(frames, use_face_crop=use_face_crop)[None]
        wav = self.prepare_audio_waveform(waveform, waveform_sample_rate)
        audio = wav if use_wavlm else self._mel(wav)
        return video.astype(np.float32), audio[None].astype(np.float32)
