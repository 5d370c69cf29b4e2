"""Direct-backend predictor (reference `backend/app/infer.py:13-118`).

Contract preserved exactly, including the quirks:
  * probabilities are returned x100 (percent) — DIFFERENT from the queued
    worker's 0..1 scale (part of the byte-compatible API);
  * softmax is applied to the model output regardless of fusion mode — for
    late fusion that means a double softmax, as the reference direct backend
    does (`backend/app/infer.py:98-99` on top of `src/models/fusion.py:358-363`);
  * any per-request failure returns a uniform distribution plus an "error"
    field (`:54-61`);
  * EMO_MOCK / failed init falls back to Dirichlet-random mock predictions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from multimodalemotionrecognition_tpu.config import ServeConfig, labels_for
from multimodalemotionrecognition_tpu.serving.preprocess import EmotionPreprocessService

__all__ = ["EmotionPredictor"]


class EmotionPredictor:
    def __init__(
        self,
        mock_mode: bool = False,
        checkpoint_path: Optional[str] = None,
        num_classes: int = 8,
        config: Optional[ServeConfig] = None,
    ):
        cfg = config or ServeConfig.from_env()
        self.mock_mode = mock_mode or cfg.mock
        self.emotion_labels: List[str] = list(labels_for(num_classes))
        self.use_wavlm = False
        self.preprocess = EmotionPreprocessService()
        self.runner = None
        if not self.mock_mode:
            try:
                from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

                self.runner = JaxModelRunner(
                    checkpoint_path or cfg.checkpoint_path,
                    num_classes=num_classes,
                    batch_buckets=cfg.batch_buckets,
                    mesh=cfg.make_mesh(),
                )
                self.use_wavlm = self.runner.use_wavlm
                self.emotion_labels = list(self.runner.labels)
            except Exception as e:
                print(f"[WARNING] {e}")
                print("[WARNING] Falling back to mock mode")
                self.mock_mode = True
                self.runner = None

    # ------------------------------------------------------------------

    def predict(self, video_path: str) -> Dict[str, Any]:
        if self.mock_mode:
            return self._predict_mock()
        try:
            video, audio = self.preprocess.preprocess_video_audio(
                video_path, use_face_crop=True, use_wavlm=self.use_wavlm
            )
            return self.predict_tensors(video, audio)
        except Exception as e:
            return self._error_output(str(e))

    def predict_stream(
        self,
        frames: Sequence[np.ndarray],
        waveform: np.ndarray,
        waveform_sample_rate: int,
        use_face_crop: bool = True,
    ) -> Dict[str, Any]:
        if self.mock_mode:
            return self._predict_mock()
        try:
            video, audio = self.preprocess.preprocess_stream_window(
                frames,
                waveform,
                waveform_sample_rate=waveform_sample_rate,
                use_face_crop=use_face_crop,
                use_wavlm=self.use_wavlm,
            )
            return self.predict_tensors(video, audio)
        except Exception as e:
            return self._error_output(str(e))

    def predict_tensors(self, video: np.ndarray, audio: np.ndarray) -> Dict[str, Any]:
        if self.mock_mode or self.runner is None:
            return self._predict_mock()
        # Reference direct backend: softmax over model output whatever the
        # mode (`backend/app/infer.py:98-99`) — JaxModelRunner.predict_probs
        # softmaxes non-late and passes late through; re-softmax late here to
        # match the direct backend byte-for-byte.
        probs = self.runner.predict_probs(video, audio)[0]
        if self.runner.fusion_mode == "late":
            e = np.exp(probs - probs.max())
            probs = e / e.sum()
        return self._format_output(probs)

    # ------------------------------------------------------------------

    def _predict_mock(self) -> Dict[str, Any]:
        probs = np.random.dirichlet(np.ones(len(self.emotion_labels)))
        return self._format_output(probs)

    def _error_output(self, message: str) -> Dict[str, Any]:
        n = len(self.emotion_labels)
        uniform = 1.0 / n * 100
        return {
            "error": message,
            "labels": self.emotion_labels,
            "probs": [uniform] * n,
            "top1": {"label": self.emotion_labels[0], "prob": uniform},
        }

    def _format_output(self, probs: np.ndarray) -> Dict[str, Any]:
        probs_pct = (np.asarray(probs, dtype=np.float64) * 100).tolist()
        top_idx = int(np.argmax(probs))
        return {
            "labels": self.emotion_labels,
            "probs": probs_pct,
            "top1": {"label": self.emotion_labels[top_idx], "prob": probs_pct[top_idx]},
        }
