"""Flax model zoo mirroring the reference's model capabilities."""

from multimodalemotionrecognition_tpu.models.temporal import TemporalPooler
from multimodalemotionrecognition_tpu.models.audio import AudioCNN, AudioNet, AudioResNet18
from multimodalemotionrecognition_tpu.models.video import VideoNet
from multimodalemotionrecognition_tpu.models.fusion import FusionModel
from multimodalemotionrecognition_tpu.models.factory import build_model

__all__ = [
    "TemporalPooler",
    "AudioCNN",
    "AudioNet",
    "AudioResNet18",
    "VideoNet",
    "FusionModel",
    "build_model",
]
