"""Video branch: per-frame ResNet18 + temporal pooling.

TPU-native re-implementation of the reference VideoNet
(`src/models/video.py:10-44`).  Frames are folded into the batch so the
backbone sees one large [B*T, H, W, 3] batch — MXU-friendly — then unfolded for
temporal pooling.  Inputs follow the reference's torch layout [B, T, 3, H, W].
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.models.resnet import ResNet18Backbone
from multimodalemotionrecognition_tpu.models.temporal import TemporalPooler

__all__ = ["VideoNet"]


class VideoNet(nn.Module):
    num_classes: int
    temporal_pooling: str = "mean"
    temporal_num_heads: int = 4
    temporal_num_layers: int = 1
    temporal_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    embedding_dim: int = 512

    def setup(self) -> None:
        self.backbone = ResNet18Backbone(dtype=self.dtype)
        self.temporal_pool = TemporalPooler(
            dim=self.embedding_dim,
            mode=self.temporal_pooling,
            num_heads=self.temporal_num_heads,
            num_layers=self.temporal_num_layers,
            dropout=self.temporal_dropout,
            dtype=self.dtype,
        )
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype)

    def encode_frames(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, T, 3, H, W] -> per-frame features [B, T, 512]
        (reference fusion taps `video_model.backbone` directly,
        `src/models/fusion.py:368-370`)."""
        b, t, c, h, w = x.shape
        frames = x.reshape(b * t, c, h, w).transpose(0, 2, 3, 1)  # NHWC
        feats = self.backbone(frames, train=train)  # [B*T, 512]
        return feats.reshape(b, t, self.embedding_dim)

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = self.encode_frames(x, train=train)
        return self.temporal_pool(feats, train=train)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.classifier(self.encode(x, train=train))
