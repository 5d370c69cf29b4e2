"""Mel-spectrogram audio encoders.

TPU-native re-implementation of the reference's audio branch
(`src/models/audio.py`): AudioCNN (lightweight), AudioResNet18 (the reference's
"ResNet"-style stack whose blocks deliberately have NO residual adds —
`src/models/audio.py:93-100`; that quirk is reproduced for checkpoint parity),
SpecAugment, and the AudioNet wrapper exposing the duck-typed encoder contract
(`embedding_dim` / `sequence_dim` / `encode` / `encode_sequence`).

Layout: inputs are torch-convention [B, 1, n_mels, T]; encoders run NHWC
internally (TPU native).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.models.temporal import TemporalPooler
from multimodalemotionrecognition_tpu.ops.image import adaptive_avg_pool_2d
from multimodalemotionrecognition_tpu.ops.stochastic import spec_augment

__all__ = ["AudioCNN", "AudioResNet18", "AudioNet"]


def _nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def _bn(name: str, dtype, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


def _sequence_pool(x_nhwc: jnp.ndarray, temporal_bins: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1, temporal_bins)) + squeeze + transpose
    (`src/models/audio.py:113,149`): NHWC [B,H,W,C] -> [B, temporal_bins, C]."""
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))  # [B, C, H, W]
    x = adaptive_avg_pool_2d(x, (1, temporal_bins))  # [B, C, 1, bins]
    return jnp.transpose(x[:, :, 0, :], (0, 2, 1))  # [B, bins, C]


class AudioCNN(nn.Module):
    """Lightweight 3-conv mel encoder (`src/models/audio.py:122-154`).

    Submodule names mirror the torch Sequential indices
    (features.0/1/4/5/8/9, proj.0).
    """

    embedding_dim: int = 128
    temporal_bins: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, 1, n_mels, T] -> sequence features [B, temporal_bins, embedding_dim]."""
        dtype = self.dtype or x.dtype
        h = _nchw_to_nhwc(x)
        for idx, feats in zip((0, 4, 8), (16, 32, 64)):
            h = nn.Conv(
                feats,
                kernel_size=(3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=dtype,
                name=f"features.{idx}",
            )(h)
            h = _bn(f"features.{idx + 1}", dtype, train)(h)
            h = nn.relu(h)
            if idx != 8:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = _sequence_pool(h, self.temporal_bins)  # [B, bins, 64]
        h = nn.Dense(self.embedding_dim, dtype=dtype, name="proj.0")(h)
        return nn.relu(h)


class AudioResNet18(nn.Module):
    """The reference's ResNet18-style mel encoder (`src/models/audio.py:55-119`).

    Faithfully NON-residual: each "block" is conv-bn-relu-conv-bn applied
    sequentially with no skip connection (`_make_block`,
    `src/models/audio.py:93-100`); stage transitions use a conv1x1+bn
    downsample as a plain sequential stage (`:81-85`).  Reproducing this is
    required for checkpoint parity.  Names mirror torch keys
    (layer2.0.0 = downsample conv, layer2.1.0 / layer2.1.3 = block convs, ...).
    """

    embedding_dim: int = 128
    temporal_bins: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """[B, 1, n_mels, T] -> sequence features [B, temporal_bins, embedding_dim]."""
        dtype = self.dtype or x.dtype
        h = _nchw_to_nhwc(x)
        h = nn.Conv(
            64,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=dtype,
            name="conv1",
        )(h)
        h = _bn("bn1", dtype, train)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        specs = (  # (layer index, out feats, stride, has downsample)
            (1, 64, 1, False),
            (2, 128, 2, True),
            (3, 256, 2, True),
            (4, 512, 2, True),
        )
        for layer_idx, feats, stride, has_ds in specs:
            block_start = 0
            if has_ds:
                h = nn.Conv(
                    feats,
                    kernel_size=(1, 1),
                    strides=(stride, stride),
                    use_bias=False,
                    dtype=dtype,
                    name=f"layer{layer_idx}.0.0",
                )(h)
                h = _bn(f"layer{layer_idx}.0.1", dtype, train)(h)
                block_start = 1
            for b in range(block_start, block_start + 2):
                h = nn.Conv(
                    feats,
                    kernel_size=(3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    dtype=dtype,
                    name=f"layer{layer_idx}.{b}.0",
                )(h)
                h = _bn(f"layer{layer_idx}.{b}.1", dtype, train)(h)
                h = nn.relu(h)
                h = nn.Conv(
                    feats,
                    kernel_size=(3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    dtype=dtype,
                    name=f"layer{layer_idx}.{b}.3",
                )(h)
                h = _bn(f"layer{layer_idx}.{b}.4", dtype, train)(h)
                # NB: no ReLU after the second bn and no residual add —
                # reference quirk preserved.

        h = _sequence_pool(h, self.temporal_bins)  # [B, bins, 512]
        return nn.Dense(self.embedding_dim, dtype=dtype, name="fc")(h)


class AudioNet(nn.Module):
    """Audio branch wrapper (`src/models/audio.py:157-206`).

    encode_sequence -> [B, 16, 128]; encode -> [B, 128] (temporal pooled);
    __call__ -> [B, num_classes]. SpecAugment applies train-only with the
    reference's parameters (freq<=20, time<=40, 2 masks, p=0.5) using the
    "specaugment" RNG stream.
    """

    num_classes: int
    embedding_dim: int = 128
    use_resnet: bool = True
    spec_augment: bool = True
    temporal_pooling: str = "mean"
    temporal_num_heads: int = 4
    temporal_num_layers: int = 1
    temporal_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @property
    def sequence_dim(self) -> int:
        return self.embedding_dim

    def setup(self) -> None:
        enc_cls = AudioResNet18 if self.use_resnet else AudioCNN
        self.encoder = enc_cls(embedding_dim=self.embedding_dim, dtype=self.dtype)
        self.temporal_pool = TemporalPooler(
            dim=self.embedding_dim,
            mode=self.temporal_pooling,
            num_heads=self.temporal_num_heads,
            num_layers=self.temporal_num_layers,
            dropout=self.temporal_dropout,
            dtype=self.dtype,
        )
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype)

    def _maybe_spec_augment(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.spec_augment and train and self.has_rng("specaugment"):
            rng = self.make_rng("specaugment")
            return spec_augment(rng, x)
        return x

    def encode_sequence(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._maybe_spec_augment(x, train)
        return self.encoder(x, train=train)

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        seq = self.encode_sequence(x, train=train)
        return self.temporal_pool(seq, train=train)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.classifier(self.encode(x, train=train))
