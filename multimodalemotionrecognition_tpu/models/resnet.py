"""ResNet18 frame encoder with torchvision layer/BN semantics.

The reference's video branch wraps torchvision `resnet18` minus the FC head in
an `nn.Sequential` (`src/models/video.py:21-23`), producing torch state-dict
keys `backbone.0.*` (conv1), `backbone.1.*` (bn1), `backbone.{4..7}.{0,1}.*`
(layer1..4 basic blocks).  This Flax implementation uses NHWC layout (TPU
native) and names its submodules with the same dotted paths so reference
checkpoints convert mechanically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["BasicBlock", "ResNet18Backbone"]


def _conv(features: int, kernel: int, stride: int, name: str, dtype) -> nn.Conv:
    pad = kernel // 2
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def _bn(name: str, dtype, train: bool) -> nn.BatchNorm:
    # torch BatchNorm2d: eps=1e-5, momentum=0.1 (flax momentum convention: 0.9).
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """torchvision BasicBlock: two 3x3 convs with a residual add
    (child names conv1/bn1/conv2/bn2/downsample.{0,1})."""

    features: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = self.dtype or x.dtype
        identity = x
        out = _conv(self.features, 3, self.stride, "conv1", dtype)(x)
        out = _bn("bn1", dtype, train)(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, "conv2", dtype)(out)
        out = _bn("bn2", dtype, train)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features,
                kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=dtype,
                name="downsample.0",
            )(x)
            identity = _bn("downsample.1", dtype, train)(identity)
        return nn.relu(out + identity)


class ResNet18Backbone(nn.Module):
    """torchvision resnet18 children[:-1] as used by the reference video branch.

    Input [B, H, W, 3] (NHWC), output [B, 512] (global average pooled).
    Submodule names follow the reference's Sequential indices:
    0=conv1, 1=bn1, 4..7=layer1..4 (blocks "4.0", "4.1", ...).
    """

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, pool: bool = True
    ) -> jnp.ndarray:
        dtype = self.dtype or x.dtype
        x = nn.Conv(
            64,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=dtype,
            name="0",
        )(x)
        x = _bn("1", dtype, train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, feats) in enumerate(
            zip(self.stage_sizes, self.stage_features)
        ):
            for block in range(blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(
                    features=feats,
                    stride=stride,
                    dtype=dtype,
                    name=f"{stage + 4}.{block}",
                )(x, train=train)
        if pool:
            x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        return x
