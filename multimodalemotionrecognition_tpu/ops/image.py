"""Image/video device-side ops.

Replaces the reference's per-sample host-side OpenCV work
(`src/data/ravdess.py:280-390`) with batched XLA computations: ImageNet
normalization, bilinear resize, frame index selection, and a
torch-`AdaptiveAvgPool2d`-exact pooling built from averaging matrices so it
lowers to MXU matmuls instead of gather loops.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalemotionrecognition_tpu.config import IMAGENET_MEAN, IMAGENET_STD

__all__ = [
    "imagenet_normalize",
    "resize_bilinear",
    "uniform_frame_indices",
    "adaptive_avg_pool_2d",
]


def imagenet_normalize(frames: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Normalize [0,1] RGB frames with ImageNet statistics
    (reference `src/data/ravdess.py:386-388`)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=frames.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=frames.dtype)
    shape = [1] * frames.ndim
    shape[channel_axis] = 3
    return (frames - mean.reshape(shape)) / std.reshape(shape)


def resize_bilinear(img: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., size[0], size[1], C].

    cv2.INTER_LINEAR-style: half-pixel centers, no antialiasing
    (reference resizes with cv2 at `src/data/ravdess.py:351`).
    """
    out_shape = img.shape[:-3] + (size[0], size[1], img.shape[-1])
    return jax.image.resize(img, out_shape, method="bilinear", antialias=False)


def uniform_frame_indices(total: int, num: int) -> Sequence[int]:
    """Uniformly sample `num` indices from `total` frames
    (reference `_uniform_indices`, `src/data/ravdess.py:272-277`)."""
    if total <= 0:
        return [0] * num
    if total >= num:
        return np.linspace(0, total - 1, num=num).round().astype(int).tolist()
    return list(range(total)) + [total - 1] * (num - total)


@functools.lru_cache(maxsize=None)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[in_size, out_size] averaging matrix matching torch AdaptiveAvgPool:
    output i averages input rows floor(i*In/Out) .. ceil((i+1)*In/Out)-1."""
    mat = np.zeros((in_size, out_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        mat[start:end, i] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool_2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d on [..., H, W] (channel-free trailing dims).

    The reference pools encoder features to (1, temporal_bins)
    (`src/models/audio.py:75,144`). Implemented as two matmuls so XLA maps it
    onto the MXU.
    """
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = output_size
    ph = jnp.asarray(_adaptive_pool_matrix(h, oh))  # [H, oh]
    pw = jnp.asarray(_adaptive_pool_matrix(w, ow))  # [W, ow]
    x = jnp.einsum("...hw,hi->...iw", x, ph.astype(x.dtype))
    x = jnp.einsum("...iw,wj->...ij", x, pw.astype(x.dtype))
    return x
