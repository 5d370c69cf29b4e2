"""Temporal aggregation: mean, learnable attention, or transformer pooling.

TPU-native re-implementation of the reference's TemporalPooler family
(`src/models/temporal.py:9-110`). Parameter names mirror the torch state-dict
paths (e.g. `pool.score.0.*`, `pool.encoder.layers.0.self_attn.*`) so reference
checkpoints convert mechanically.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from multimodalemotionrecognition_tpu.ops.attention import TorchMultiHeadAttention

__all__ = [
    "TemporalAttentionPooling",
    "TemporalTransformerPooling",
    "TemporalPooler",
    "sinusoidal_positional_encoding",
]


def sinusoidal_positional_encoding(length: int, dim: int) -> np.ndarray:
    """Sinusoidal PE table [length, dim]
    (reference `src/models/temporal.py:29-43`)."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, dim, 2, dtype=np.float64) * (-math.log(10000.0) / max(1, dim))
    )
    pe = np.zeros((length, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    if dim > 1:
        n_odd = pe[:, 1::2].shape[1]
        pe[:, 1::2] = np.cos(position * div_term[:n_odd])
    return pe.astype(np.float32)


class TemporalAttentionPooling(nn.Module):
    """Softmax attention pooling over time
    (reference `src/models/temporal.py:9-26`).

    score = Linear(h,1) . Dropout . GELU . Linear(d,h) . LayerNorm, h = d//2.
    """

    dim: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = self.dtype or x.dtype
        hidden = max(1, self.dim // 2)
        s = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="score.0")(x)
        s = nn.Dense(hidden, dtype=dtype, name="score.1")(s)
        s = nn.gelu(s, approximate=False)
        s = nn.Dropout(rate=self.dropout, deterministic=not train)(s)
        s = nn.Dense(1, dtype=dtype, name="score.4")(s)
        attn = nn.softmax(s.squeeze(-1), axis=1)[..., None]
        return jnp.sum(x * attn, axis=1)


class TorchTransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer(norm_first=True, activation='gelu').

    Pre-norm: x += attn(norm1(x)); x += ffn(norm2(x)) with
    ffn = linear2(dropout(gelu(linear1(.)))).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = self.dtype or x.dtype
        h = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="norm1")(x)
        h = TorchMultiHeadAttention(
            embed_dim=self.d_model,
            num_heads=self.nhead,
            dropout_rate=self.dropout,
            dtype=dtype,
            name="self_attn",
        )(h, h, h, train=train)
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        x = x + h

        h = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="norm2")(x)
        h = nn.Dense(self.dim_feedforward, dtype=dtype, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=dtype, name="linear2")(h)
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        return x + h


class TemporalTransformerPooling(nn.Module):
    """Sinusoidal PE + pre-norm transformer encoder + attention pooling
    (reference `src/models/temporal.py:46-75`). ffn = max(2d, 4d)."""

    dim: int
    num_heads: int = 4
    num_layers: int = 1
    dropout: float = 0.1
    mlp_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ffn_dim = max(self.dim * 2, int(self.dim * self.mlp_ratio))
        pe = jnp.asarray(sinusoidal_positional_encoding(x.shape[1], self.dim))
        x = x + pe[None, :, :].astype(x.dtype)
        for i in range(self.num_layers):
            x = TorchTransformerEncoderLayer(
                d_model=self.dim,
                nhead=self.num_heads,
                dim_feedforward=ffn_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"encoder.layers.{i}",
            )(x, train=train)
        return TemporalAttentionPooling(
            dim=self.dim, dropout=self.dropout, dtype=self.dtype, name="pool"
        )(x, train=train)


class TemporalPooler(nn.Module):
    """Configurable temporal aggregation (reference `src/models/temporal.py:78-110`)."""

    dim: int
    mode: str = "mean"
    num_heads: int = 4
    num_layers: int = 1
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim != 3:
            raise ValueError(
                f"TemporalPooler expects [B, T, D], got shape={tuple(x.shape)}"
            )
        if self.mode == "mean":
            return jnp.mean(x, axis=1)
        if self.mode == "attn":
            return TemporalAttentionPooling(
                dim=self.dim, dropout=self.dropout, dtype=self.dtype, name="pool"
            )(x, train=train)
        if self.mode == "transformer":
            return TemporalTransformerPooling(
                dim=self.dim,
                num_heads=self.num_heads,
                num_layers=self.num_layers,
                dropout=self.dropout,
                dtype=self.dtype,
                name="pool",
            )(x, train=train)
        raise ValueError(f"Unsupported temporal pooling mode: {self.mode}")
