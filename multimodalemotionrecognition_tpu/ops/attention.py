"""Multi-head attention with torch `nn.MultiheadAttention` semantics.

The reference's cross-attention fusion uses batch_first MHA with a packed
qkv projection and an optional additive float attn_mask
(`src/models/fusion.py:276-281,393-398`).  This module reproduces that math in
Flax (packed `in_proj` parameters so reference checkpoints load 1:1) while
letting XLA fuse it; a Pallas fused variant lives in
`ops/pallas_xattn.py` for the serving fast path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["TorchMultiHeadAttention"]


class TorchMultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention(batch_first=True) equivalent.

    Parameters mirror torch naming:
      in_proj_kernel [E, 3E]  (= torch in_proj_weight.T)
      in_proj_bias   [3E]
      out_proj       Dense(E) (= torch out_proj, kernel transposed)

    `bias` is an additive float attention bias of shape [B, L, S] or
    [B, H, L, S], applied after q/k scaling like torch's attn_mask.
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        e, h = self.embed_dim, self.num_heads
        if e % h != 0:
            raise ValueError(f"embed_dim={e} not divisible by num_heads={h}")
        dh = e // h
        b, lq = query.shape[0], query.shape[1]
        lk = key.shape[1]

        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (e, 3 * e)
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))

        dtype = self.dtype or query.dtype
        wq, wk, wv = jnp.split(in_kernel.astype(dtype), 3, axis=1)
        bq, bk, bv = jnp.split(in_bias.astype(dtype), 3)

        q = query @ wq + bq
        k = key @ wk + bk
        v = value @ wv + bv

        q = q.reshape(b, lq, h, dh).transpose(0, 2, 1, 3) * (dh**-0.5)
        k = k.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)

        scores = jnp.einsum(
            "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
        )
        if bias is not None:
            if bias.ndim == 3:
                bias = bias[:, None, :, :]
            scores = scores + bias.astype(scores.dtype)
        attn = nn.softmax(scores, axis=-1).astype(dtype)
        attn = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(attn)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
        return nn.Dense(e, dtype=dtype, name="out_proj")(out)
