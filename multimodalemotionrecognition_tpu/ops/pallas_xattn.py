"""Fused bidirectional cross-attention Pallas kernel (inference fast path).

Fuses the reference's entire xattn fusion block
(`src/models/fusion.py:393-402`) into ONE TPU kernel per batch element:

    v2 = MHA(q=v, k=a, v=a) (+ emotion-prior bias)   v = LN(v + v2)
    a2 = MHA(q=a, k=v', v=v') (+ bias)               a = LN(a + a2)
    v_emb = mean_T(v)        a_emb = mean_T(a)

Shapes are tiny (T=8 video tokens x Ta=149 audio tokens x d=128), so the whole
working set lives in VMEM for the kernel's lifetime: 6 qkv projections, 2x4
head attentions, 2 output projections, 2 residual+LayerNorms and both temporal
mean-pools run back-to-back with zero HBM round-trips between them — the
north-star optimization from SURVEY.md §7.  Note the ordering quirk preserved
from the reference: a2v attends over the POST-layernorm updated video tokens.

Eval-mode semantics (no attention dropout / drop-path) — this is the serving
path; training uses the modular Flax graph.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["XattnParams", "fused_bidirectional_xattn", "xattn_params_from_variables"]


class XattnParams(NamedTuple):
    """Packed parameters for both attention directions (+ the two norms)."""

    v2a_in_kernel: jnp.ndarray  # [d, 3d]
    v2a_in_bias: jnp.ndarray  # [3d]
    v2a_out_kernel: jnp.ndarray  # [d, d]
    v2a_out_bias: jnp.ndarray  # [d]
    a2v_in_kernel: jnp.ndarray
    a2v_in_bias: jnp.ndarray
    a2v_out_kernel: jnp.ndarray
    a2v_out_bias: jnp.ndarray
    v_norm_scale: jnp.ndarray  # [d]
    v_norm_bias: jnp.ndarray
    a_norm_scale: jnp.ndarray
    a_norm_bias: jnp.ndarray


def xattn_params_from_variables(params) -> XattnParams:
    """Extract the fusion-block params from a FusionModel param tree."""
    return XattnParams(
        v2a_in_kernel=params["v2a_attn"]["in_proj_kernel"],
        v2a_in_bias=params["v2a_attn"]["in_proj_bias"],
        v2a_out_kernel=params["v2a_attn"]["out_proj"]["kernel"],
        v2a_out_bias=params["v2a_attn"]["out_proj"]["bias"],
        a2v_in_kernel=params["a2v_attn"]["in_proj_kernel"],
        a2v_in_bias=params["a2v_attn"]["in_proj_bias"],
        a2v_out_kernel=params["a2v_attn"]["out_proj"]["kernel"],
        a2v_out_bias=params["a2v_attn"]["out_proj"]["bias"],
        v_norm_scale=params["v_norm"]["scale"],
        v_norm_bias=params["v_norm"]["bias"],
        a_norm_scale=params["a_norm"]["scale"],
        a_norm_bias=params["a_norm"]["bias"],
    )


def _mha_block(q_in, kv_in, w_in, b_in, w_out, b_out, bias, num_heads: int):
    """torch-semantics MHA on 2D tiles inside the kernel."""
    d = q_in.shape[-1]
    dh = d // num_heads
    scale = dh**-0.5
    q = jnp.dot(q_in, w_in[:, :d], preferred_element_type=jnp.float32) + b_in[:d]
    k = (
        jnp.dot(kv_in, w_in[:, d : 2 * d], preferred_element_type=jnp.float32)
        + b_in[d : 2 * d]
    )
    v = (
        jnp.dot(kv_in, w_in[:, 2 * d :], preferred_element_type=jnp.float32)
        + b_in[2 * d :]
    )
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        scores = jnp.dot(
            q[:, sl] * scale, k[:, sl].T, preferred_element_type=jnp.float32
        )
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        outs.append(jnp.dot(probs, v[:, sl], preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=1)
    return jnp.dot(attn, w_out, preferred_element_type=jnp.float32) + b_out


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _fused_kernel(
    num_heads: int,
    use_bias: bool,
    v_ref,
    a_ref,
    v2a_bias_ref,
    a2v_bias_ref,
    w_in_v_ref,
    b_in_v_ref,
    w_out_v_ref,
    b_out_v_ref,
    w_in_a_ref,
    b_in_a_ref,
    w_out_a_ref,
    b_out_a_ref,
    vn_s_ref,
    vn_b_ref,
    an_s_ref,
    an_b_ref,
    out_v_ref,
    out_a_ref,
):
    v = v_ref[0]
    a = a_ref[0]
    v2a_bias = v2a_bias_ref[0] if use_bias else None
    a2v_bias = a2v_bias_ref[0] if use_bias else None

    v2 = _mha_block(
        v, a, w_in_v_ref[...], b_in_v_ref[...], w_out_v_ref[...], b_out_v_ref[...],
        v2a_bias, num_heads,
    )
    v_new = _layer_norm(v + v2, vn_s_ref[...], vn_b_ref[...])

    # Reference ordering: a2v consumes the UPDATED video tokens.
    a2 = _mha_block(
        a, v_new, w_in_a_ref[...], b_in_a_ref[...], w_out_a_ref[...], b_out_a_ref[...],
        a2v_bias, num_heads,
    )
    a_new = _layer_norm(a + a2, an_s_ref[...], an_b_ref[...])

    out_v_ref[0, 0] = jnp.mean(v_new, axis=0)
    out_a_ref[0, 0] = jnp.mean(a_new, axis=0)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_bidirectional_xattn(
    params: XattnParams,
    v_tokens: jnp.ndarray,  # [B, T, d]
    a_tokens: jnp.ndarray,  # [B, Ta, d]
    v2a_bias: Optional[jnp.ndarray] = None,  # [B, T, Ta]
    a2v_bias: Optional[jnp.ndarray] = None,  # [B, Ta, T]
    num_heads: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (v_emb [B, d], a_emb [B, d]): attention + residual + LN + mean-pool,
    one VMEM-resident kernel invocation per batch element."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = v_tokens.shape
    ta = a_tokens.shape[1]
    use_bias = v2a_bias is not None
    if not use_bias:
        # zero-size placeholders keep the kernel signature static
        v2a_bias = jnp.zeros((b, 1, 1), jnp.float32)
        a2v_bias = jnp.zeros((b, 1, 1), jnp.float32)

    token_spec = lambda length: pl.BlockSpec(
        (1, length, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = lambda lq, lk: pl.BlockSpec(
        (1, lq, lk) if use_bias else (1, 1, 1),
        lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_fused_kernel, num_heads, use_bias)
    out_v, out_a = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            token_spec(t),
            token_spec(ta),
            bias_spec(t, ta),
            bias_spec(ta, t),
            full((d, 3 * d)),
            full((3 * d,)),
            full((d, d)),
            full((d,)),
            full((d, 3 * d)),
            full((3 * d,)),
            full((d, d)),
            full((d,)),
            full((d,)),
            full((d,)),
            full((d,)),
            full((d,)),
        ],
        out_specs=[
            # Mosaic tiling: the last two block dims must match the array
            # dims (or be 8/128-aligned), so pooled outputs are [B, 1, d].
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        v_tokens.astype(jnp.float32),
        a_tokens.astype(jnp.float32),
        v2a_bias.astype(jnp.float32),
        a2v_bias.astype(jnp.float32),
        params.v2a_in_kernel,
        params.v2a_in_bias,
        params.v2a_out_kernel,
        params.v2a_out_bias,
        params.a2v_in_kernel,
        params.a2v_in_bias,
        params.a2v_out_kernel,
        params.a2v_out_bias,
        params.v_norm_scale,
        params.v_norm_bias,
        params.a_norm_scale,
        params.a_norm_bias,
    )
    return out_v[:, 0, :], out_a[:, 0, :]
