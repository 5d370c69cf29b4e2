"""Fused WavLM attention sublayer (Pallas, TPU).

The WavLM encoder's attention (HF `WavLMAttention`; reimplemented in
`models/wavlm.py::WavLMAttentionSelf`, reference use at
`src/models/wavlm_audio.py:30-41`) is memory/latency-bound on TPU: at
b128/S149 the modular XLA lowering materializes the f32 score tensor
[B, H, S, S] (~136 MB/layer) to HBM, shuffles heads through four transposes,
and runs softmax as a separate pass — measured 2.96 ms/layer for the
sublayer against ~0.1 ms of score FLOPs (benchmarks/RESULTS.md).

This kernel runs the ENTIRE sublayer after the q/k/v projections in one
VMEM-resident pass per batch element (measured 1.54 ms/layer on a v5e):

    per head h (static loop, lane-sliced from the natural [T, E] layout):
      s     = q_h @ k_h^T                  (f32 on the MXU)
      s    += gate_h[t] * position_bias_h  (WavLM's gated relative bias)
      p     = softmax(mask(s))             (padded key columns masked)
      ctx_h = p @ v_h                      (bf16 operands, f32 accumulation)
      acc  += ctx_h @ W_out[h·dh:(h+1)·dh] (out-projection folded per head)
    out = LayerNorm(acc + b_out + hidden)  (residual + post-norm folded)

Layout notes (Mosaic facts established on this hardware): 64-aligned LANE
slices of a [T, 768] block DO lower correctly (verified numerically on a
v5e), so q/k/v stay in their natural layout — no pre-split transposes, no
[B,H,T,dh] shuffles outside.  The per-query gate and the position bias are
stacked per head along SUBLANES ([H*Tp, 1] / [H*Tp, Tp]); the bias block
has a constant index map so Pallas keeps it VMEM-resident across the grid.
Sequence padding (149 -> 160) is applied ONCE around the whole encoder
stack by `models/wavlm.py`, not per layer.

Train-path semantics: the kernel optionally applies attention dropout (on
the softmax probabilities) and hidden dropout (on the projected attention
output, before the residual) in-kernel, using a counter-based hash RNG
(murmur-style finalizer over element indices — `pltpu.prng_*` has no
interpret-mode lowering, and a stateless hash is bit-identical between
Mosaic and the CPU interpreter, so dropout tests run off-TPU).  This makes
the kernel usable inside the train step for layers whose params are frozen
in every stage (stop-gradient'd end-to-end -> no VJP is ever requested);
`models/wavlm.py` gates that via `WavLMConfig.fused_train_layers`.  The
dropout RNG is behaviorally (not bitwise) equivalent to the modular path's
threefry `nn.Dropout` — the reference semantics only fix the distribution.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["wavlm_fused_attention_sublayer"]


def _hash_keep(base: jnp.ndarray, shape, threshold: int) -> jnp.ndarray:
    """Stateless per-element keep mask: murmur3-style finalizer over
    (element index ^ base).  base is a traced uint32 scalar; threshold is a
    static uint32 cut (keep probability = 1 - threshold / 2**32)."""
    r = lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(shape[1]) + c) ^ base
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x >= jnp.uint32(threshold)


def _drop_threshold(rate: float) -> int:
    """Static uint32 threshold for a drop probability `rate`."""
    return min(int(round(rate * 2.0**32)), 2**32 - 1)


def _sublayer_kernel(num_heads: int, tp: int, seq_len: int, eps: float,
                     attn_dropout: float, hidden_dropout: float,
                     seed_ref, h_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                     wo_ref, bo_ref, lns_ref, lnb_ref, o_ref):
    from jax.experimental import pallas as pl

    e = h_ref.shape[-1]
    dh = e // num_heads
    hidden = h_ref[0]  # [Tp, E]
    acc = jnp.zeros((tp, e), jnp.float32)
    if tp != seq_len:
        col = lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        pad_mask = col >= seq_len
    else:
        pad_mask = None
    if attn_dropout > 0.0 or hidden_dropout > 0.0:
        # Per-batch-element stream: mix the caller's seed with the grid index.
        base = seed_ref[0].astype(jnp.uint32) + (
            pl.program_id(0).astype(jnp.uint32) * jnp.uint32(0x632BE59B)
        )
    else:
        base = None
    for h in range(num_heads):
        lsl = slice(h * dh, (h + 1) * dh)  # lane slice (64-aligned)
        ssl = slice(h * tp, (h + 1) * tp)  # sublane slice
        q = q_ref[0][:, lsl]
        k = k_ref[0][:, lsl]
        v = v_ref[0][:, lsl]
        gate = g_ref[0, ssl]  # [Tp, 1] f32
        bias = bias_ref[ssl]  # [Tp, Tp] f32
        # q @ k^T without an explicit transpose (contract dim 1 with dim 1).
        scores = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores + gate * bias
        if pad_mask is not None:
            scores = jnp.where(pad_mask, jnp.float32(-1e30), scores)
        probs = jax.nn.softmax(scores, axis=-1)
        if attn_dropout > 0.0:
            keep = _hash_keep(
                base + jnp.uint32(((h + 1) * 0x9E3779B9) & 0xFFFFFFFF),
                (tp, tp),
                _drop_threshold(attn_dropout),
            )
            probs = jnp.where(
                keep, probs * jnp.float32(1.0 / (1.0 - attn_dropout)), 0.0
            )
        ctx = jnp.dot(
            probs.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            ctx.astype(v.dtype), wo_ref[lsl],
            preferred_element_type=jnp.float32,
        )
    proj = acc + bo_ref[...]
    if hidden_dropout > 0.0:
        keep = _hash_keep(
            base + jnp.uint32(0x7FEB352D),
            (tp, e),
            _drop_threshold(hidden_dropout),
        )
        proj = jnp.where(
            keep, proj * jnp.float32(1.0 / (1.0 - hidden_dropout)), 0.0
        )
    out = proj + hidden.astype(jnp.float32)
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
    normed = (out - mean) * lax.rsqrt(var + eps)
    o_ref[0] = (normed * lns_ref[...] + lnb_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "seq_len", "eps", "attn_dropout", "hidden_dropout",
        "interpret",
    ),
)
def wavlm_fused_attention_sublayer(
    hidden: jnp.ndarray,  # [B, Tp, E] residual input (pre-attention)
    q: jnp.ndarray,  # [B, Tp, E] natural layout, pre-scaled by dh**-0.5
    k: jnp.ndarray,  # [B, Tp, E]
    v: jnp.ndarray,  # [B, Tp, E]
    gate: jnp.ndarray,  # [B, H*Tp, 1] f32  (gate_a*(gate_b*const-1)+2)
    position_bias: jnp.ndarray,  # [H*Tp, Tp] f32 (shared across batch)
    wo: jnp.ndarray,  # [E, E] out-projection kernel
    bo: jnp.ndarray,  # [1, E] out-projection bias (f32)
    ln_scale: jnp.ndarray,  # [1, E] post-norm scale (f32)
    ln_bias: jnp.ndarray,  # [1, E] post-norm bias (f32)
    num_heads: int,
    seq_len: int,
    eps: float = 1e-5,
    attn_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # [1] int32, required if rates > 0
    interpret: bool = False,
) -> jnp.ndarray:
    """-> LayerNorm(hidden + dropout(attention(q, k, v) @ wo + bo)): [B, Tp, E],
    same dtype as hidden.  Rows >= seq_len are garbage (their keys are masked
    out of every softmax; as queries they only produce garbage rows the caller
    slices off after the encoder stack).  attn_dropout drops softmax
    probabilities, hidden_dropout drops the projected attention output before
    the residual (matching the modular sublayer's two nn.Dropout sites); both
    draw from the stateless hash RNG seeded by dropout_seed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, e = hidden.shape
    h = num_heads
    if gate.shape != (b, h * tp, 1):
        raise ValueError(f"gate shape {gate.shape} != {(b, h * tp, 1)}")
    if position_bias.shape != (h * tp, tp):
        raise ValueError(
            f"position_bias shape {position_bias.shape} != {(h * tp, tp)}"
        )
    if (attn_dropout > 0.0 or hidden_dropout > 0.0) and dropout_seed is None:
        raise ValueError("dropout_seed is required when dropout rates > 0")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    nat_spec = pl.BlockSpec(
        (1, tp, e), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    gate_spec = pl.BlockSpec(
        (1, h * tp, 1), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (h * tp, tp), lambda bb: (0, 0), memory_space=pltpu.VMEM
    )
    wo_spec = pl.BlockSpec((e, e), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, e), lambda bb: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(
            _sublayer_kernel, h, tp, seq_len, eps, attn_dropout, hidden_dropout
        ),
        grid=(b,),
        in_specs=[seed_spec, nat_spec, nat_spec, nat_spec, nat_spec, gate_spec,
                  bias_spec, wo_spec, row_spec, row_spec, row_spec],
        out_specs=nat_spec,
        out_shape=jax.ShapeDtypeStruct((b, tp, e), hidden.dtype),
        interpret=interpret,
    )(
        dropout_seed.reshape(1).astype(jnp.int32),
        hidden,
        q,
        k,
        v,
        gate.astype(jnp.float32),
        position_bias.astype(jnp.float32),
        wo,
        bo.astype(jnp.float32).reshape(1, e),
        ln_scale.astype(jnp.float32).reshape(1, e),
        ln_bias.astype(jnp.float32).reshape(1, e),
    )
