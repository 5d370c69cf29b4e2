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

Eval-path semantics (no attention/hidden dropout).  The training step keeps
the modular Flax graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["wavlm_fused_attention_sublayer"]


def _sublayer_kernel(num_heads: int, tp: int, seq_len: int, eps: float,
                     h_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                     wo_ref, bo_ref, lns_ref, lnb_ref, o_ref):
    e = h_ref.shape[-1]
    dh = e // num_heads
    hidden = h_ref[0]  # [Tp, E]
    acc = jnp.zeros((tp, e), jnp.float32)
    if tp != seq_len:
        col = lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        pad_mask = col >= seq_len
    else:
        pad_mask = None
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
        ctx = jnp.dot(
            probs.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            ctx.astype(v.dtype), wo_ref[lsl],
            preferred_element_type=jnp.float32,
        )
    out = acc + bo_ref[...] + hidden.astype(jnp.float32)
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
    normed = (out - mean) * lax.rsqrt(var + eps)
    o_ref[0] = (normed * lns_ref[...] + lnb_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "seq_len", "eps", "interpret")
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
    interpret: bool = False,
) -> jnp.ndarray:
    """-> LayerNorm(hidden + attention(q, k, v) @ wo + bo): [B, Tp, E], same
    dtype as hidden.  Rows >= seq_len are garbage (their keys are masked out
    of every softmax; as queries they only produce garbage rows the caller
    slices off after the encoder stack)."""
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
        functools.partial(_sublayer_kernel, h, tp, seq_len, eps),
        grid=(b,),
        in_specs=[nat_spec, nat_spec, nat_spec, nat_spec, gate_spec,
                  bias_spec, wo_spec, row_spec, row_spec, row_spec],
        out_specs=nat_spec,
        out_shape=jax.ShapeDtypeStruct((b, tp, e), hidden.dtype),
        interpret=interpret,
    )(
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
