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
Mosaic and the CPU interpreter, so dropout tests run off-TPU).  The
dropout RNG is behaviorally (not bitwise) equivalent to the modular path's
threefry `nn.Dropout` — the reference semantics only fix the distribution.

Differentiable: `wavlm_fused_attention_sublayer` carries a custom VJP whose
backward is a second Pallas kernel (`_sublayer_bwd_kernel`) in the
flash-attention recompute style — it re-derives scores/probs from q/k/v in
VMEM instead of saving the O(T^2) tensors, regenerates both dropout masks
bit-exactly from the hash RNG, and emits every gradient in one pass:
per-batch dhidden/dq/dk/dv/dgate plus position-bias / out-projection /
LayerNorm grads accumulated across the sequential batch grid into
constant-index-map f32 blocks.  So TRAINABLE encoder layers run fused in
the train step too; `models/wavlm.py` gates train-time fusion via
`WavLMConfig.fused_train_layers` (the trainer sets it to the full stack).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def _forward_call(
    num_heads, seq_len, eps, attn_dropout, hidden_dropout, interpret,
    seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb,
):
    """The forward pallas_call (tensors already validated/cast)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, e = hidden.shape
    h = num_heads
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
    )(seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb)


def _sublayer_bwd_kernel(num_heads, tp, seq_len, eps, attn_dropout,
                         hidden_dropout, seed_ref, h_ref, q_ref, k_ref, v_ref,
                         g_ref, bias_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
                         do_ref, dh_ref, dq_ref, dk_ref, dv_ref, dg_ref,
                         dbias_ref, dwo_ref, dbo_ref, dlns_ref, dlnb_ref,
                         probs_ref, ctx_ref):
    """Backward of `_sublayer_kernel` for one batch element (flash-style:
    recomputes scores/probs instead of saving the O(T^2) tensors; the
    stateless hash RNG regenerates the dropout masks bit-exactly).  Shared
    params (position bias, out-proj, LN affine) accumulate across the
    sequential grid into constant-index-map f32 output blocks; grads for
    padded rows/columns vanish because their upstream cotangents and masked
    softmax columns are exactly zero."""
    from jax.experimental import pallas as pl

    e = h_ref.shape[-1]
    dh_sz = e // num_heads
    bb = pl.program_id(0)

    @pl.when(bb == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    hidden = h_ref[0]
    cdt = v_ref.dtype  # matmul operand dtype (compute dtype)
    if tp != seq_len:
        col = lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        pad_mask = col >= seq_len
    else:
        pad_mask = None
    if attn_dropout > 0.0 or hidden_dropout > 0.0:
        base = seed_ref[0].astype(jnp.uint32) + (
            bb.astype(jnp.uint32) * jnp.uint32(0x632BE59B)
        )
    else:
        base = None

    # ---- recompute the forward up to the pre-norm sum ----
    acc = jnp.zeros((tp, e), jnp.float32)
    for h in range(num_heads):
        lsl = slice(h * dh_sz, (h + 1) * dh_sz)
        ssl = slice(h * tp, (h + 1) * tp)
        q = q_ref[0][:, lsl]
        k = k_ref[0][:, lsl]
        scores = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = scores + g_ref[0, ssl] * bias_ref[ssl]
        if pad_mask is not None:
            scores = jnp.where(pad_mask, jnp.float32(-1e30), scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs_ref[ssl] = probs
        if attn_dropout > 0.0:
            keep = _hash_keep(
                base + jnp.uint32(((h + 1) * 0x9E3779B9) & 0xFFFFFFFF),
                (tp, tp),
                _drop_threshold(attn_dropout),
            )
            probs_d = jnp.where(
                keep, probs * jnp.float32(1.0 / (1.0 - attn_dropout)), 0.0
            )
        else:
            probs_d = probs
        ctx = jnp.dot(
            probs_d.astype(cdt), v_ref[0][:, lsl],
            preferred_element_type=jnp.float32,
        )
        ctx_ref[ssl] = ctx
        acc = acc + jnp.dot(
            ctx.astype(cdt), wo_ref[lsl], preferred_element_type=jnp.float32
        )
    proj = acc + bo_ref[...]
    if hidden_dropout > 0.0:
        keep_hid = _hash_keep(
            base + jnp.uint32(0x7FEB352D), (tp, e),
            _drop_threshold(hidden_dropout),
        )
        inv_keep_hid = jnp.float32(1.0 / (1.0 - hidden_dropout))
        proj = jnp.where(keep_hid, proj * inv_keep_hid, 0.0)
    out = proj + hidden.astype(jnp.float32)
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
    rstd = lax.rsqrt(var + eps)
    normed = (out - mean) * rstd

    # ---- LayerNorm + residual backward ----
    g_out = do_ref[0].astype(jnp.float32)
    dlns_ref[...] += jnp.sum(g_out * normed, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(g_out, axis=0, keepdims=True)
    dn = g_out * lns_ref[...]
    dout_pre = rstd * (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - normed * jnp.mean(dn * normed, axis=-1, keepdims=True)
    )
    dh_ref[0] = dout_pre.astype(dh_ref.dtype)
    dproj = dout_pre
    if hidden_dropout > 0.0:
        dproj = jnp.where(keep_hid, dproj * inv_keep_hid, 0.0)
    dbo_ref[...] += jnp.sum(dproj, axis=0, keepdims=True)
    dproj_c = dproj.astype(cdt)

    # ---- per-head attention backward (saved probs/ctx, masks regenerated) --
    dq_parts, dk_parts, dv_parts, dg_parts, dbias_parts, dwo_parts = (
        [], [], [], [], [], []
    )
    for h in range(num_heads):
        lsl = slice(h * dh_sz, (h + 1) * dh_sz)
        ssl = slice(h * tp, (h + 1) * tp)
        probs = probs_ref[ssl]
        ctx = ctx_ref[ssl]
        v = v_ref[0][:, lsl]
        # d(ctx) = dproj @ wo_h^T ; d(wo_h) = ctx^T @ dproj
        dctx = lax.dot_general(
            dproj_c, wo_ref[lsl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwo_parts.append(
            lax.dot_general(
                ctx.astype(cdt), dproj_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dctx_c = dctx.astype(cdt)
        if attn_dropout > 0.0:
            keep = _hash_keep(
                base + jnp.uint32(((h + 1) * 0x9E3779B9) & 0xFFFFFFFF),
                (tp, tp),
                _drop_threshold(attn_dropout),
            )
            inv_keep = jnp.float32(1.0 / (1.0 - attn_dropout))
            probs_d = jnp.where(keep, probs * inv_keep, 0.0)
        else:
            probs_d = probs
        # d(v) = probs_d^T @ dctx ; d(probs_d) = dctx @ v^T
        dv_parts.append(
            lax.dot_general(
                probs_d.astype(cdt), dctx_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dv_ref.dtype)
        )
        dprobs = lax.dot_general(
            dctx_c, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if attn_dropout > 0.0:
            dprobs = jnp.where(keep, dprobs * inv_keep, 0.0)
        # softmax backward (padded columns have probs == 0 -> dscores == 0)
        dscores = probs * (
            dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True)
        )
        dg_parts.append(
            jnp.sum(dscores * bias_ref[ssl], axis=-1, keepdims=True)
        )
        dbias_parts.append(g_ref[0, ssl] * dscores)
        ds_c = dscores.astype(cdt)
        dq_parts.append(
            jnp.dot(
                ds_c, k_ref[0][:, lsl], preferred_element_type=jnp.float32
            ).astype(dq_ref.dtype)
        )
        dk_parts.append(
            lax.dot_general(
                ds_c, q_ref[0][:, lsl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dk_ref.dtype)
        )
    dq_ref[0] = jnp.concatenate(dq_parts, axis=-1)
    dk_ref[0] = jnp.concatenate(dk_parts, axis=-1)
    dv_ref[0] = jnp.concatenate(dv_parts, axis=-1)
    dg_ref[0] = jnp.concatenate(dg_parts, axis=0)
    dbias_ref[...] += jnp.concatenate(dbias_parts, axis=0)
    dwo_ref[...] += jnp.concatenate(dwo_parts, axis=0)


def _backward_call(
    num_heads, seq_len, eps, attn_dropout, hidden_dropout, interpret,
    seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb, dout,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, e = hidden.shape
    h = num_heads
    dh_sz = e // h
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

    out_shapes = (
        jax.ShapeDtypeStruct((b, tp, e), hidden.dtype),  # dhidden
        jax.ShapeDtypeStruct((b, tp, e), q.dtype),       # dq
        jax.ShapeDtypeStruct((b, tp, e), k.dtype),       # dk
        jax.ShapeDtypeStruct((b, tp, e), v.dtype),       # dv
        jax.ShapeDtypeStruct((b, h * tp, 1), jnp.float32),  # dgate
        jax.ShapeDtypeStruct((h * tp, tp), jnp.float32),    # dbias (acc)
        jax.ShapeDtypeStruct((e, e), jnp.float32),          # dwo (acc)
        jax.ShapeDtypeStruct((1, e), jnp.float32),          # dbo (acc)
        jax.ShapeDtypeStruct((1, e), jnp.float32),          # dlns (acc)
        jax.ShapeDtypeStruct((1, e), jnp.float32),          # dlnb (acc)
    )
    return pl.pallas_call(
        functools.partial(
            _sublayer_bwd_kernel, h, tp, seq_len, eps, attn_dropout,
            hidden_dropout,
        ),
        grid=(b,),
        in_specs=[seed_spec, nat_spec, nat_spec, nat_spec, nat_spec, gate_spec,
                  bias_spec, wo_spec, row_spec, row_spec, row_spec, nat_spec],
        out_specs=(nat_spec, nat_spec, nat_spec, nat_spec, gate_spec,
                   bias_spec, wo_spec, row_spec, row_spec, row_spec),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((h * tp, tp), jnp.float32),
            pltpu.VMEM((h * tp, dh_sz), jnp.float32),
        ],
        # The backward holds ~18.5 MB of blocks at b64/bf16 (inputs + four
        # per-batch grads + the accumulated shared-param grads + the
        # probs/ctx scratch), over Mosaic's default 16 MB scoped-vmem cap —
        # raise it; a v5e core has 128 MB of physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb, dout)


@functools.lru_cache(maxsize=None)
def _make_diff_fn(num_heads, seq_len, eps, attn_dropout, hidden_dropout,
                  interpret):
    """custom_vjp-wrapped sublayer for one static configuration: the forward
    is `_sublayer_kernel` unchanged; the backward is the flash-style
    recompute kernel above, so the fused sublayer is usable for TRAINABLE
    encoder layers, not just the stop-gradient'd frozen prefix."""
    statics = (num_heads, seq_len, eps, attn_dropout, hidden_dropout,
               interpret)

    @jax.custom_vjp
    def f(seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb):
        return _forward_call(*statics, seed, hidden, q, k, v, gate, bias, wo,
                             bo, lns, lnb)

    def f_fwd(seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb):
        args = (seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb)
        return _forward_call(*statics, *args), args

    def f_bwd(res, g):
        (dh, dq, dk, dv, dgate, dbias, dwo, dbo, dlns, dlnb) = _backward_call(
            *statics, *res, g
        )
        wo = res[7]
        return (
            np.zeros((1,), jax.dtypes.float0),  # seed: integer, no tangent
            dh, dq, dk, dv, dgate, dbias, dwo.astype(wo.dtype), dbo, dlns,
            dlnb,
        )

    f.defvjp(f_fwd, f_bwd)
    return f


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
    draw from the stateless hash RNG seeded by dropout_seed.

    Differentiable: a custom VJP (flash-style recompute backward kernel,
    `_sublayer_bwd_kernel`) provides gradients w.r.t. every tensor input, so
    trainable encoder layers can run fused too — not just the frozen prefix."""
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

    fn = _make_diff_fn(
        num_heads, seq_len, eps, attn_dropout, hidden_dropout, interpret
    )
    return fn(
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
