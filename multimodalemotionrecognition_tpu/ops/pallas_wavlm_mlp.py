"""Fused WavLM feed-forward (MLP) sublayer (Pallas, TPU) — prototype.

The WavLM encoder's MLP sublayer (HF `WavLMFeedForward` + final_layer_norm;
reimplemented in `models/wavlm.py::WavLMEncoderLayer`, reference use at
`src/models/wavlm_audio.py:30-41`) is matmul-dominated and XLA already runs
the two Dense layers near roofline (~143 TFLOP/s measured,
benchmarks/RESULTS.md) — the candidate win here is NOT the matmuls but the
glue: the [T, 3072] activation-dropout mask (31.5 M elements/step at b64),
the [T, 768] hidden-dropout mask, the GELU pass, and the residual+LayerNorm,
all of which cost HBM round-trips between the matmuls in the modular graph.
This kernel keeps the intermediate activation VMEM-resident:

    ff1 = hidden @ W1 + b1          (f32 accumulation on the MXU)
    a   = dropout_act(gelu(ff1))    (rational-erf GELU + hash-RNG mask)
    y   = a @ W2 + b2
    out = LayerNorm(hidden + dropout_hid(y))

Dropout uses the same stateless counter-hash RNG as the fused attention
sublayer (`ops/pallas_wavlm_attn.py::_hash_keep`) — behaviorally (not
bitwise) equivalent to the modular path's threefry `nn.Dropout`; the
reference semantics only fix the distribution.

Differentiable: a custom VJP whose backward is a second Pallas kernel in the
flash/recompute style — it re-derives ff1/gelu from `hidden` instead of
saving the [T, 3072] intermediate, regenerates both dropout masks bit-exactly
from the hash RNG, and emits dhidden plus all six param grads (dW1, db1,
dW2, db2, dLN-scale, dLN-bias) in one pass, with shared-param grads
accumulated across the sequential batch grid into constant-index-map f32
blocks.

Measurement gate: OFF by default (`WavLMConfig.fused_mlp = "auto"` resolves
False unless EMO_FUSED_MLP=1) — per the conv-FE/full-block lesson
(benchmarks/RESULTS.md), the measurement on real hardware decides whether
this kernel becomes a default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multimodalemotionrecognition_tpu.ops.pallas_wavlm_attn import (
    _drop_threshold,
    _hash_keep,
)

__all__ = ["wavlm_fused_mlp_sublayer"]

_SQRT_2_OVER_PI_INV = 0.3989422804014327  # 1/sqrt(2*pi)


def _erf_rational(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz–Stegun 7.1.26 erf (ops/activations.py::erf_rational),
    inlined so the kernel has no module-level jax tracer deps."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_cdf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + _erf_rational(x * (2.0**-0.5)))


def _mlp_kernel(eps, act_dropout, hidden_dropout, seed_ref, h_ref, w1_ref,
                b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, o_ref):
    from jax.experimental import pallas as pl

    hidden = h_ref[0]  # [Tp, E] compute dtype
    cdt = hidden.dtype
    if act_dropout > 0.0 or hidden_dropout > 0.0:
        base = seed_ref[0].astype(jnp.uint32) + (
            pl.program_id(0).astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        )
    else:
        base = None
    ff1 = (
        jnp.dot(hidden, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...]
    )
    a = ff1 * _gelu_cdf(ff1)
    if act_dropout > 0.0:
        keep = _hash_keep(
            base + jnp.uint32(0x2545F491), ff1.shape,
            _drop_threshold(act_dropout),
        )
        a = jnp.where(keep, a * jnp.float32(1.0 / (1.0 - act_dropout)), 0.0)
    y = (
        jnp.dot(a.astype(cdt), w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )
    if hidden_dropout > 0.0:
        keep = _hash_keep(
            base + jnp.uint32(0x41C64E6D), y.shape,
            _drop_threshold(hidden_dropout),
        )
        y = jnp.where(keep, y * jnp.float32(1.0 / (1.0 - hidden_dropout)), 0.0)
    out = y + hidden.astype(jnp.float32)
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
    normed = (out - mean) * lax.rsqrt(var + eps)
    o_ref[0] = (normed * lns_ref[...] + lnb_ref[...]).astype(o_ref.dtype)


def _specs(b, tp, e, f):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    nat_spec = pl.BlockSpec(
        (1, tp, e), lambda bb: (bb, 0, 0), memory_space=pltpu.VMEM
    )
    w1_spec = pl.BlockSpec((e, f), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((f, e), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    rowf_spec = pl.BlockSpec((1, f), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    rowe_spec = pl.BlockSpec((1, e), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    return seed_spec, nat_spec, w1_spec, w2_spec, rowf_spec, rowe_spec


def _forward_call(eps, act_dropout, hidden_dropout, interpret,
                  seed, hidden, w1, b1, w2, b2, lns, lnb):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, e = hidden.shape
    f = w1.shape[1]
    seed_spec, nat_spec, w1_spec, w2_spec, rowf_spec, rowe_spec = _specs(
        b, tp, e, f
    )
    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps, act_dropout, hidden_dropout),
        grid=(b,),
        in_specs=[seed_spec, nat_spec, w1_spec, rowf_spec, w2_spec, rowe_spec,
                  rowe_spec, rowe_spec],
        out_specs=nat_spec,
        out_shape=jax.ShapeDtypeStruct((b, tp, e), hidden.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed, hidden, w1, b1, w2, b2, lns, lnb)


def _mlp_bwd_kernel(eps, act_dropout, hidden_dropout, seed_ref, h_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, do_ref,
                    dh_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref,
                    dlnb_ref):
    """Backward of `_mlp_kernel` for one batch element: recomputes ff1/gelu
    (flash-style — the [Tp, F] intermediate never hits HBM), regenerates both
    dropout masks from the hash RNG, and accumulates shared-param grads
    across the sequential grid.  Padded rows (>= seq_len) carry zero upstream
    cotangents (the encoder slices them off), so their contributions to
    every accumulated grad are exactly zero — no masking needed."""
    from jax.experimental import pallas as pl

    bb = pl.program_id(0)

    @pl.when(bb == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    hidden = h_ref[0]
    cdt = hidden.dtype
    if act_dropout > 0.0 or hidden_dropout > 0.0:
        base = seed_ref[0].astype(jnp.uint32) + (
            bb.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        )
    else:
        base = None

    # ---- recompute forward ----
    ff1 = (
        jnp.dot(hidden, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...]
    )
    cdf = _gelu_cdf(ff1)
    g_act = ff1 * cdf
    if act_dropout > 0.0:
        keep_act = _hash_keep(
            base + jnp.uint32(0x2545F491), ff1.shape,
            _drop_threshold(act_dropout),
        )
        inv_act = jnp.float32(1.0 / (1.0 - act_dropout))
        a = jnp.where(keep_act, g_act * inv_act, 0.0)
    else:
        a = g_act
    a_c = a.astype(cdt)
    y = (
        jnp.dot(a_c, w2_ref[...], preferred_element_type=jnp.float32)
        + b2_ref[...]
    )
    if hidden_dropout > 0.0:
        keep_hid = _hash_keep(
            base + jnp.uint32(0x41C64E6D), y.shape,
            _drop_threshold(hidden_dropout),
        )
        inv_hid = jnp.float32(1.0 / (1.0 - hidden_dropout))
        y = jnp.where(keep_hid, y * inv_hid, 0.0)
    out = y + hidden.astype(jnp.float32)
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
    rstd = lax.rsqrt(var + eps)
    normed = (out - mean) * rstd

    # ---- LayerNorm + residual backward ----
    g_out = do_ref[0].astype(jnp.float32)
    dlns_ref[...] += jnp.sum(g_out * normed, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(g_out, axis=0, keepdims=True)
    dn = g_out * lns_ref[...]
    dpre = rstd * (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - normed * jnp.mean(dn * normed, axis=-1, keepdims=True)
    )
    dy = dpre
    if hidden_dropout > 0.0:
        dy = jnp.where(keep_hid, dy * inv_hid, 0.0)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dy_c = dy.astype(cdt)
    # dW2 = a^T @ dy ; da = dy @ W2^T
    dw2_ref[...] += lax.dot_general(
        a_c, dy_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    da = lax.dot_general(
        dy_c, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if act_dropout > 0.0:
        da = jnp.where(keep_act, da * inv_act, 0.0)
    # gelu'(x) = cdf(x) + x * pdf(x)
    pdf = jnp.exp(-0.5 * ff1 * ff1) * jnp.float32(_SQRT_2_OVER_PI_INV)
    dff1 = da * (cdf + ff1 * pdf)
    db1_ref[...] += jnp.sum(dff1, axis=0, keepdims=True)
    dff1_c = dff1.astype(cdt)
    # dW1 = hidden^T @ dff1 ; dhidden = dpre + dff1 @ W1^T
    dw1_ref[...] += lax.dot_general(
        hidden, dff1_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = dpre + lax.dot_general(
        dff1_c, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh_ref[0] = dh.astype(dh_ref.dtype)


def _backward_call(eps, act_dropout, hidden_dropout, interpret,
                   seed, hidden, w1, b1, w2, b2, lns, lnb, dout):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, e = hidden.shape
    f = w1.shape[1]
    seed_spec, nat_spec, w1_spec, w2_spec, rowf_spec, rowe_spec = _specs(
        b, tp, e, f
    )
    out_shapes = (
        jax.ShapeDtypeStruct((b, tp, e), hidden.dtype),  # dhidden
        jax.ShapeDtypeStruct((e, f), jnp.float32),       # dW1 (acc)
        jax.ShapeDtypeStruct((1, f), jnp.float32),       # db1 (acc)
        jax.ShapeDtypeStruct((f, e), jnp.float32),       # dW2 (acc)
        jax.ShapeDtypeStruct((1, e), jnp.float32),       # db2 (acc)
        jax.ShapeDtypeStruct((1, e), jnp.float32),       # dlns (acc)
        jax.ShapeDtypeStruct((1, e), jnp.float32),       # dlnb (acc)
    )
    return pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps, act_dropout, hidden_dropout),
        grid=(b,),
        in_specs=[seed_spec, nat_spec, w1_spec, rowf_spec, w2_spec, rowe_spec,
                  rowe_spec, rowe_spec, nat_spec],
        out_specs=(nat_spec, w1_spec, rowf_spec, w2_spec, rowe_spec,
                   rowe_spec, rowe_spec),
        out_shape=out_shapes,
        # w1+w2 (bf16, 9.4 MB) + dW1+dW2 (f32, 18.9 MB) + the [Tp, F]
        # recompute intermediates (~8 MB f32) exceed Mosaic's 16 MB default
        # scoped-vmem cap; a v5e core has 128 MB physical.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(seed, hidden, w1, b1, w2, b2, lns, lnb, dout)


@functools.lru_cache(maxsize=None)
def _make_diff_fn(eps, act_dropout, hidden_dropout, interpret):
    statics = (eps, act_dropout, hidden_dropout, interpret)

    @jax.custom_vjp
    def f(seed, hidden, w1, b1, w2, b2, lns, lnb):
        return _forward_call(*statics, seed, hidden, w1, b1, w2, b2, lns, lnb)

    def f_fwd(seed, hidden, w1, b1, w2, b2, lns, lnb):
        args = (seed, hidden, w1, b1, w2, b2, lns, lnb)
        return _forward_call(*statics, *args), args

    def f_bwd(res, g):
        dh, dw1, db1, dw2, db2, dlns, dlnb = _backward_call(*statics, *res, g)
        w1 = res[2]
        w2 = res[4]
        return (
            np.zeros((1,), jax.dtypes.float0),  # seed: integer, no tangent
            dh, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2, dlns,
            dlnb,
        )

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act_dropout", "hidden_dropout", "interpret"),
)
def wavlm_fused_mlp_sublayer(
    hidden: jnp.ndarray,  # [B, Tp, E] residual input (post-attention-LN)
    w1: jnp.ndarray,  # [E, F] intermediate_dense kernel
    b1: jnp.ndarray,  # [F] intermediate_dense bias
    w2: jnp.ndarray,  # [F, E] output_dense kernel
    b2: jnp.ndarray,  # [E] output_dense bias
    ln_scale: jnp.ndarray,  # [E] final_layer_norm scale
    ln_bias: jnp.ndarray,  # [E] final_layer_norm bias
    eps: float = 1e-5,
    act_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # [1] int32 if rates > 0
    interpret: bool = False,
) -> jnp.ndarray:
    """-> LayerNorm(hidden + drop_hid(W2 @ drop_act(gelu(W1 @ hidden + b1)) + b2)).

    Same contract as the modular MLP sublayer of
    `models/wavlm.py::WavLMEncoderLayer` (erf-GELU via the rational
    approximation, two dropout sites).  Padded rows pass through as garbage
    the caller slices off; their grads vanish because their cotangents are
    zero.  Differentiable via a flash-style recompute backward kernel."""
    b, tp, e = hidden.shape
    f = w1.shape[1]
    if w1.shape != (e, f) or w2.shape != (f, e):
        raise ValueError(f"bad MLP kernel shapes {w1.shape} / {w2.shape}")
    if (act_dropout > 0.0 or hidden_dropout > 0.0) and dropout_seed is None:
        raise ValueError("dropout_seed is required when dropout rates > 0")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)

    fn = _make_diff_fn(eps, act_dropout, hidden_dropout, interpret)
    return fn(
        dropout_seed.reshape(1).astype(jnp.int32),
        hidden,
        w1,
        jnp.asarray(b1, jnp.float32).reshape(1, f),
        w2,
        jnp.asarray(b2, jnp.float32).reshape(1, e),
        jnp.asarray(ln_scale, jnp.float32).reshape(1, e),
        jnp.asarray(ln_bias, jnp.float32).reshape(1, e),
    )
