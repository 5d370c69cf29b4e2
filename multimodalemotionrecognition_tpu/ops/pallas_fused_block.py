"""Whole-fusion-block Pallas kernel: projections -> bidirectional
cross-attention -> residual/LN -> temporal pools -> head, in ONE kernel.

Supersedes ops/pallas_xattn.py (which fuses only the attention core) by
absorbing everything between the encoder towers and the logits
(`/root/reference/src/models/fusion.py:356-411`):

    v  = v_feat  @ W_vin                        [T, d]
    a  = (a_seq @ W_aseq) @ W_ain               [Ta, d]
    (optional emotion-prior additive biases computed IN kernel)
    v' = LN(v + MHA(q=v, kv=a))                 post-LN ordering quirk:
    a' = LN(a + MHA(q=a, kv=v'))                a2v sees the UPDATED v
    v_emb, a_emb = pool(v'), pool(a')           mean or attn pooling
    logits = head(v_emb, a_emb)                 concat MLP or gated

Everything lives in VMEM for the kernel's lifetime — zero HBM round trips
between the ~20 fused ops.  Weight blocks use constant index maps, so Mosaic
keeps them resident across the batch grid (no per-sample refetch).

int8 weight-only quantization is supported INSIDE the kernel: quantized
matrices arrive as int8 with a per-column f32 scale row and are dequantized
right before their matmul (the XLA-analog of ONNX dynamic quantization,
reference `src/export_optimized_model.py:89-104`).

Eval-mode semantics (dropout-free) — this is the serving path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FusedBlockSpec", "build_fused_block_fn", "extract_block_params"]

_LANES = 128


@dataclasses.dataclass(frozen=True)
class FusedBlockSpec:
    """Static configuration of the fused block (shapes the kernel)."""

    num_heads: int
    d_model: int
    pooling: str  # "mean" | "attn"
    head: str  # "concat" | "gated"
    use_prior: bool
    num_classes: int
    batched_heads: bool = True  # dot_general over a head batch dim vs slicing


# ---------------------------------------------------------------------------
# parameter extraction
# ---------------------------------------------------------------------------

# (name, param path, is_matrix) — matrices are int8-quantizable.
def _param_table(spec: FusedBlockSpec) -> List[Tuple[str, Tuple[str, ...], bool]]:
    t: List[Tuple[str, Tuple[str, ...], bool]] = [
        ("vin_w", ("v_in_proj", "kernel"), True),
        ("vin_b", ("v_in_proj", "bias"), False),
        ("aseq_w", ("audio_seq_proj", "kernel"), True),
        ("aseq_b", ("audio_seq_proj", "bias"), False),
        ("ain_w", ("a_in_proj", "kernel"), True),
        ("ain_b", ("a_in_proj", "bias"), False),
        ("v2a_in_w", ("v2a_attn", "in_proj_kernel"), True),
        ("v2a_in_b", ("v2a_attn", "in_proj_bias"), False),
        ("v2a_out_w", ("v2a_attn", "out_proj", "kernel"), True),
        ("v2a_out_b", ("v2a_attn", "out_proj", "bias"), False),
        ("a2v_in_w", ("a2v_attn", "in_proj_kernel"), True),
        ("a2v_in_b", ("a2v_attn", "in_proj_bias"), False),
        ("a2v_out_w", ("a2v_attn", "out_proj", "kernel"), True),
        ("a2v_out_b", ("a2v_attn", "out_proj", "bias"), False),
        ("vn_s", ("v_norm", "scale"), False),
        ("vn_b", ("v_norm", "bias"), False),
        ("an_s", ("a_norm", "scale"), False),
        ("an_b", ("a_norm", "bias"), False),
    ]
    if spec.use_prior:
        t += [
            ("ep_p0_w", ("emotion_prior_bias", "prior_net.0", "kernel"), True),
            ("ep_p0_b", ("emotion_prior_bias", "prior_net.0", "bias"), False),
            ("ep_p3_w", ("emotion_prior_bias", "prior_net.3", "kernel"), True),
            ("ep_p3_b", ("emotion_prior_bias", "prior_net.3", "bias"), False),
            ("ep_vq_w", ("emotion_prior_bias", "v_query_bias", "kernel"), True),
            ("ep_vq_b", ("emotion_prior_bias", "v_query_bias", "bias"), False),
            ("ep_ak_w", ("emotion_prior_bias", "a_key_bias", "kernel"), True),
            ("ep_ak_b", ("emotion_prior_bias", "a_key_bias", "bias"), False),
            ("ep_aq_w", ("emotion_prior_bias", "a_query_bias", "kernel"), True),
            ("ep_aq_b", ("emotion_prior_bias", "a_query_bias", "bias"), False),
            ("ep_vk_w", ("emotion_prior_bias", "v_key_bias", "kernel"), True),
            ("ep_vk_b", ("emotion_prior_bias", "v_key_bias", "bias"), False),
            ("ep_scale", ("emotion_prior_bias", "bias_scale"), False),
        ]
    if spec.pooling == "attn":
        for stream in ("v", "a"):
            mod = f"{stream}_temporal_pool"
            t += [
                (f"{stream}p_ln_s", (mod, "pool", "score.0", "scale"), False),
                (f"{stream}p_ln_b", (mod, "pool", "score.0", "bias"), False),
                (f"{stream}p_w1", (mod, "pool", "score.1", "kernel"), True),
                (f"{stream}p_b1", (mod, "pool", "score.1", "bias"), False),
                (f"{stream}p_w2", (mod, "pool", "score.4", "kernel"), True),
                (f"{stream}p_b2", (mod, "pool", "score.4", "bias"), False),
            ]
    if spec.head == "concat":
        t += [
            ("h_w1", ("xattn_mlp.0", "kernel"), True),
            ("h_b1", ("xattn_mlp.0", "bias"), False),
            ("h_w2", ("xattn_mlp.3", "kernel"), True),
            ("h_b2", ("xattn_mlp.3", "bias"), False),
        ]
    else:
        t += [
            ("g_w1", ("xattn_gate.0", "kernel"), True),
            ("g_b1", ("xattn_gate.0", "bias"), False),
            ("g_w2", ("xattn_gate.3", "kernel"), True),
            ("g_b2", ("xattn_gate.3", "bias"), False),
            ("c_w", ("xattn_classifier", "kernel"), True),
            ("c_b", ("xattn_classifier", "bias"), False),
        ]
    return t


def _tree_get(params, path):
    node = params
    for key in path:
        node = node[key]
    return node


def extract_block_params(
    params,
    spec: FusedBlockSpec,
    dequant_scales: Optional[Dict[Tuple[str, ...], np.ndarray]] = None,
) -> Tuple[List[jnp.ndarray], Tuple[Tuple[str, bool], ...]]:
    """FusionModel param tree -> (ordered kernel args, static arg layout).

    The layout tuple records, per kernel argument, its name and whether it is
    an int8-quantized matrix followed by its scale row; it is hashable so it
    can parameterize the jitted builder statically.

    `dequant_scales` maps flattened ("params", ..., "kernel") paths to scale
    rows (JaxModelRunner._quantize_dense_int8 layout); matching matrices stay
    int8 and the scale rides along as an extra argument.
    """
    dequant_scales = dequant_scales or {}
    args: List[jnp.ndarray] = []
    layout: List[Tuple[str, bool]] = []
    for name, path, is_matrix in _param_table(spec):
        leaf = _tree_get(params, path)
        full_path = ("params",) + path
        scale = dequant_scales.get(full_path) if is_matrix else None
        if scale is not None:
            args.append(jnp.asarray(leaf))  # int8 [in, out]
            args.append(jnp.asarray(scale, jnp.float32))  # [1, out]
            layout.append((name, True))
        else:
            arr = jnp.asarray(leaf)
            if arr.dtype != jnp.int8:
                arr = arr.astype(jnp.float32)
            args.append(arr)
            layout.append((name, False))
    return args, tuple(layout)


# ---------------------------------------------------------------------------
# kernel body helpers (trace-time python over VMEM values)
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dotf(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mha(q_in, kv_in, w_in, b_in, w_out, b_out, bias, spec: FusedBlockSpec):
    """torch-semantics multi-head attention on 2D tiles ([Tq,d] x [Tk,d])."""
    d = spec.d_model
    h = spec.num_heads
    dh = d // h
    scale = dh**-0.5
    q = _dotf(q_in, w_in[:, :d]) + b_in[:d]
    k = _dotf(kv_in, w_in[:, d : 2 * d]) + b_in[d : 2 * d]
    v = _dotf(kv_in, w_in[:, 2 * d :]) + b_in[2 * d :]
    tq, tk = q.shape[0], k.shape[0]
    if spec.batched_heads:
        # One batched contraction over the head dim instead of a per-head
        # python loop: [h, tq, dh] x [h, tk, dh] -> [h, tq, tk].
        qh = (q * scale).reshape(tq, h, dh).transpose(1, 0, 2)
        kh = k.reshape(tk, h, dh).transpose(1, 0, 2)
        vh = v.reshape(tk, h, dh).transpose(1, 0, 2)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if bias is not None:
            scores = scores + bias[None, :, :]
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [h, tq, dh]
        attn = ctx.transpose(1, 0, 2).reshape(tq, d)
    else:
        outs = []
        for i in range(h):
            sl = slice(i * dh, (i + 1) * dh)
            scores = _dotf(q[:, sl] * scale, k[:, sl].T)
            if bias is not None:
                scores = scores + bias
            outs.append(_dotf(jax.nn.softmax(scores, axis=-1), v[:, sl]))
        attn = jnp.concatenate(outs, axis=1)
    return _dotf(attn, w_out) + b_out


def _attn_pool(x, ln_s, ln_b, w1, b1, w2, b2):
    """TemporalAttentionPooling (reference `src/models/temporal.py:9-26`)."""
    s = _layer_norm(x, ln_s, ln_b)
    s = jax.nn.gelu(_dotf(s, w1) + b1, approximate=False)
    s = (_dotf(s, w2) + b2)[:, 0]
    w = jax.nn.softmax(s, axis=0)
    return jnp.sum(x * w[:, None], axis=0)


def _prior_bias(v, a, p, spec: FusedBlockSpec):
    """EmotionPriorBiasAdapter math (reference `src/models/fusion.py:153-184`)
    on single-sample tiles."""
    pooled = jnp.concatenate([jnp.mean(v, axis=0), jnp.mean(a, axis=0)])[None, :]
    hidden = jax.nn.relu(_dotf(pooled, p["ep_p0_w"]) + p["ep_p0_b"])
    prior = _dotf(hidden, p["ep_p3_w"]) + p["ep_p3_b"]  # [1, pdim]
    scale = p["ep_scale"].reshape(())

    def scores(tokens, w, b):
        pb = jnp.broadcast_to(prior, (tokens.shape[0], prior.shape[1]))
        return (_dotf(jnp.concatenate([tokens, pb], axis=1), w) + b)[:, 0]

    vq = scores(v, p["ep_vq_w"], p["ep_vq_b"])
    ak = scores(a, p["ep_ak_w"], p["ep_ak_b"])
    aq = scores(a, p["ep_aq_w"], p["ep_aq_b"])
    vk = scores(v, p["ep_vk_w"], p["ep_vk_b"])
    v2a = jnp.tanh(vq[:, None] + ak[None, :]) * scale
    a2v = jnp.tanh(aq[:, None] + vk[None, :]) * scale
    return v2a, a2v


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _block_kernel(spec: FusedBlockSpec, layout, v_ref, a_ref, *param_refs):
    out_ref = param_refs[-1]
    refs = param_refs[:-1]
    # Materialize parameters: int8 matrices dequantize on read — XLA fuses
    # the convert+scale into the consuming matmul.
    p: Dict[str, jnp.ndarray] = {}
    i = 0
    for name, quantized in layout:
        if quantized:
            p[name] = refs[i][...].astype(jnp.float32) * refs[i + 1][...]
            i += 2
        else:
            p[name] = refs[i][...]
            i += 1

    v_feat = v_ref[0]  # [T, Dv]
    a_seq = a_ref[0]  # [Ta, Ds]

    v = _dotf(v_feat, p["vin_w"]) + p["vin_b"]
    a = _dotf(_dotf(a_seq, p["aseq_w"]) + p["aseq_b"], p["ain_w"]) + p["ain_b"]

    v2a_bias = a2v_bias = None
    if spec.use_prior:
        v2a_bias, a2v_bias = _prior_bias(v, a, p, spec)

    v2 = _mha(
        v, a, p["v2a_in_w"], p["v2a_in_b"], p["v2a_out_w"], p["v2a_out_b"],
        v2a_bias, spec,
    )
    v_new = _layer_norm(v + v2, p["vn_s"], p["vn_b"])
    # Reference ordering quirk: a2v consumes the UPDATED video tokens.
    a2 = _mha(
        a, v_new, p["a2v_in_w"], p["a2v_in_b"], p["a2v_out_w"], p["a2v_out_b"],
        a2v_bias, spec,
    )
    a_new = _layer_norm(a + a2, p["an_s"], p["an_b"])

    if spec.pooling == "attn":
        v_emb = _attn_pool(
            v_new, p["vp_ln_s"], p["vp_ln_b"], p["vp_w1"], p["vp_b1"],
            p["vp_w2"], p["vp_b2"],
        )
        a_emb = _attn_pool(
            a_new, p["ap_ln_s"], p["ap_ln_b"], p["ap_w1"], p["ap_b1"],
            p["ap_w2"], p["ap_b2"],
        )
    else:
        v_emb = jnp.mean(v_new, axis=0)
        a_emb = jnp.mean(a_new, axis=0)

    fused_in = jnp.concatenate([v_emb, a_emb])[None, :]  # [1, 2d]
    if spec.head == "concat":
        hidden = jax.nn.relu(_dotf(fused_in, p["h_w1"]) + p["h_b1"])
        logits = _dotf(hidden, p["h_w2"]) + p["h_b2"]
    else:
        g = jax.nn.sigmoid(
            _dotf(jax.nn.relu(_dotf(fused_in, p["g_w1"]) + p["g_b1"]), p["g_w2"])
            + p["g_b2"]
        )
        fused = g * v_emb[None, :] + (1.0 - g) * a_emb[None, :]
        logits = _dotf(fused, p["c_w"]) + p["c_b"]

    padded = jnp.zeros((1, _LANES), jnp.float32)
    out_ref[0] = jax.lax.dynamic_update_slice(padded, logits, (0, 0))


def build_fused_block_fn(spec: FusedBlockSpec, layout, interpret: bool = False):
    """-> fn(v_feat [B,T,Dv], a_seq [B,Ta,Ds], *param_args) -> logits [B,C].

    `layout` must be the static tuple returned by extract_block_params for
    the same spec/quantization pattern.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fn(v_feat, a_seq, *param_args):
        b, t, dv = v_feat.shape
        ta, ds = a_seq.shape[1], a_seq.shape[2]

        def const_spec(arr):
            shape = arr.shape if arr.ndim else (1,)
            return pl.BlockSpec(
                shape, lambda i, _s=shape: tuple(0 for _ in _s),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            pl.BlockSpec((1, t, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta, ds), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in param_args]
        param_args = [a.reshape(1) if a.ndim == 0 else a for a in param_args]

        out = pl.pallas_call(
            functools.partial(_block_kernel, spec, layout),
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, 1, _LANES), jnp.float32),
            interpret=interpret,
        )(v_feat.astype(jnp.float32), a_seq.astype(jnp.float32), *param_args)
        return out[:, 0, : spec.num_classes]

    return fn
