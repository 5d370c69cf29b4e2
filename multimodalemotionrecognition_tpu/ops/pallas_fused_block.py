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

Hardware parity: mean-pooled variants are BIT-EXACT vs the modular XLA graph
on real TPU.  attn-pooled variants differ by ~1e-3 on logits — measured
against a float64 CPU ground truth, the kernel is CLOSER to the true answer
(2.3e-3) than the modular XLA path (3.0e-3); the mutual deviation is the
rounding-noise floor of DEFAULT-precision (single-pass bf16) MXU matmuls
scheduled differently, not an error in either path.  Narrow K=1/N=1 dots
(attention-pool score Dense(1), emotion-prior token scores and outer sums)
are pinned to Precision.HIGHEST because XLA computes those exactly while
Mosaic would route them through a single bf16 MXU pass (was 1.6e-3 extra
deviation); wide matmuls stay DEFAULT to match the modular path's precision.
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
    d = spec.d_model
    for name, path, is_matrix in _param_table(spec):
        leaf = _tree_get(params, path)
        full_path = ("params",) + path
        scale = dequant_scales.get(full_path) if is_matrix else None
        if name.endswith("_in_w"):
            # Packed qkv weight [d, 3d] split into three [d, d] matrices
            # outside the kernel (same lane-slice constraint as the bias).
            mat = jnp.asarray(leaf)
            srow = None if scale is None else jnp.asarray(scale, jnp.float32)
            if srow is None and mat.dtype != jnp.int8:
                mat = mat.astype(jnp.float32)
            for part, sl in (("q", slice(0, d)), ("k", slice(d, 2 * d)),
                             ("v", slice(2 * d, 3 * d))):
                args.append(mat[:, sl])
                if srow is not None:
                    args.append(srow[:, sl])
                layout.append((f"{name}{part}", srow is not None))
        elif scale is not None:
            args.append(jnp.asarray(leaf))  # int8 [in, out]
            args.append(jnp.asarray(scale, jnp.float32))  # [1, out]
            layout.append((name, True))
        elif name.endswith("_in_b"):
            # Packed qkv bias [3d] split into three [d] rows OUTSIDE the
            # kernel: Mosaic cannot broadcast a lane-sliced row (the
            # "Invalid input layout" vector.broadcast failure on hardware).
            arr = jnp.asarray(leaf).astype(jnp.float32)
            for part, sl in (("q", slice(0, d)), ("k", slice(d, 2 * d)),
                             ("v", slice(2 * d, 3 * d))):
                args.append(arr[sl])
                layout.append((f"{name}{part}", False))
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


def _dot_nt(a, b, precision=None):
    """a [M,K] x b [N,K] -> [M,N] without materializing a transpose (the MXU
    takes the contraction directly; Mosaic has no cheap 2-D transpose)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


def _dot_tn(a, b, precision=None):
    """a [K,M] x b [K,N] -> [M,N] (contract the SUBLANE dim of both) —
    used for per-sample segment reductions against a membership matrix."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )


_HI = jax.lax.Precision.HIGHEST


def _assign_matrix(s: int, t_len: int):
    """[s*t_len, s] one-hot float sample-membership matrix for flattened
    [s*t_len, d] token blocks.  Built from iota + multiply + compare (no
    integer division — Mosaic-safe); row i belongs to sample i // t_len."""
    r = jax.lax.broadcasted_iota(jnp.int32, (s * t_len, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s * t_len, s), 1) * t_len
    return ((r >= c) & (r < c + t_len)).astype(jnp.float32)


def _dot_hi(a, b):
    """HIGHEST-precision dot for NARROW contractions (K=1 or N=1 score/outer
    products).  XLA computes these exactly on the VPU in the modular graph,
    but Mosaic routes every dot through the MXU at default single-pass-bf16
    precision — measured 1.6e-3 logit deviation on hardware for the attn-pool
    and emotion-prior paths until these dots were pinned to HIGHEST."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _mha(q_in, kv_in, wq, bq, wk, bk, wv, bv, w_out, b_out, bias,
         spec: FusedBlockSpec):
    """torch-semantics multi-head attention on 2D tiles ([Tq,d] x [Tk,d]).

    Head separation uses LANE MASKS, not reshapes: Mosaic cannot lower a
    [T, d] -> [T, h, dh] lane-splitting reshape ("unsupported shape cast" on
    real TPU hardware), so per-head scores are computed as
    (q * mask_h) . k^T — the zeroed lanes kill cross-head terms, giving
    exactly q_h . k_h^T while every operand stays [*, d].  Extra FLOPs are
    h* the score/context matmuls, which are ~1% of the block (the
    projections dominate); in exchange nothing leaves the 128-lane layout.
    The packed torch in_proj weight/bias arrive pre-split per q/k/v
    (extract_block_params) because Mosaic cannot broadcast or contract
    lane-sliced values.
    """
    d = spec.d_model
    h = spec.num_heads
    dh = d // h
    scale = dh**-0.5
    q = _dotf(q_in, wq) + bq
    k = _dotf(kv_in, wk) + bk
    v = _dotf(kv_in, wv) + bv
    tq = q.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    ctx = jnp.zeros((tq, d), jnp.float32)
    for i in range(h):
        mask = ((lane >= i * dh) & (lane < (i + 1) * dh)).astype(jnp.float32)
        scores = _dot_nt(q * (scale * mask), k)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = ctx + _dotf(probs, v * mask)
    return _dotf(ctx, w_out) + b_out


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — f32 noise
    floor): Mosaic has no erf/erfc lowering, so exact-GELU needs its own."""
    sign = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    """torch nn.GELU() (erf form, reference `src/models/temporal.py:16`)."""
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def _attn_pool(x, ln_s, ln_b, w1, b1, w2, b2):
    """TemporalAttentionPooling (reference `src/models/temporal.py:9-26`).

    Everything stays 2-D ([T,1] scores, [1,d] output) — Mosaic wants rank-2
    vectors; sublane (axis-0) reductions lower fine."""
    s = _layer_norm(x, ln_s, ln_b)
    s = _gelu_exact(_dotf(s, w1) + b1)
    s = _dot_hi(s, w2) + b2  # [T, 1]
    w = jax.nn.softmax(s, axis=0)
    return jnp.sum(x * w, axis=0, keepdims=True)  # [1, d]


def _prior_bias(v, a, p, spec: FusedBlockSpec):
    """EmotionPriorBiasAdapter math (reference `src/models/fusion.py:153-184`)
    on single-sample tiles.

    The token-score broadcasts vq[i] + ak[j] are built with rank-2 outer
    products against a ones column ([T,1] x [T',1] contractions) instead of
    1-D indexing/transposes, which Mosaic cannot lower."""
    pooled = jnp.concatenate(
        [jnp.mean(v, axis=0, keepdims=True), jnp.mean(a, axis=0, keepdims=True)],
        axis=1,
    )  # [1, 2d]
    hidden = jax.nn.relu(_dotf(pooled, p["ep_p0_w"]) + p["ep_p0_b"])
    prior = _dotf(hidden, p["ep_p3_w"]) + p["ep_p3_b"]  # [1, pdim]
    scale = p["ep_scale"].reshape((1, 1))

    def scores(tokens, w, b):
        # tokens [T, d]; w [d + pdim, 1] -> token part + constant prior part.
        t_part = _dot_hi(tokens, w[: tokens.shape[1], :])
        p_part = _dot_hi(prior, w[tokens.shape[1] :, :])
        return t_part + p_part + b  # [T, 1]

    def outer_sum(qs, ks):
        # qs [Tq,1], ks [Tk,1] -> qs[i] + ks[j] as two rank-1 matmuls.
        ones_q = jnp.ones_like(qs)
        ones_k = jnp.ones_like(ks)
        hi = jax.lax.Precision.HIGHEST
        return _dot_nt(qs, ones_k, hi) + _dot_nt(ones_q, ks, hi)

    vq = scores(v, p["ep_vq_w"], p["ep_vq_b"])
    ak = scores(a, p["ep_ak_w"], p["ep_ak_b"])
    aq = scores(a, p["ep_aq_w"], p["ep_aq_b"])
    vk = scores(v, p["ep_vk_w"], p["ep_vk_b"])
    v2a = jnp.tanh(outer_sum(vq, ak)) * scale
    a2v = jnp.tanh(outer_sum(aq, vk)) * scale
    return v2a, a2v


# ---------------------------------------------------------------------------
# batched (multi-sample-per-program) helpers
#
# The S=1 kernel launches one grid program per sample; at throughput batch
# the per-program overhead and 8/149-row matmuls dominate (219 us vs the
# modular XLA graph's 53 us at b64 — RESULTS.md).  The batched variant packs
# S samples into one program over FLATTENED token blocks ([S*T, d]) so the
# projections — ~90% of the block's FLOPs — run as S-times-taller MXU
# matmuls, and the whole working set still lives in VMEM (zero intermediate
# HBM round trips, which is what bounds the modular path).  Cross-sample
# attention terms are killed with an additive -1e30 membership mask; all
# per-sample reductions (means, attn-pool softmax, prior pooling) become
# matmuls against a 0/1 membership matrix at HIGHEST precision (exact).
# ---------------------------------------------------------------------------


def _mean_pool_batched(x, P, t_len: int):
    """x [S*t, d], P [S*t, S] -> per-sample means [S, d] (exact: 0/1 weights
    at HIGHEST precision)."""
    return _dot_tn(P, x, _HI) / float(t_len)


def _attn_pool_batched(x, P, ln_s, ln_b, w1, b1, w2, b2):
    """TemporalAttentionPooling over flattened samples: per-sample softmax
    via membership-matrix max/sum (numerically identical to the per-sample
    path — the max subtracted is each sample's own max)."""
    s = _layer_norm(x, ln_s, ln_b)
    s = _gelu_exact(_dotf(s, w1) + b1)
    s = _dot_hi(s, w2) + b2  # [S*t, 1]
    col = P * s + (P - 1.0) * 1e30  # [S*t, S]; non-members -> -1e30
    maxes = jnp.max(col, axis=0, keepdims=True)  # [1, S] per-sample max
    mx = _dot_nt(P, maxes, _HI)  # [S*t, 1] own-sample max per row
    e = jnp.exp(s - mx)
    denom = _dot_tn(P, e, _HI)  # [S, 1] per-sample sums
    w = e / _dot_hi(P, denom)  # [S*t, 1] softmax weights
    return _dot_tn(P, x * w, _HI)  # [S, d] weighted sums


def _prior_bias_batched(v, a, Pv, Pa, t: int, ta: int, p,
                        spec: FusedBlockSpec):
    """EmotionPriorBiasAdapter on flattened samples -> full [S*T, S*Ta] /
    [S*Ta, S*T] additive biases.  Cross-sample entries carry garbage (tanh-
    bounded) and are annihilated by the -1e30 membership mask added on top."""
    pooled = jnp.concatenate(
        [_mean_pool_batched(v, Pv, t), _mean_pool_batched(a, Pa, ta)], axis=1
    )  # [S, 2d]
    hidden = jax.nn.relu(_dotf(pooled, p["ep_p0_w"]) + p["ep_p0_b"])
    prior = _dotf(hidden, p["ep_p3_w"]) + p["ep_p3_b"]  # [S, pdim]
    scale = p["ep_scale"].reshape((1, 1))

    def scores(tokens, P, w, b):
        # tokens [S*t, d]; w [d + pdim, 1]; the prior part is per-sample and
        # broadcast back to token rows through the membership matrix.
        t_part = _dot_hi(tokens, w[: tokens.shape[1], :])  # [S*t, 1]
        p_part = _dot_hi(prior, w[tokens.shape[1] :, :])  # [S, 1]
        return t_part + _dot_hi(P, p_part) + b

    def outer_sum(qs, ks):
        ones_q = jnp.ones_like(qs)
        ones_k = jnp.ones_like(ks)
        return _dot_nt(qs, ones_k, _HI) + _dot_nt(ones_q, ks, _HI)

    vq = scores(v, Pv, p["ep_vq_w"], p["ep_vq_b"])
    ak = scores(a, Pa, p["ep_ak_w"], p["ep_ak_b"])
    aq = scores(a, Pa, p["ep_aq_w"], p["ep_aq_b"])
    vk = scores(v, Pv, p["ep_vk_w"], p["ep_vk_b"])
    v2a = jnp.tanh(outer_sum(vq, ak)) * scale
    a2v = jnp.tanh(outer_sum(aq, vk)) * scale
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
        v, a, p["v2a_in_wq"], p["v2a_in_bq"], p["v2a_in_wk"], p["v2a_in_bk"],
        p["v2a_in_wv"], p["v2a_in_bv"], p["v2a_out_w"], p["v2a_out_b"],
        v2a_bias, spec,
    )
    v_new = _layer_norm(v + v2, p["vn_s"], p["vn_b"])
    # Reference ordering quirk: a2v consumes the UPDATED video tokens.
    a2 = _mha(
        a, v_new, p["a2v_in_wq"], p["a2v_in_bq"], p["a2v_in_wk"], p["a2v_in_bk"],
        p["a2v_in_wv"], p["a2v_in_bv"], p["a2v_out_w"], p["a2v_out_b"],
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
        v_emb = jnp.mean(v_new, axis=0, keepdims=True)  # [1, d]
        a_emb = jnp.mean(a_new, axis=0, keepdims=True)

    fused_in = jnp.concatenate([v_emb, a_emb], axis=1)  # [1, 2d]
    if spec.head == "concat":
        hidden = jax.nn.relu(_dotf(fused_in, p["h_w1"]) + p["h_b1"])
        logits = _dotf(hidden, p["h_w2"]) + p["h_b2"]
    else:
        g = jax.nn.sigmoid(
            _dotf(jax.nn.relu(_dotf(fused_in, p["g_w1"]) + p["g_b1"]), p["g_w2"])
            + p["g_b2"]
        )
        fused = g * v_emb + (1.0 - g) * a_emb
        logits = _dotf(fused, p["c_w"]) + p["c_b"]

    # Static concatenate instead of dynamic_update_slice: Mosaic has no
    # TC lowering for the latter (caught compiling on real TPU hardware).
    pad = jnp.zeros((1, _LANES - logits.shape[1]), jnp.float32)
    out_ref[0] = jnp.concatenate([logits, pad], axis=1)


def _block_kernel_batched(
    spec: FusedBlockSpec, layout, s: int, t: int, ta: int,
    v_ref, a_ref, *param_refs,
):
    """S-samples-per-program variant over flattened token blocks
    (v [S*T, Dv], a [S*Ta, Ds] -> logits [S, _LANES])."""
    out_ref = param_refs[-1]
    refs = param_refs[:-1]
    p: Dict[str, jnp.ndarray] = {}
    i = 0
    for name, quantized in layout:
        if quantized:
            p[name] = refs[i][...].astype(jnp.float32) * refs[i + 1][...]
            i += 2
        else:
            p[name] = refs[i][...]
            i += 1

    v_feat = v_ref[...]  # [S*T, Dv]
    a_seq = a_ref[...]  # [S*Ta, Ds]

    v = _dotf(v_feat, p["vin_w"]) + p["vin_b"]
    a = _dotf(_dotf(a_seq, p["aseq_w"]) + p["aseq_b"], p["ain_w"]) + p["ain_b"]

    Pv = _assign_matrix(s, t)
    Pa = _assign_matrix(s, ta)
    # Additive attention masks: 0 within a sample, -1e30 across samples.
    mask_va = (_dot_nt(Pv, Pa, _HI) - 1.0) * 1e30  # [S*T, S*Ta]
    mask_av = (_dot_nt(Pa, Pv, _HI) - 1.0) * 1e30  # [S*Ta, S*T]

    v2a_bias, a2v_bias = mask_va, mask_av
    if spec.use_prior:
        pv2a, pa2v = _prior_bias_batched(v, a, Pv, Pa, t, ta, p, spec)
        v2a_bias = pv2a + mask_va
        a2v_bias = pa2v + mask_av

    v2 = _mha(
        v, a, p["v2a_in_wq"], p["v2a_in_bq"], p["v2a_in_wk"], p["v2a_in_bk"],
        p["v2a_in_wv"], p["v2a_in_bv"], p["v2a_out_w"], p["v2a_out_b"],
        v2a_bias, spec,
    )
    v_new = _layer_norm(v + v2, p["vn_s"], p["vn_b"])
    # Reference ordering quirk: a2v consumes the UPDATED video tokens.
    a2 = _mha(
        a, v_new, p["a2v_in_wq"], p["a2v_in_bq"], p["a2v_in_wk"],
        p["a2v_in_bk"], p["a2v_in_wv"], p["a2v_in_bv"], p["a2v_out_w"],
        p["a2v_out_b"], a2v_bias, spec,
    )
    a_new = _layer_norm(a + a2, p["an_s"], p["an_b"])

    if spec.pooling == "attn":
        v_emb = _attn_pool_batched(
            v_new, Pv, p["vp_ln_s"], p["vp_ln_b"], p["vp_w1"], p["vp_b1"],
            p["vp_w2"], p["vp_b2"],
        )
        a_emb = _attn_pool_batched(
            a_new, Pa, p["ap_ln_s"], p["ap_ln_b"], p["ap_w1"], p["ap_b1"],
            p["ap_w2"], p["ap_b2"],
        )
    else:
        v_emb = _mean_pool_batched(v_new, Pv, t)  # [S, d]
        a_emb = _mean_pool_batched(a_new, Pa, ta)

    fused_in = jnp.concatenate([v_emb, a_emb], axis=1)  # [S, 2d]
    if spec.head == "concat":
        hidden = jax.nn.relu(_dotf(fused_in, p["h_w1"]) + p["h_b1"])
        logits = _dotf(hidden, p["h_w2"]) + p["h_b2"]
    else:
        g = jax.nn.sigmoid(
            _dotf(jax.nn.relu(_dotf(fused_in, p["g_w1"]) + p["g_b1"]), p["g_w2"])
            + p["g_b2"]
        )
        fused = g * v_emb + (1.0 - g) * a_emb
        logits = _dotf(fused, p["c_w"]) + p["c_b"]

    pad = jnp.zeros((s, _LANES - logits.shape[1]), jnp.float32)
    out_ref[...] = jnp.concatenate([logits, pad], axis=1)


def build_fused_block_fn(
    spec: FusedBlockSpec,
    layout,
    interpret: bool = False,
    samples_per_program: int = 8,
):
    """-> fn(v_feat [B,T,Dv], a_seq [B,Ta,Ds], *param_args) -> logits [B,C].

    `layout` must be the static tuple returned by extract_block_params for
    the same spec/quantization pattern.

    `samples_per_program` packs up to that many samples into one grid
    program (largest divisor of B is used; 1 falls back to the original
    per-sample kernel).  Batching amortizes per-program overhead and turns
    the projections into S-times-taller MXU matmuls — the per-sample kernel
    loses to the modular XLA graph at throughput batch for exactly these
    reasons (RESULTS.md).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fn(v_feat, a_seq, *param_args):
        b, t, dv = v_feat.shape
        ta, ds = a_seq.shape[1], a_seq.shape[2]
        # Mosaic wants rank-2 vectors: biases/scales/scalars go in as [1, N].
        param_args = [a.reshape(1, -1) if a.ndim <= 1 else a for a in param_args]

        def const_spec(arr):
            shape = arr.shape
            return pl.BlockSpec(
                shape, lambda i, _s=shape: tuple(0 for _ in _s),
                memory_space=pltpu.VMEM,
            )

        # Mosaic constraint: a block's sublane (second-to-last) dim must be
        # divisible by 8 (or equal the full array dim), so S*T and S*Ta must
        # both be multiples of 8 — with Ta=149 (odd) that means S itself a
        # multiple of 8.  Fall back to the per-sample kernel otherwise.
        s = max(1, min(samples_per_program, b))
        while s > 1 and (b % s or (s * t) % 8 or (s * ta) % 8):
            s -= 1
        if s > 1:
            # Flattened [B*T, Dv] / [B*Ta, Ds] row blocks of S samples each;
            # the leading-dim collapse is a free row-major reshape in XLA.
            in_specs = [
                pl.BlockSpec((s * t, dv), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s * ta, ds), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + [const_spec(a) for a in param_args]
            out = pl.pallas_call(
                functools.partial(_block_kernel_batched, spec, layout, s, t, ta),
                grid=(b // s,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (s, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
                # The a-side block alone is S*149*768*4 ~= 3.7 MB at S=8;
                # with double-buffering plus the VMEM-resident intermediates
                # the program exceeds Mosaic's default 16 MB scoped-vmem cap.
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                interpret=interpret,
            )(
                v_feat.astype(jnp.float32).reshape(b * t, dv),
                a_seq.astype(jnp.float32).reshape(b * ta, ds),
                *param_args,
            )
            return out[:, : spec.num_classes]

        in_specs = [
            pl.BlockSpec((1, t, dv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ta, ds), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(a) for a in param_args]

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
