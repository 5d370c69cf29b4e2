"""WavLM-base speech encoder in Flax, numerically matching HF transformers.

The reference wraps `transformers.WavLMModel` ("microsoft/wavlm-base") with a
temporal pooler and an MLP head, plus two-stage finetuning helpers
(`src/models/wavlm_audio.py:13-183`).  This is a from-scratch JAX
implementation of that architecture — 7-layer conv feature extractor
(group-norm on the first layer), feature projection, weight-normed positional
conv embedding, and 12 post-norm transformer layers with WavLM's *gated
relative position bias*: the T5-style bucketed relative bias is computed once
(layer 0 owns the bucket embedding) and every layer modulates it with a
per-head, per-query gate derived from its inputs
(HF `WavLMAttention.forward`; paper: WavLM, Chen et al., 2022).

Parameter tree mirrors HF torch state-dict paths under `wavlm.` so reference
checkpoints convert with the generic converter (weight-norm on the positional
conv is merged into a plain kernel by `normalize_torch_state_dict`).

TPU notes: all shapes are static (3 s @ 16 kHz -> 149 frames); the relative
position buckets are a compile-time numpy constant; attention lowers to batched
MXU matmuls; masking (train-time SpecAugment-style span masking with
`masked_spec_embed`) uses an explicit "wavlm_mask" RNG stream.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodalemotionrecognition_tpu.ops.activations import gelu_erf
from multimodalemotionrecognition_tpu.models.temporal import TemporalPooler

__all__ = ["WavLMConfig", "WavLMModel", "WavLMAudioEncoder"]


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """microsoft/wavlm-base hyperparameters (HF WavLMConfig defaults)."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    apply_spec_augment: bool = True
    # HF WavLMEncoder LayerDrop (Fan et al. 2019): during training each
    # encoder layer i>0 is skipped for the WHOLE batch with this probability
    # (one scalar draw per layer per step, `torch.rand([])` in HF).  The
    # reference trains with module.training=True even while the backbone is
    # frozen (`src/models/wavlm_audio.py:165-183` only wraps in no_grad), so
    # LayerDrop is active in its training regime.  Needs a "layerdrop" RNG
    # stream; silently off without one (eval/parity paths unaffected).  We
    # select with `where` instead of branching: XLA traces a static graph,
    # so the skipped layer is still computed — identical distribution, no
    # data-dependent control flow.
    layerdrop: float = 0.1
    # Eval-path attention core: "auto" = fused Pallas kernel when running on
    # TPU (ops/pallas_wavlm_attn.py), modular XLA otherwise; True/False force;
    # "interpret" forces the kernel in interpreter mode (CPU tests).
    fused_attention: object = "auto"
    # Eval-path conv feature extractor: fused Pallas conv+GELU chain
    # (ops/pallas_conv_fe.py) for the wide-K layers; same flag semantics.
    fused_conv: object = "auto"
    # Train-path fused kernels.  fused_train_layers: leading encoder layers
    # allowed to run the fused attention sublayer (with in-kernel dropout)
    # during training — the kernel has a custom VJP (flash-style recompute
    # backward), so this may include TRAINABLE layers; the trainer sets it
    # to the full stack.  fused_train_conv: allow the fused conv chain
    # during training — it has NO VJP, so the trainer only sets it when the
    # freeze policy keeps the conv FE frozen in every stage of the run
    # (train/freeze.py::wavlm_frozen_prefix; it is then stop-gradient'd
    # end-to-end and no backward is requested).  Both still honor the
    # fused_attention/fused_conv platform gates above.
    fused_train_layers: int = 0
    fused_train_conv: bool = False
    # NOTE: a fused feed-forward sublayer kernel (custom VJP, flash-style
    # recompute backward) was prototyped in round 3 and REMOVED in round 4
    # after hardware measurement: stage-2 train step b64 bf16 was ~10%
    # SLOWER with it in two independent A/B sessions (benchmarks/RESULTS.md
    # round-4 section) — XLA already runs the MLP matmuls at ~143 TFLOP/s
    # (roofline) and fuses the GELU/dropout/LN glue. Same conclusion as the
    # full-block fusion kernel: don't hand-schedule what XLA already fuses.


def _relative_position_buckets(
    query_length: int, key_length: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """T5-style bidirectional relative position bucketing
    (HF `WavLMAttention._relative_positions_bucket`). Static -> numpy."""
    context = np.arange(query_length)[:, None]
    memory = np.arange(key_length)[None, :]
    relative = memory - context

    nb = num_buckets // 2
    buckets = (relative > 0).astype(np.int64) * nb
    rel_abs = np.abs(relative)

    max_exact = nb // 2
    is_small = rel_abs < max_exact
    with np.errstate(divide="ignore"):
        rel_large = np.log(np.maximum(rel_abs, 1).astype(np.float64) / max_exact)
    rel_large = rel_large / math.log(max_distance / max_exact)
    rel_large = (max_exact + rel_large * (nb - max_exact)).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)

    buckets += np.where(is_small, rel_abs, rel_large)
    return buckets


def _resolve_fused(flag, train: bool) -> bool:
    """Resolve a fused-kernel config flag.  "auto" enables the kernel only
    for single-device TPU eval (a pallas_call inside a sharded jit is not
    automatically partitioned; multi-chip users opt in explicitly with
    flag=True under shard_map).  The EMO_FUSED_WAVLM env var (0/1) overrides
    "auto" either way — an operational escape hatch."""
    if flag == "auto":
        env = os.environ.get("EMO_FUSED_WAVLM")
        if env is not None:
            return env == "1" and not train
        return (
            (not train)
            and jax.default_backend() == "tpu"
            and jax.device_count() == 1
        )
    return bool(flag)


class _DenseParamsOnly(nn.Module):
    """Declares nn.Dense-compatible params without running the matmul (the
    fused attention kernel consumes them directly; checkpoint tree and init
    distribution stay identical to nn.Dense)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LayerNormParamsOnly(nn.Module):
    """Declares nn.LayerNorm-compatible params (see _DenseParamsOnly)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class WavLMAttentionSelf(nn.Module):
    """WavLM self-attention with gated relative position bias."""

    config: WavLMConfig
    has_relative_position_bias: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        position_bias: Optional[jnp.ndarray],
        train: bool = False,
        fused_parts: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Modular mode (default): -> (attention output [B, T, E], bias).

        fused_parts mode (fused eval path): computes only the q/k/v
        projections and the gate, declares the out-projection params, and
        returns ((q, k, v, gate, wo, bo), position_bias) for the encoder
        layer to feed `ops/pallas_wavlm_attn.py` (which folds out-proj +
        residual + post-norm into the kernel)."""
        cfg = self.config
        dtype = self.dtype or hidden_states.dtype
        b, t, e = hidden_states.shape
        h = cfg.num_attention_heads
        dh = e // h

        if position_bias is None:
            if not self.has_relative_position_bias:
                raise ValueError("First layer must compute the position bias.")
            buckets = _relative_position_buckets(
                t, t, cfg.num_buckets, cfg.max_bucket_distance
            )
            rel_embed = nn.Embed(
                cfg.num_buckets, h, dtype=dtype, name="rel_attn_embed"
            )
            values = rel_embed(jnp.asarray(buckets))  # [T, T, H]
            position_bias = jnp.transpose(values, (2, 0, 1))  # [H, T, T]

        # Gate computed from the raw layer input (HF WavLMAttention lines
        # 165-180): per-head scalar per query position.
        gated = hidden_states.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        proj = nn.Dense(8, dtype=dtype, name="gru_rel_pos_linear")(gated)
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gates = jax.nn.sigmoid(proj)
        gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # [B, H, T, 1]
        const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, h, 1, 1)
        ).astype(dtype)
        gate_output = gate_a * (gate_b * const - 1.0) + 2.0  # [B, H, T, 1]

        q = nn.Dense(e, dtype=dtype, name="q_proj")(hidden_states)
        k = nn.Dense(e, dtype=dtype, name="k_proj")(hidden_states)
        v = nn.Dense(e, dtype=dtype, name="v_proj")(hidden_states)

        if fused_parts:
            wo, bo = _DenseParamsOnly(e, e, name="out_proj")()
            gate_f = gate_output.astype(jnp.float32).reshape(b, h * t, 1)
            parts = (q * (dh**-0.5), k, v, gate_f, wo.astype(dtype), bo)
            return parts, position_bias

        q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3) * (dh**-0.5)
        k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

        gated_bias = gate_output * position_bias[None].astype(dtype)
        scores = jnp.einsum(
            "bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32
        )
        scores = scores + gated_bias.astype(scores.dtype)
        attn = nn.softmax(scores, axis=-1).astype(dtype)
        attn = nn.Dropout(rate=cfg.attention_dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, e)
        out = nn.Dense(e, dtype=dtype, name="out_proj")(out)
        return out, position_bias


class WavLMEncoderLayer(nn.Module):
    """Post-norm transformer layer (HF WavLMEncoderLayer, base variant)."""

    config: WavLMConfig
    has_relative_position_bias: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        position_bias: Optional[jnp.ndarray],
        train: bool = False,
        seq_len: Optional[int] = None,
        fused: Optional[bool] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        dtype = self.dtype or hidden_states.dtype
        attention = WavLMAttentionSelf(
            config=cfg,
            has_relative_position_bias=self.has_relative_position_bias,
            dtype=dtype,
            name="attention",
        )
        if fused is None:  # standalone use; WavLMModel passes it explicitly
            fused = _resolve_fused(cfg.fused_attention, train)
        if fused:
            from multimodalemotionrecognition_tpu.ops.pallas_wavlm_attn import (
                wavlm_fused_attention_sublayer,
            )

            b, tp, e = hidden_states.shape
            parts, position_bias = attention(
                hidden_states, position_bias, train=False, fused_parts=True
            )
            qn, kn, vn, gate_f, wo, bo = parts
            lns, lnb = _LayerNormParamsOnly(e, name="layer_norm")()
            bias2d = position_bias.astype(jnp.float32).reshape(-1, tp)
            # Frozen-prefix training: the two dropout sites of the modular
            # sublayer (attention probs, projected output) run in-kernel.
            attn_p = cfg.attention_dropout if train else 0.0
            hid_p = cfg.hidden_dropout if train else 0.0
            if train and (attn_p > 0.0 or hid_p > 0.0):
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed = None
            hidden_states = wavlm_fused_attention_sublayer(
                hidden_states, qn, kn, vn, gate_f, bias2d, wo, bo, lns, lnb,
                num_heads=cfg.num_attention_heads,
                seq_len=seq_len if seq_len is not None else tp,
                eps=cfg.layer_norm_eps,
                attn_dropout=attn_p,
                hidden_dropout=hid_p,
                dropout_seed=seed,
                interpret=(cfg.fused_attention == "interpret"),
            )
        else:
            attn_out, position_bias = attention(
                hidden_states, position_bias, train=train
            )
            attn_out = nn.Dropout(
                rate=cfg.hidden_dropout, deterministic=not train
            )(attn_out)
            hidden_states = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=dtype, name="layer_norm"
            )(hidden_states + attn_out)

        # Feed-forward sublayer: plain XLA — a fused Pallas variant measured
        # ~10% slower on hardware and was removed (see WavLMConfig note).
        ff = nn.Dense(cfg.intermediate_size, dtype=dtype, name="feed_forward.intermediate_dense")(
            hidden_states
        )
        ff = gelu_erf(ff)
        ff = nn.Dropout(rate=cfg.activation_dropout, deterministic=not train)(ff)
        ff = nn.Dense(cfg.hidden_size, dtype=dtype, name="feed_forward.output_dense")(ff)
        ff = nn.Dropout(rate=cfg.hidden_dropout, deterministic=not train)(ff)
        hidden_states = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="final_layer_norm"
        )(hidden_states + ff)
        return hidden_states, position_bias


class WavLMModel(nn.Module):
    """HF WavLMModel equivalent: waveform [B, T_samples] -> hidden [B, T, 768]."""

    config: WavLMConfig = WavLMConfig()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_values: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        dtype = self.dtype or input_values.dtype

        # --- feature extractor: 7 strided conv1d layers, NWC layout.
        # Implemented as slice-decomposed matmuls (ops/audio_conv.py): XLA's
        # native strided-conv lowering runs ~60x slower on TPU for this stack.
        from multimodalemotionrecognition_tpu.ops.audio_conv import (
            strided_conv1d_valid,
        )

        # Param creation order matters for same-seed init reproducibility
        # (linen derives param RNG from creation order within a scope), so
        # keep the original interleaving: conv0, GN scale/bias, conv1, ...
        conv_ws = []
        gn_scale = gn_bias = None
        in_dim = 1
        for i, (dim, kernel) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
            conv_ws.append(
                self.param(
                    f"feature_extractor.conv_layers.{i}.conv.kernel",
                    nn.initializers.lecun_normal(),
                    (kernel, in_dim, dim),
                )
            )
            in_dim = dim
            if i == 0:
                gn_scale = self.param(
                    "feature_extractor.conv_layers.0.layer_norm.scale",
                    nn.initializers.ones,
                    (dim,),
                )
                gn_bias = self.param(
                    "feature_extractor.conv_layers.0.layer_norm.bias",
                    nn.initializers.zeros,
                    (dim,),
                )

        fused_conv = cfg.fused_conv
        if train and not cfg.fused_train_conv:
            # The conv kernels have no VJP: during training they require the
            # chain to be declared frozen (fused_train_conv, set by the
            # trainer from the freeze policy).
            fused_conv = False
        elif fused_conv == "auto":
            # Same conservative gate as fused_attention (see there),
            # including the EMO_FUSED_WAVLM override.  train-ness does not
            # enter the gate here: the chain is deterministic (no dropout),
            # so frozen-prefix training runs exactly the eval math.
            fused_conv = _resolve_fused("auto", False)
        fused_conv = fused_conv and all(
            k <= 2 * s
            for k, s in zip(cfg.conv_kernel[1:], cfg.conv_stride[1:])
        )

        if fused_conv:
            # Fused Pallas chain: each layer's GELU is applied by the NEXT
            # layer's kernel on tile load; padding rows flow through the
            # stack (physical row counts divide by every later stride) so no
            # intermediate pad/slice copies happen.  Eval path; the modular
            # branch below is the train/CPU path.
            from multimodalemotionrecognition_tpu.ops.pallas_conv_fe import (
                fused_conv_layer,
            )

            interp = cfg.fused_conv == "interpret"
            b, t_samples = input_values.shape
            k0, s0 = cfg.conv_kernel[0], cfg.conv_stride[0]
            t_log = (t_samples - k0) // s0 + 1
            prod_s = 1
            for s in cfg.conv_stride[1:]:
                prod_s *= s
            phys = -(-t_log // prod_s) * prod_s
            wav_len = (phys - 1) * s0 + k0
            # Compute dtype from the start: without this cast the whole conv
            # chain silently runs in the waveform's f32 (2x DMA, ~4 ms/fwd).
            x = input_values.astype(dtype)[..., None]
            if wav_len > t_samples:
                x = jnp.pad(x, ((0, 0), (0, wav_len - t_samples), (0, 0)))
            else:
                x = x[:, :wav_len]
            x = strided_conv1d_valid(x, conv_ws[0].astype(dtype), s0)
            # GroupNorm stats over LOGICAL rows only (padding excluded);
            # f32 accumulation (bf16 sums drift over ~10k timesteps).
            xl = x[:, :t_log].astype(jnp.float32)
            mean = jnp.mean(xl, axis=1, keepdims=True)
            var = jnp.var(xl, axis=1, keepdims=True)
            x = (x - mean.astype(dtype)) * jax.lax.rsqrt(var + 1e-5).astype(dtype)
            x = x * gn_scale.astype(dtype) + gn_bias.astype(dtype)
            # L0's GELU fuses into the GN elementwise chain (one XLA pass);
            # every later layer's GELU runs in its own kernel's epilogue.
            x = gelu_erf(x)
            in_dim = cfg.conv_dim[0]
            for i in range(1, len(cfg.conv_dim)):
                k_i = cfg.conv_kernel[i]
                s_i = cfg.conv_stride[i]
                d_i = cfg.conv_dim[i]
                y = x.reshape(b, x.shape[1] // s_i, s_i * in_dim)
                w_flat = conv_ws[i].astype(dtype).reshape(k_i * in_dim, d_i)
                x = fused_conv_layer(
                    y, w_flat, k=k_i, stride=s_i, cin=in_dim,
                    gelu_output=True, interpret=interp,
                )
                t_log = (t_log - k_i) // s_i + 1
                in_dim = d_i
            x = x[:, :t_log]
        else:
            x = input_values.astype(dtype)[..., None]  # [B, T, 1]
            for i, (dim, stride, kernel) in enumerate(
                zip(cfg.conv_dim, cfg.conv_stride, cfg.conv_kernel)
            ):
                x = strided_conv1d_valid(x, conv_ws[i].astype(dtype), stride)
                if i == 0:
                    # GroupNorm(groups=channels): per-channel norm over time
                    # (HF WavLMGroupNormConvLayer; torch GroupNorm eps=1e-5).
                    # f32 stats: bf16 sums drift over ~10k timesteps.
                    xf = x.astype(jnp.float32)
                    mean = jnp.mean(xf, axis=1, keepdims=True)
                    var = jnp.var(xf, axis=1, keepdims=True)
                    x = (x - mean.astype(dtype)) * jax.lax.rsqrt(
                        var + 1e-5
                    ).astype(dtype)
                    x = x * gn_scale.astype(dtype) + gn_bias.astype(dtype)
                x = gelu_erf(x)

        # --- feature projection ---
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="feature_projection.layer_norm"
        )(x)
        x = nn.Dense(cfg.hidden_size, dtype=dtype, name="feature_projection.projection")(x)
        x = nn.Dropout(rate=cfg.feat_proj_dropout, deterministic=not train)(x)

        # --- train-time span masking with the learned mask embedding ---
        masked_spec_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,),
        )
        if train and cfg.apply_spec_augment and self.has_rng("wavlm_mask"):
            x = self._mask_time(x, masked_spec_embed.astype(dtype))

        # --- positional conv embedding (weight-norm folded into kernel) ---
        pos = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.num_conv_pos_embeddings,),
            padding=[(cfg.num_conv_pos_embeddings // 2,) * 2],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=dtype,
            name="encoder.pos_conv_embed.conv",
        )(x)
        if cfg.num_conv_pos_embeddings % 2 == 0:
            pos = pos[:, :-1, :]
        pos = gelu_erf(pos)
        x = x + pos
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, name="encoder.layer_norm"
        )(x)
        x = nn.Dropout(rate=cfg.hidden_dropout, deterministic=not train)(x)

        # Fused path: pad the sequence ONCE to a sublane multiple and run
        # every fused layer at the padded length (the kernels mask padded
        # keys; garbage query rows are sliced off after the fused span).
        # Eval fuses the whole stack; training fuses only the frozen prefix
        # (fused_train_layers) and slices back to the logical length at the
        # prefix -> modular transition (the modular attention has no key
        # masking, so it must see the unpadded sequence).
        t_logical = x.shape[1]
        if _resolve_fused(cfg.fused_attention, False):
            n_fused = (
                min(max(0, cfg.fused_train_layers), cfg.num_hidden_layers)
                if train
                else cfg.num_hidden_layers
            )
        else:
            n_fused = 0
        if n_fused > 0 and t_logical % 16 != 0:
            tp_len = -(-t_logical // 16) * 16
            x = jnp.pad(x, ((0, 0), (0, tp_len - t_logical), (0, 0)))

        layer_drop = (
            train and cfg.layerdrop > 0.0 and self.has_rng("layerdrop")
        )
        position_bias = None
        for i in range(cfg.num_hidden_layers):
            fused_i = i < n_fused
            if not fused_i and x.shape[1] != t_logical:
                x = x[:, :t_logical]
                if position_bias is not None:
                    position_bias = position_bias[:, :t_logical, :t_logical]
            x_new, position_bias = WavLMEncoderLayer(
                config=cfg,
                has_relative_position_bias=(i == 0),
                dtype=dtype,
                name=f"encoder.layers.{i}",
            )(x, position_bias, train=train, seq_len=t_logical, fused=fused_i)
            if layer_drop and i > 0:
                # Batch-level LayerDrop (HF WavLMEncoder.forward): one draw
                # per layer per step; layer 0 always runs (it owns the
                # relative-position bucket bias).
                u = jax.random.uniform(self.make_rng("layerdrop"), ())
                x = jnp.where(u < cfg.layerdrop, x, x_new)
            else:
                x = x_new
        if x.shape[1] != t_logical:
            x = x[:, :t_logical]
        return x

    def _mask_time(self, x: jnp.ndarray, mask_embed: jnp.ndarray) -> jnp.ndarray:
        """SpecAugment-style span masking along time (behavioral equivalent of
        HF `_compute_mask_indices`: ~mask_time_prob of starts, span length
        mask_time_length)."""
        cfg = self.config
        b, t, _ = x.shape
        rng = self.make_rng("wavlm_mask")
        starts = jax.random.bernoulli(
            rng, cfg.mask_time_prob, (b, t)
        )  # span start indicators
        # Dilate starts into spans of length mask_time_length with a max-pool.
        window = cfg.mask_time_length
        mask = jax.lax.reduce_window(
            starts.astype(jnp.float32),
            0.0,
            jax.lax.max,
            window_dimensions=(1, window),
            window_strides=(1, 1),
            padding=[(0, 0), (window - 1, 0)],
        )
        mask = mask[..., None].astype(bool)
        return jnp.where(mask, mask_embed[None, None, :], x)


class WavLMAudioEncoder(nn.Module):
    """Reference `WavLMAudioEncoder` (`src/models/wavlm_audio.py:13-183`):
    WavLM backbone + TemporalPooler + MLP head (768 -> 768 -> ReLU -> Dropout
    -> num_classes).  Two-stage freezing lives in the optax trainer
    (train/freeze.py) rather than on the module."""

    num_classes: int
    embedding_dim: int = 768
    wavlm_config: WavLMConfig = WavLMConfig()
    temporal_pooling: str = "mean"
    temporal_num_heads: int = 4
    temporal_num_layers: int = 1
    temporal_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @property
    def sequence_dim(self) -> int:
        return self.wavlm_config.hidden_size

    def setup(self) -> None:
        self.wavlm = WavLMModel(config=self.wavlm_config, dtype=self.dtype)
        self.temporal_pool = TemporalPooler(
            dim=self.wavlm_config.hidden_size,
            mode=self.temporal_pooling,
            num_heads=self.temporal_num_heads,
            num_layers=self.temporal_num_layers,
            dropout=self.temporal_dropout,
            dtype=self.dtype,
        )
        self.classifier_fc1 = nn.Dense(
            self.embedding_dim, dtype=self.dtype, name="classifier.0"
        )
        self.classifier_fc2 = nn.Dense(
            self.num_classes, dtype=self.dtype, name="classifier.3"
        )
        self.classifier_dropout = nn.Dropout(rate=0.2)

    def encode_sequence(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Raw waveform [B, 1, T] or [B, T] -> hidden states [B, T', 768]."""
        if x.ndim == 3:
            x = x[:, 0, :]
        return self.wavlm(x, train=train)

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.encode_sequence(x, train=train)
        emb = self.temporal_pool(hidden, train=train)
        if emb.shape[-1] != self.embedding_dim:
            emb = self.classifier_fc1(emb)
        return emb

    def _classify(self, emb: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = self.classifier_fc1(emb)
        h = nn.relu(h)
        h = self.classifier_dropout(h, deterministic=not train)
        return self.classifier_fc2(h)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.encode_sequence(x, train=train)
        emb = self.temporal_pool(hidden, train=train)
        return self._classify(emb, train)
