"""Multimodal fusion heads: late / concat / gated / bidirectional cross-attention.

TPU-native re-implementation of the reference FusionModel
(`src/models/fusion.py:187-437`) plus its auxiliary modules: CLIP-style
alignment (`:127-150`) and the emotion-prior attention-bias adapter
(`:153-184`).  Functional-style differences from the torch original:

  * alignment loss is returned in an aux dict instead of being stashed on the
    module and popped (`pop_alignment_loss`, `src/models/fusion.py:346-349`);
  * all stochasticity (attention dropout, drop-path, modality dropout) uses
    explicit Flax RNG streams ("dropout", "droppath", "modality").

Reference quirks consciously handled:
  * late fusion returns PROBABILITIES, not logits (`:358-363`) — consumers must
    not re-softmax (`src/optimized_runtime.py:107`);
  * gate MLPs initialize BOTH linear biases to -1.0 — the reference's init
    loops touch every Linear that isn't the trailing Sigmoid
    (`_init_gated_fusion_bias` `:329-336`, `_init_xattn_gated_bias` `:338-344`);
  * gated fusion computes g*audio + (1-g)*video (`:434`) while the xattn gated
    head computes g*video + (1-g)*audio (`:410`);
  * the emotion-prior CLI wiring is broken in the reference (never forwarded to
    FusionModel — SURVEY.md §2 #25); here it is a first-class, working option;
  * the standalone `GatedFusion` class is dead code in the reference and is
    deliberately not reproduced;
  * `audio_time_conv` (mel fallback for encoders without `encode_sequence`,
    `:379-386`) is only materialized when the audio encoder lacks a sequence
    interface — both built-in encoders provide one, so like the reference this
    path is dormant; checkpoints containing its weights still convert.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.models.temporal import TemporalPooler
from multimodalemotionrecognition_tpu.ops.attention import TorchMultiHeadAttention
from multimodalemotionrecognition_tpu.ops.stochastic import (
    drop_path,
    modality_dropout_mask,
)

__all__ = ["ClipStyleAlignment", "EmotionPriorBiasAdapter", "FusionModel"]

_NEG_ONE_BIAS = nn.initializers.constant(-1.0)


class ClipStyleAlignment(nn.Module):
    """CLIP-style shared-space alignment with symmetric InfoNCE
    (reference `src/models/fusion.py:127-150`)."""

    audio_dim: int
    video_dim: int
    align_dim: int
    init_temperature: float = 0.07
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, audio_emb: jnp.ndarray, video_emb: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        import math

        dtype = self.dtype or audio_emb.dtype
        a_aligned = nn.Dense(self.align_dim, dtype=dtype, name="audio_proj")(audio_emb)
        v_aligned = nn.Dense(self.align_dim, dtype=dtype, name="video_proj")(video_emb)

        safe_temp = max(float(self.init_temperature), 1e-3)
        logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(math.log(1.0 / safe_temp)),
            (),
        )

        a_norm = a_aligned / jnp.maximum(
            jnp.linalg.norm(a_aligned, axis=-1, keepdims=True), 1e-12
        )
        v_norm = v_aligned / jnp.maximum(
            jnp.linalg.norm(v_aligned, axis=-1, keepdims=True), 1e-12
        )
        scale = jnp.minimum(jnp.exp(logit_scale), 100.0)
        logits = scale * (a_norm @ v_norm.T)

        def _infonce(lg: jnp.ndarray) -> jnp.ndarray:
            log_probs = nn.log_softmax(lg, axis=-1)
            return -jnp.mean(jnp.diagonal(log_probs))

        loss = 0.5 * (_infonce(logits) + _infonce(logits.T))
        return a_aligned, v_aligned, loss


class EmotionPriorBiasAdapter(nn.Module):
    """Global emotion prior -> token-wise additive attention bias
    (reference `src/models/fusion.py:153-184`).

    prior = MLP(mean(v_tokens) ++ mean(a_tokens));
    bias(q, k) = tanh(score_q(q, prior) (+) score_k(k, prior)) * bias_scale.
    """

    token_dim: int
    prior_dim: int
    hidden_dim: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        video_tokens: jnp.ndarray,
        audio_tokens: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        dtype = self.dtype or video_tokens.dtype
        video_global = jnp.mean(video_tokens, axis=1)
        audio_global = jnp.mean(audio_tokens, axis=1)

        h = jnp.concatenate([video_global, audio_global], axis=-1)
        h = nn.Dense(self.hidden_dim, dtype=dtype, name="prior_net.0")(h)
        h = nn.relu(h)
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        prior = nn.Dense(self.prior_dim, dtype=dtype, name="prior_net.3")(h)

        bias_scale = self.param("bias_scale", nn.initializers.ones, ())

        def token_bias(
            query: jnp.ndarray, key: jnp.ndarray, q_name: str, k_name: str
        ) -> jnp.ndarray:
            q_prior = jnp.broadcast_to(
                prior[:, None, :], (query.shape[0], query.shape[1], self.prior_dim)
            )
            k_prior = jnp.broadcast_to(
                prior[:, None, :], (key.shape[0], key.shape[1], self.prior_dim)
            )
            q_scores = nn.Dense(1, dtype=dtype, name=q_name)(
                jnp.concatenate([query, q_prior], axis=-1)
            )[..., 0]
            k_scores = nn.Dense(1, dtype=dtype, name=k_name)(
                jnp.concatenate([key, k_prior], axis=-1)
            )[..., 0]
            bias = q_scores[..., :, None] + k_scores[..., None, :]
            return jnp.tanh(bias) * bias_scale

        v2a_bias = token_bias(video_tokens, audio_tokens, "v_query_bias", "a_key_bias")
        a2v_bias = token_bias(audio_tokens, video_tokens, "a_query_bias", "v_key_bias")
        return prior, v2a_bias, a2v_bias


class FusionModel(nn.Module):
    """Four-mode audio-visual fusion (reference `src/models/fusion.py:187-437`).

    __call__(video [B,T,3,H,W], audio, train) -> (output, aux) where `output`
    is logits for every mode except "late" (probabilities — reference parity)
    and aux = {"alignment_loss": Optional[scalar]}.
    """

    audio_model: nn.Module
    video_model: nn.Module
    num_classes: int
    mode: str = "late"
    common_dim: int = 256
    xattn_head: str = "concat"
    d_model: int = 128
    num_heads: int = 4
    audio_n_mels: int = 64
    xattn_attn_dropout: float = 0.1
    xattn_stochastic_depth: float = 0.1
    temporal_pooling: str = "mean"
    temporal_num_heads: int = 4
    temporal_num_layers: int = 1
    temporal_dropout: float = 0.1
    fusion_align_mode: str = "none"
    fusion_align_dim: int = 256
    fusion_align_temperature: float = 0.07
    xattn_use_emotion_prior: bool = False
    xattn_emotion_prior_dim: int = 8
    xattn_emotion_prior_hidden_dim: int = 64
    xattn_emotion_prior_dropout: float = 0.1
    modality_dropout_audio: float = 0.2
    modality_dropout_video: float = 0.2
    dtype: Optional[jnp.dtype] = None

    def _drop_path(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train or self.xattn_stochastic_depth <= 0.0:
            return x
        rng = self.make_rng("droppath")
        return drop_path(rng, x, self.xattn_stochastic_depth, train)

    def _gate_mlp(self, x: jnp.ndarray, prefix: str, hidden: int, train: bool):
        """Gate MLP with the reference's -1.0 bias init on BOTH linears."""
        dtype = self.dtype or x.dtype
        g = nn.Dense(hidden, dtype=dtype, bias_init=_NEG_ONE_BIAS, name=f"{prefix}.0")(x)
        g = nn.relu(g)
        g = nn.Dropout(rate=0.2, deterministic=not train)(g)
        g = nn.Dense(1, dtype=dtype, bias_init=_NEG_ONE_BIAS, name=f"{prefix}.3")(g)
        return nn.sigmoid(g)

    def _head_mlp(self, x: jnp.ndarray, prefix: str, hidden: int, train: bool):
        dtype = self.dtype or x.dtype
        h = nn.Dense(hidden, dtype=dtype, name=f"{prefix}.0")(x)
        h = nn.relu(h)
        h = nn.Dropout(rate=0.2, deterministic=not train)(h)
        return nn.Dense(self.num_classes, dtype=dtype, name=f"{prefix}.3")(h)

    @nn.compact
    def __call__(
        self, video: jnp.ndarray, audio: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        aux: Dict[str, Any] = {"alignment_loss": None}
        dtype = self.dtype or video.dtype

        if self.mode == "late":
            a_logits = self.audio_model(audio, train=train)
            v_logits = self.video_model(video, train=train)
            probs = 0.5 * (
                nn.softmax(a_logits, axis=1) + nn.softmax(v_logits, axis=1)
            )
            return probs, aux

        if self.mode in {"xattn", "xattn_concat", "xattn_gated"}:
            # Per-frame video tokens [B, T, 512] -> d_model.
            v_feat = self.video_model.encode_frames(video, train=train)
            v = nn.Dense(self.d_model, dtype=dtype, name="v_in_proj")(v_feat)

            if hasattr(self.audio_model, "encode_sequence"):
                a_seq = self.audio_model.encode_sequence(audio, train=train)
                a_seq = nn.Dense(self.d_model, dtype=dtype, name="audio_seq_proj")(a_seq)
            else:
                # Mel fallback: [B,1,n_mels,Ta] -> Conv1d over time -> [B,Ta,d].
                a_in = jnp.transpose(audio[:, 0], (0, 2, 1))  # [B, Ta, n_mels]
                a_seq = nn.Conv(
                    self.d_model,
                    kernel_size=(3,),
                    padding=[(1, 1)],
                    dtype=dtype,
                    name="audio_time_conv",
                )(a_in)
            a = nn.Dense(self.d_model, dtype=dtype, name="a_in_proj")(a_seq)

            v2a_bias = a2v_bias = None
            if self.xattn_use_emotion_prior:
                _, v2a_bias, a2v_bias = EmotionPriorBiasAdapter(
                    token_dim=self.d_model,
                    prior_dim=self.xattn_emotion_prior_dim,
                    hidden_dim=self.xattn_emotion_prior_hidden_dim,
                    dropout=self.xattn_emotion_prior_dropout,
                    dtype=dtype,
                    name="emotion_prior_bias",
                )(v, a, train=train)

            v2 = TorchMultiHeadAttention(
                embed_dim=self.d_model,
                num_heads=self.num_heads,
                dropout_rate=self.xattn_attn_dropout,
                dtype=dtype,
                name="v2a_attn",
            )(v, a, a, bias=v2a_bias, train=train)
            v = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="v_norm")(
                v + self._drop_path(v2, train)
            )

            a2 = TorchMultiHeadAttention(
                embed_dim=self.d_model,
                num_heads=self.num_heads,
                dropout_rate=self.xattn_attn_dropout,
                dtype=dtype,
                name="a2v_attn",
            )(a, v, v, bias=a2v_bias, train=train)
            a = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="a_norm")(
                a + self._drop_path(a2, train)
            )

            pool_kwargs = dict(
                dim=self.d_model,
                mode=self.temporal_pooling,
                num_heads=self.temporal_num_heads,
                num_layers=self.temporal_num_layers,
                dropout=self.temporal_dropout,
                dtype=dtype,
            )
            v_emb = TemporalPooler(**pool_kwargs, name="v_temporal_pool")(v, train=train)
            a_emb = TemporalPooler(**pool_kwargs, name="a_temporal_pool")(a, train=train)

            head = self.xattn_head
            if self.mode == "xattn_concat":
                head = "concat"
            elif self.mode == "xattn_gated":
                head = "gated"

            if head == "concat":
                fused = jnp.concatenate([v_emb, a_emb], axis=1)
                return self._head_mlp(fused, "xattn_mlp", self.common_dim, train), aux
            if head == "gated":
                gate = self._gate_mlp(
                    jnp.concatenate([v_emb, a_emb], axis=1),
                    "xattn_gate",
                    self.d_model,
                    train,
                )
                fused = gate * v_emb + (1.0 - gate) * a_emb
                logits = nn.Dense(
                    self.num_classes, dtype=dtype, name="xattn_classifier"
                )(fused)
                return logits, aux
            raise ValueError(f"Unknown xattn head: {head}")

        # concat / gated
        a_emb = self.audio_model.encode(audio, train=train)
        v_emb = self.video_model.encode(video, train=train)

        if self.mode in {"concat", "gated"}:
            if self.fusion_align_mode == "clip":
                a_emb, v_emb, align_loss = ClipStyleAlignment(
                    audio_dim=a_emb.shape[-1],
                    video_dim=v_emb.shape[-1],
                    align_dim=self.fusion_align_dim,
                    init_temperature=self.fusion_align_temperature,
                    dtype=dtype,
                    name="semantic_alignment",
                )(a_emb, v_emb)
                aux["alignment_loss"] = align_loss
            a_emb = nn.Dense(self.common_dim, dtype=dtype, name="audio_proj")(a_emb)
            v_emb = nn.Dense(self.common_dim, dtype=dtype, name="video_proj")(v_emb)

        if self.mode == "concat":
            fused = jnp.concatenate([a_emb, v_emb], axis=1)
            return self._head_mlp(fused, "fusion", self.common_dim, train), aux

        if self.mode == "gated":
            if train and self.has_rng("modality"):
                keep_a, keep_v = modality_dropout_mask(
                    self.make_rng("modality"),
                    self.modality_dropout_audio,
                    self.modality_dropout_video,
                )
                a_emb = a_emb * keep_a.astype(a_emb.dtype)
                v_emb = v_emb * keep_v.astype(v_emb.dtype)
            g = self._gate_mlp(
                jnp.concatenate([a_emb, v_emb], axis=1),
                "gate",
                self.common_dim,
                train,
            )
            fused = g * a_emb + (1.0 - g) * v_emb
            logits = nn.Dense(self.num_classes, dtype=dtype, name="classifier")(fused)
            return logits, aux

        raise ValueError(f"Unknown fusion mode: {self.mode}")
