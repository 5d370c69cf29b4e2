"""Model factory: ModelConfig -> Flax module graph.

Single source of truth replacing the reference's three duplicated
`build_model()` copies (`src/train.py:329-470`, `src/eval.py:66-198`,
`backend/app/model_loader.py:95-187`).

Reference quirk consciously FIXED here (documented in SURVEY.md §2 #25): the
reference passes emotion-prior kwargs to VideoNet/AudioNet (which reject them,
crashing `--fusion video` train and non-WavLM audio eval) and never forwards
them to FusionModel, making `--xattn_use_emotion_prior` unreachable from the
CLI.  This factory wires the emotion prior correctly into FusionModel.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.config import ModelConfig
from multimodalemotionrecognition_tpu.models.audio import AudioNet
from multimodalemotionrecognition_tpu.models.fusion import FusionModel
from multimodalemotionrecognition_tpu.models.video import VideoNet

__all__ = ["build_model", "build_audio_encoder", "build_video_encoder"]

_FUSION_MODES = {
    "audio",
    "video",
    "late",
    "concat",
    "gated",
    "xattn",
    "xattn_concat",
    "xattn_gated",
}


def _dtype_of(config: ModelConfig) -> Optional[jnp.dtype]:
    if config.compute_dtype == "float32":
        return jnp.float32
    if config.compute_dtype == "bfloat16":
        return jnp.bfloat16
    raise ValueError(f"Unsupported compute dtype: {config.compute_dtype}")


def build_audio_encoder(config: ModelConfig) -> nn.Module:
    dtype = _dtype_of(config)
    if config.use_wavlm:
        from multimodalemotionrecognition_tpu.models.wavlm import (
            WavLMAudioEncoder,
            WavLMConfig,
        )

        geometry = dict(config.wavlm_geometry or {})
        geometry.setdefault(
            "fused_train_layers", config.wavlm_fused_train_layers
        )
        geometry.setdefault("fused_train_conv", config.wavlm_fused_train_conv)
        wavlm_config = WavLMConfig(**geometry)
        return WavLMAudioEncoder(
            num_classes=config.num_classes,
            # reference classifier MLP is hidden -> hidden (wavlm_audio.py:50)
            embedding_dim=wavlm_config.hidden_size,
            wavlm_config=wavlm_config,
            temporal_pooling=config.temporal_pooling,
            temporal_num_heads=config.temporal_num_heads,
            temporal_num_layers=config.temporal_num_layers,
            temporal_dropout=config.temporal_dropout,
            dtype=dtype,
        )
    return AudioNet(
        num_classes=config.num_classes,
        embedding_dim=config.audio_embedding_dim,
        use_resnet=config.use_resnet_audio,
        spec_augment=config.spec_augment,
        temporal_pooling=config.temporal_pooling,
        temporal_num_heads=config.temporal_num_heads,
        temporal_num_layers=config.temporal_num_layers,
        temporal_dropout=config.temporal_dropout,
        dtype=dtype,
    )


def build_video_encoder(config: ModelConfig) -> nn.Module:
    return VideoNet(
        num_classes=config.num_classes,
        temporal_pooling=config.temporal_pooling,
        temporal_num_heads=config.temporal_num_heads,
        temporal_num_layers=config.temporal_num_layers,
        temporal_dropout=config.temporal_dropout,
        dtype=_dtype_of(config),
    )


def build_model(config: ModelConfig) -> nn.Module:
    """Build the model graph for `config.fusion`
    (same mode set as `src/train.py:477-482`)."""
    if config.fusion not in _FUSION_MODES:
        raise ValueError(f"Unknown fusion mode: {config.fusion}")

    if config.fusion == "audio":
        return build_audio_encoder(config)
    if config.fusion == "video":
        return build_video_encoder(config)

    audio = build_audio_encoder(config)
    video = build_video_encoder(config)
    return FusionModel(
        audio_model=audio,
        video_model=video,
        num_classes=config.num_classes,
        mode=config.canonical_fusion,
        common_dim=config.common_dim,
        xattn_head=config.resolved_xattn_head,
        d_model=config.xattn_d_model,
        num_heads=config.xattn_heads,
        audio_n_mels=config.effective_audio_n_mels,
        xattn_attn_dropout=config.xattn_attn_dropout,
        xattn_stochastic_depth=config.xattn_stochastic_depth,
        temporal_pooling=config.temporal_pooling,
        temporal_num_heads=config.temporal_num_heads,
        temporal_num_layers=config.temporal_num_layers,
        temporal_dropout=config.temporal_dropout,
        fusion_align_mode=config.fusion_align_mode,
        fusion_align_dim=config.fusion_align_dim,
        fusion_align_temperature=config.fusion_align_temperature,
        xattn_use_emotion_prior=config.xattn_use_emotion_prior,
        xattn_emotion_prior_dim=config.xattn_emotion_prior_dim,
        xattn_emotion_prior_hidden_dim=config.xattn_emotion_prior_hidden_dim,
        xattn_emotion_prior_dropout=config.xattn_emotion_prior_dropout,
        dtype=_dtype_of(config),
    )
