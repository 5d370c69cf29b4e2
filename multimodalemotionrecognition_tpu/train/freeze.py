"""Two-stage finetuning: parameter grouping and trainability masks.

Functional re-expression of the reference's freeze/optimizer policy
(`src/train.py:722-902`):

  * params split into fusion / audio / video groups by path prefix
    (`_build_fusion_stage_optimizer`, `src/train.py:837-845`);
  * stage 1: encoders frozen, fusion head trains (`:809-812`);
  * stage 2: WavLM unfreezes classifier + last N encoder layers (`:819-822`,
    `src/models/wavlm_audio.py:70-90`); non-WavLM audio is all-or-nothing
    (`:824`); video unfreezes the last N parameterized backbone blocks +
    classifier (`_set_video_backbone_trainable`, `:777-796`);
  * single-modality WavLM: stage 1 head-only, stage 2 adds last 2 layers
    (`:879-897`).

Masks are float pytrees (1.0 trainable / 0.0 frozen) applied to gradients and
weight decay inside the jitted step; the optimizer state is rebuilt at the
stage flip exactly as the reference rebuilds torch.optim.Adam.
"""

from __future__ import annotations

import re
from typing import Any, Dict

from flax.traverse_util import flatten_dict, unflatten_dict

from multimodalemotionrecognition_tpu.config import ModelConfig, TrainConfig

__all__ = [
    "label_params",
    "trainable_mask",
    "lr_tree",
    "wavlm_frozen_prefix",
    "VIDEO_BACKBONE_BLOCK_ORDER",
]

# Parameterized top-level children of the video backbone in reference
# Sequential order (conv1, bn1, layer1..4) — relu/maxpool/avgpool carry no
# params (`src/train.py:789-793`).
VIDEO_BACKBONE_BLOCK_ORDER = ("0", "1", "4", "5", "6", "7")


def _group_of(path: str) -> str:
    if path.startswith("audio_model."):
        return "audio"
    if path.startswith("video_model."):
        return "video"
    return "fusion"


def label_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pytree of group labels ('fusion'|'audio'|'video') per param leaf."""
    flat = flatten_dict(params)
    return unflatten_dict(
        {p: _group_of(".".join(map(str, p))) for p in flat.keys()}
    )


def _video_trainable(path: str, unfreeze_blocks: int) -> bool:
    """Last-N parameterized backbone blocks + classifier
    (reference `_set_video_backbone_trainable`)."""
    rest = path[len("video_model.") :]
    if rest.startswith("classifier."):
        return unfreeze_blocks > 0
    if rest.startswith("backbone."):
        if unfreeze_blocks <= 0:
            return False
        block = rest.split(".")[1]
        allowed = VIDEO_BACKBONE_BLOCK_ORDER[-unfreeze_blocks:]
        return block in allowed
    return False  # temporal_pool etc. stay frozen in stage 2


def _wavlm_audio_trainable(path: str, unfreeze_layers: int) -> bool:
    """Classifier + last N WavLM encoder layers (reference `:819-822`)."""
    rest = path[len("audio_model.") :]
    if rest.startswith("classifier."):
        return True
    m = re.match(r"wavlm\.encoder\.layers\.(\d+)\.", rest)
    if m and unfreeze_layers > 0:
        layer = int(m.group(1))
        num_layers = 12
        return layer >= num_layers - unfreeze_layers
    return False


def wavlm_frozen_prefix(
    model_config: ModelConfig, train_config: TrainConfig
) -> tuple:
    """(n_prefix_layers, conv_frozen): the WavLM components frozen in EVERY
    stage the run can use — exactly the leaves `trainable_mask` zeroes in all
    stages, so the train step may run them with the no-VJP fused kernels
    (WavLMConfig.fused_train_layers / fused_train_conv).

    Mirrors the mask logic above: `_wavlm_audio_trainable` unfreezes encoder
    layers by ABSOLUTE index >= 12 - N (the reference hardcodes 12,
    `src/models/wavlm_audio.py:70-90`), so the frozen prefix is
    min(num_layers, 12 - N).  The conv feature extractor / feature projection
    are never unfrozen by any stage policy."""
    if not model_config.use_wavlm:
        return 0, False
    geometry = model_config.wavlm_geometry or {}
    num_layers = int(geometry.get("num_hidden_layers", 12))
    if model_config.fusion == "audio":
        if train_config.wavlm_stage == 1:
            return num_layers, True  # backbone fully frozen
        return min(num_layers, 10), True  # stage 2 unfreezes the last 2 of 12
    if model_config.fusion == "video":
        return 0, False
    if train_config.two_stage_training:
        n = 12 - max(0, train_config.fusion_unfreeze_wavlm_layers)
        return min(num_layers, max(0, n)), True
    return 0, False  # single-stage fusion training: everything trainable


def trainable_mask(
    params: Dict[str, Any],
    model_config: ModelConfig,
    train_config: TrainConfig,
    stage: int,
) -> Dict[str, Any]:
    """Float mask pytree for the given stage.

    stage 0: everything trainable (single-stage training), except the WavLM
             single-modality protocol (`src/train.py:879-897`).
    stage 1 / 2: two-stage fusion policy.
    """
    flat = flatten_dict(params)
    fusion = model_config.fusion
    is_fusion_model = fusion not in {"audio", "video"}

    def decide(path: str) -> bool:
        if stage == 0:
            if fusion == "audio" and model_config.use_wavlm:
                # WavLM single-modality stages (reference `:879-897`):
                # stage 1 trains the head only; stage 2 adds the last 2
                # encoder layers.
                if train_config.wavlm_stage == 1:
                    return path.startswith("classifier.")
                # Stage 2's optimizer takes every requires_grad param; the
                # temporal pool was never frozen so it rides along in the
                # 'backbone' LR group (reference `get_stage2_params`,
                # `src/models/wavlm_audio.py:100-119`).
                return path.startswith("temporal_pool.") or _wavlm_audio_trainable(
                    "audio_model." + path, 2
                )
            return True
        if not is_fusion_model:
            return True
        group = _group_of(path)
        if group == "fusion":
            return True
        if stage == 1:
            return False
        # stage 2
        if group == "audio":
            if model_config.use_wavlm:
                return _wavlm_audio_trainable(
                    path, max(0, train_config.fusion_unfreeze_wavlm_layers)
                )
            return bool(train_config.fusion_unfreeze_audio)
        return _video_trainable(
            path, max(0, train_config.fusion_unfreeze_video_blocks)
        )

    return unflatten_dict(
        {p: float(decide(".".join(map(str, p)))) for p in flat.keys()}
    )


def lr_tree(
    params: Dict[str, Any],
    model_config: ModelConfig,
    train_config: TrainConfig,
    stage: int,
    scale: Dict[str, float],
) -> Dict[str, Any]:
    """Per-leaf learning rates: group base LR x per-group cosine factor.

    Group LRs follow the reference: stage 1 fusion=lr; stage 2 fusion=lr,
    audio=audio_backbone_lr, video=video_backbone_lr (`src/train.py:851-858`);
    single-stage (0) uses lr everywhere except WavLM-audio stage 2's
    backbone_lr (`:888-896`).
    """
    flat = flatten_dict(params)

    def base_lr(path: str) -> float:
        group = _group_of(path)
        if stage == 2:
            if group == "audio":
                return train_config.audio_backbone_lr
            if group == "video":
                return train_config.video_backbone_lr
            return train_config.lr
        if (
            stage == 0
            and model_config.fusion == "audio"
            and model_config.use_wavlm
            and train_config.wavlm_stage == 2
            and not path.startswith("classifier.")
        ):
            return train_config.backbone_lr
        return train_config.lr

    def factor(path: str) -> float:
        return scale.get(_group_of(path), 1.0)

    return unflatten_dict(
        {
            p: base_lr(".".join(map(str, p))) * factor(".".join(map(str, p)))
            for p in flat.keys()
        }
    )


def cosine_factor(epoch_in_stage: int, epochs_in_stage: int) -> float:
    """The reference's per-group cosine LambdaLR factor relative to base LR
    with eta_min = 0.1 * base (`_build_scheduler`, `src/train.py:736-768`):
    factor(e) = 0.1 + 0.9 * 0.5 * (1 + cos(pi * min(e+1, T) / T))."""
    import math

    t_max = max(1, int(epochs_in_stage))
    t = min(epoch_in_stage + 1, t_max)
    cosine = 0.5 * (1.0 + math.cos(math.pi * t / t_max))
    return 0.1 + 0.9 * cosine
