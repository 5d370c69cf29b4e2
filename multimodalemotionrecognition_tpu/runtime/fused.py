"""Fused inference forward for xattn checkpoints.

Builds a single jitted callable: encoder towers through the Flax graph, then
the ENTIRE fusion block — input projections, bidirectional cross-attention
(+ in-kernel emotion-prior bias), residual/LN, temporal pooling (mean or
attn), and the concat/gated head — through ONE Pallas kernel
(ops/pallas_fused_block.py).  Used by JaxModelRunner when `fused=True` and
the checkpoint is an xattn model.  int8-quantized runners keep their weights
int8; dequantization happens inside the kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.config import ModelConfig
from multimodalemotionrecognition_tpu.ops.pallas_fused_block import (
    FusedBlockSpec,
    build_fused_block_fn,
    extract_block_params,
)

__all__ = ["supports_fused", "build_fused_xattn_forward"]


def supports_fused(model_config: ModelConfig) -> bool:
    # Both audio branches expose encode_sequence, so the block always starts
    # at audio_seq_proj; only the transformer temporal pooler stays modular.
    return (
        model_config.canonical_fusion == "xattn"
        and model_config.temporal_pooling in ("mean", "attn")
    )


def build_fused_xattn_forward(
    model,
    variables_unused,
    model_config: ModelConfig,
    interpret: bool = False,
    dequant_scales: Optional[Dict[Tuple[str, ...], Any]] = None,
    dequant_fn: Optional[Callable[[Any], Any]] = None,
) -> Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """-> forward(variables, video, audio) -> probabilities [B, C].

    Variables are a runtime argument (NOT a closure capture) so compiled HLO
    stays parameter-free — see runner._forward for why.  `dequant_scales`
    (from JaxModelRunner._quantize_dense_int8) marks which matrices arrive
    int8; they are dequantized inside the kernel.  The encoder towers run
    through the Flax graph, which needs float weights — `dequant_fn`
    (runner._dequantize) restores them at trace time; the block's unused
    dequantized copies are dead-code-eliminated.
    """
    del variables_unused
    spec = FusedBlockSpec(
        num_heads=model_config.xattn_heads,
        d_model=model_config.xattn_d_model,
        pooling=model_config.temporal_pooling,
        head=model_config.resolved_xattn_head,
        use_prior=model_config.xattn_use_emotion_prior,
        num_classes=model_config.num_classes,
    )
    dequant_scales = dequant_scales or {}
    block_fn_cache: Dict[Any, Callable] = {}

    def forward(variables, video: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        args, layout = extract_block_params(variables["params"], spec, dequant_scales)
        block_fn = block_fn_cache.get(layout)
        if block_fn is None:
            block_fn = build_fused_block_fn(spec, layout, interpret=interpret)
            block_fn_cache[layout] = block_fn
        tower_vars = dequant_fn(variables) if dequant_fn is not None else variables
        v_feat = model.apply(
            tower_vars,
            video,
            train=False,
            method=lambda m, x, train: m.video_model.encode_frames(x, train=train),
        )
        a_seq = model.apply(
            tower_vars,
            audio,
            train=False,
            method=lambda m, x, train: m.audio_model.encode_sequence(x, train=train),
        )
        logits = block_fn(v_feat, a_seq, *args)
        return jax.nn.softmax(logits, axis=1)

    return forward
