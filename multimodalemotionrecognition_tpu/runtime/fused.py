"""Fused inference forward for xattn checkpoints.

Builds a single jitted callable: encoder towers through the Flax graph, then
the whole fusion block (projections -> bidirectional cross-attention (+
emotion-prior bias) -> residual/LN -> mean pools -> head) through the Pallas
kernel + plain matmuls on extracted parameters.  Used by JaxModelRunner when
`fused=True` and the checkpoint is an xattn model with mean temporal pooling.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.config import ModelConfig
from multimodalemotionrecognition_tpu.ops.pallas_xattn import (
    fused_bidirectional_xattn,
    xattn_params_from_variables,
)

__all__ = ["supports_fused", "build_fused_xattn_forward"]


def supports_fused(model_config: ModelConfig) -> bool:
    return (
        model_config.canonical_fusion == "xattn"
        and model_config.temporal_pooling == "mean"
    )


def _dense(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["kernel"] + p["bias"]


def build_fused_xattn_forward(
    model, variables_unused, model_config: ModelConfig, interpret: bool = False
) -> Callable[[Any, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """-> forward(variables, video, audio) -> probabilities [B, C].

    Variables are a runtime argument (NOT a closure capture) so compiled HLO
    stays parameter-free — see runner._forward for why.
    """
    del variables_unused
    head = model_config.resolved_xattn_head
    num_heads = model_config.xattn_heads
    use_prior = model_config.xattn_use_emotion_prior

    def forward(variables, video: jnp.ndarray, audio: jnp.ndarray) -> jnp.ndarray:
        params = variables["params"]
        xp = xattn_params_from_variables(params)
        v_feat = model.apply(
            variables,
            video,
            train=False,
            method=lambda m, x, train: m.video_model.encode_frames(x, train=train),
        )
        a_seq = model.apply(
            variables,
            audio,
            train=False,
            method=lambda m, x, train: m.audio_model.encode_sequence(x, train=train),
        )
        v = _dense(params["v_in_proj"], v_feat)
        a = _dense(params["a_in_proj"], _dense(params["audio_seq_proj"], a_seq))

        v2a_bias = a2v_bias = None
        if use_prior:
            ep = params["emotion_prior_bias"]
            prior_h = jax.nn.relu(
                _dense(ep["prior_net.0"], jnp.concatenate([v.mean(1), a.mean(1)], -1))
            )
            prior = _dense(ep["prior_net.3"], prior_h)
            scale = ep["bias_scale"]

            def token_bias(q, k, qp, kp):
                qprior = jnp.broadcast_to(prior[:, None, :], q.shape[:2] + prior.shape[-1:])
                kprior = jnp.broadcast_to(prior[:, None, :], k.shape[:2] + prior.shape[-1:])
                qs = _dense(qp, jnp.concatenate([q, qprior], -1))[..., 0]
                ks = _dense(kp, jnp.concatenate([k, kprior], -1))[..., 0]
                return jnp.tanh(qs[..., :, None] + ks[..., None, :]) * scale

            v2a_bias = token_bias(v, a, ep["v_query_bias"], ep["a_key_bias"])
            a2v_bias = token_bias(a, v, ep["a_query_bias"], ep["v_key_bias"])

        v_emb, a_emb = fused_bidirectional_xattn(
            xp, v, a, v2a_bias, a2v_bias, num_heads=num_heads, interpret=interpret
        )

        if head == "concat":
            fused = jnp.concatenate([v_emb, a_emb], axis=1)
            h = jax.nn.relu(_dense(params["xattn_mlp.0"], fused))
            logits = _dense(params["xattn_mlp.3"], h)
        else:
            g_in = jnp.concatenate([v_emb, a_emb], axis=1)
            g = jax.nn.sigmoid(
                _dense(params["xattn_gate.3"], jax.nn.relu(_dense(params["xattn_gate.0"], g_in)))
            )
            fused = g * v_emb + (1.0 - g) * a_emb
            logits = _dense(params["xattn_classifier"], fused)
        return jax.nn.softmax(logits, axis=1)

    return forward
