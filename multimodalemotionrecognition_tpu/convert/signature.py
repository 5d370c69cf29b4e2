"""State-dict signature inference.

When a checkpoint lacks an embedded config dict, the fusion mode / head / WavLM
usage are inferred from state-dict key prefixes, matching the reference rules
exactly (`src/optimized_runtime.py:22-42`, duplicated at
`backend/app/model_loader.py:68-93`).
"""

from __future__ import annotations

from typing import Mapping, Tuple

__all__ = ["infer_model_signature", "checkpoint_uses_wavlm"]


def infer_model_signature(state_dict: Mapping[str, object]) -> Tuple[str, str]:
    """Returns (fusion_mode, xattn_head)."""
    keys = list(state_dict.keys())

    def has(prefix: str) -> bool:
        return any(k.startswith(prefix) for k in keys)

    if has("audio_model.") and has("video_model."):
        if has("xattn_gate."):
            return "xattn", "gated"
        if has("xattn_mlp."):
            return "xattn", "concat"
        if has("fusion."):
            return "concat", "concat"
        if has("gate."):
            return "gated", "gated"
        return "late", "concat"
    if has("encoder.") or has("wavlm."):
        return "audio", "concat"
    if has("backbone."):
        return "video", "concat"
    raise RuntimeError("Unable to infer model type from checkpoint state_dict keys.")


def checkpoint_uses_wavlm(state_dict: Mapping[str, object]) -> bool:
    keys = list(state_dict.keys())
    return any(k.startswith("audio_model.wavlm.") for k in keys) or any(
        k.startswith("wavlm.") for k in keys
    )
