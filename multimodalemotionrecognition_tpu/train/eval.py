"""Checkpoint evaluation (reference `src/eval.py:218-275`).

Loads a reference-format .pt checkpoint, rebuilds the model from the embedded
config (with state-dict signature inference fallback), and evaluates
accuracy + macro-F1 on the actor-held-out test split.

Usage: python -m multimodalemotionrecognition_tpu.train.eval \
         --checkpoint outputs/best_xattn.pt --data_root data
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Tuple

import jax

from multimodalemotionrecognition_tpu.config import DataConfig, ModelConfig, TrainConfig

__all__ = ["load_model_from_checkpoint", "EmotionEvaluator", "main"]


def load_model_from_checkpoint(
    checkpoint_path: str, num_classes: int = 8
) -> Tuple[Any, Dict[str, Any], ModelConfig]:
    """-> (model, variables, model_config). Architecture comes from the
    checkpoint config dict; falls back to key-signature inference
    (`src/optimized_runtime.py:51-57`)."""
    from multimodalemotionrecognition_tpu.convert import (
        checkpoint_uses_wavlm,
        infer_model_signature,
    )
    from multimodalemotionrecognition_tpu.convert.torch_import import (
        load_reference_checkpoint,
        torch_state_dict_to_flax,
    )
    from multimodalemotionrecognition_tpu.models.factory import build_model

    sd, config = load_reference_checkpoint(checkpoint_path)
    if "fusion" in config:
        model_config = ModelConfig.from_checkpoint_dict(config, num_classes=num_classes)
    else:
        fusion, head = infer_model_signature(sd)
        model_config = ModelConfig(
            num_classes=num_classes,
            fusion=fusion,
            xattn_head=head,
            use_wavlm=checkpoint_uses_wavlm(sd),
        )

    model = build_model(model_config)
    import jax.numpy as jnp

    video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    if model_config.use_wavlm:
        audio = jnp.zeros((1, 1, 48000), jnp.float32)
    else:
        audio = jnp.zeros((1, 1, model_config.audio_n_mels, 301), jnp.float32)
    if model_config.fusion == "audio":
        init = lambda: model.init(jax.random.PRNGKey(0), audio)
    elif model_config.fusion == "video":
        init = lambda: model.init(jax.random.PRNGKey(0), video)
    else:
        init = lambda: model.init(jax.random.PRNGKey(0), video, audio)
    template = jax.eval_shape(init)
    variables, report = torch_state_dict_to_flax(sd, template, strict=False)
    # Mirror the reference's guard rails (`src/optimized_runtime.py:87-94`).
    if len(report.missing_flax_paths) > 32:
        raise RuntimeError(
            f"Too many missing keys when loading checkpoint "
            f"({len(report.missing_flax_paths)})."
        )
    return model, variables, model_config


class EmotionEvaluator:
    def __init__(self, checkpoint: str, data_config: DataConfig):
        self.checkpoint = checkpoint
        self.dc = data_config

    def run(self) -> Dict[str, float]:
        from multimodalemotionrecognition_tpu.data.pipeline import build_loaders
        from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

        model, variables, model_config = load_model_from_checkpoint(
            self.checkpoint, num_classes=self.dc.num_classes
        )
        trainer = EmotionTrainer(model_config, TrainConfig(), self.dc)
        trainer.model = model
        trainer._build_steps()
        _, _, test_loader = build_loaders(self.dc, batch_size=16)

        class _State:
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})

        _, metrics = trainer.run_epoch(_State(), test_loader, train=False)
        print(
            f"Test accuracy: {metrics['acc']:.4f} | macro-F1: {metrics['f1']:.4f}"
        )
        return metrics


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--num_classes", type=int, default=8, choices=[4, 8])
    p.add_argument("--test_actors", type=str, default="22,23,24")
    args = p.parse_args(argv)
    dc = DataConfig(
        data_root=args.data_root,
        num_classes=args.num_classes,
        split_mode="actor",
        test_actors=tuple(int(x) for x in args.test_actors.split(",")),
    )
    EmotionEvaluator(args.checkpoint, dc).run()


if __name__ == "__main__":
    main()
