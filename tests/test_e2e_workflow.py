"""End-to-end workflow smoke: synthetic dataset -> train CLI -> checkpoint ->
eval loader -> serving runner.  The complete user journey in one test."""

import numpy as np
import pytest

from multimodalemotionrecognition_tpu.data.synthetic import generate_synthetic_ravdess


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    n = generate_synthetic_ravdess(
        root, actors=(1, 2, 3), emotions=(3, 5), seconds=1.0
    )
    assert n == 6
    return root


def test_train_eval_serve_roundtrip(synth_root, tmp_path):
    from multimodalemotionrecognition_tpu.train.cli import (
        build_arg_parser,
        configs_from_args,
    )

    out_dir = tmp_path / "outputs"
    args = build_arg_parser().parse_args(
        [
            "--data_root", str(synth_root),
            "--fusion", "gated",
            "--epochs", "1",
            "--batch_size", "2",
            "--frames", "2",
            "--img_size", "64",
            "--split_mode", "actor",
            "--train_actors", "1",
            "--val_actors", "2",
            "--test_actors", "3",
            "--early_stopping_patience", "0",
            "--output_dir", str(out_dir),
            "--no_face_crop",
        ]
    )
    model_cfg, train_cfg, data_cfg = configs_from_args(args)

    from multimodalemotionrecognition_tpu.data.pipeline import build_loaders
    from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)  # pairs.csv lands here
    try:
        train_loader, val_loader, test_loader = build_loaders(data_cfg, 2)
        assert train_loader.num_samples == 2
        assert val_loader.num_samples == 2
        trainer = EmotionTrainer(model_cfg, train_cfg, data_cfg)
        state, result = trainer.fit(train_loader, val_loader, test_loader)
    finally:
        os.chdir(cwd)

    assert (tmp_path / "pairs.csv").exists()
    ckpt = out_dir / "best_gated.pt"
    assert ckpt.exists()
    assert np.isfinite(result["best_val_f1"])
    assert "test" in result

    # eval loader reconstructs from the embedded config
    from multimodalemotionrecognition_tpu.train.eval import load_model_from_checkpoint

    model, variables, mc = load_model_from_checkpoint(str(ckpt))
    assert mc.fusion == "gated"

    # serving runner consumes the same checkpoint
    from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

    runner = JaxModelRunner(str(ckpt), batch_buckets=(1, 2))
    rng = np.random.RandomState(0)
    probs = runner.predict_probs(
        rng.randn(1, 8, 3, 112, 112).astype(np.float32),
        rng.randn(1, 1, 64, 301).astype(np.float32),
    )
    assert probs.shape == (1, 8)
    np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-5)


def test_resume_roundtrip(tmp_path):
    """Orbax full-state resume restores params + optimizer + epoch."""
    import jax.numpy as jnp

    from multimodalemotionrecognition_tpu.config import ModelConfig, TrainConfig
    from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

    cfg = ModelConfig(fusion="concat", num_classes=4, spec_augment=False)
    tc = TrainConfig(lr=1e-3, output_dir=str(tmp_path))
    trainer = EmotionTrainer(cfg, tc)
    state = trainer.init_state()
    trainer.save_resume_state(tmp_path / "resume_ckpt", state, epoch=3, best_f1=0.5)
    restored, epoch, best = trainer.restore_resume_state(tmp_path / "resume_ckpt")
    assert epoch == 3 and best == 0.5
    import jax

    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
