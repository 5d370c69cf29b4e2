"""StableHLO export round-trip (the ONNX-export analog,
reference `src/export_optimized_model.py:26-104`)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalemotionrecognition_tpu.config import ModelConfig
from multimodalemotionrecognition_tpu.convert.torch_import import save_torch_checkpoint
from multimodalemotionrecognition_tpu.models.factory import build_model


@pytest.fixture(scope="module")
def gated_checkpoint(tmp_path_factory):
    cfg = ModelConfig(fusion="gated", num_classes=8, spec_augment=False)
    model = build_model(cfg)
    video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    audio = jnp.zeros((1, 1, 64, 301), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, audio)
    path = tmp_path_factory.mktemp("exp") / "best_gated.pt"
    save_torch_checkpoint(path, variables, config=cfg.to_checkpoint_dict())
    return str(path)


def test_export_roundtrip_matches_runner(gated_checkpoint, tmp_path):
    from multimodalemotionrecognition_tpu.runtime.export import (
        export_stablehlo,
        load_exported,
    )
    from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

    out = export_stablehlo(
        gated_checkpoint, str(tmp_path / "gated.stablehlo"), batch_sizes=(1, 2)
    )
    meta = json.loads(Path(str(out) + ".meta.json").read_text())
    assert meta["fusion"] == "gated"
    assert meta["num_classes"] == 8
    assert meta["labels"][0] == "neutral"

    exported = load_exported(str(out))
    runner = JaxModelRunner(gated_checkpoint)
    rng = np.random.RandomState(0)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(2, 1, 64, 301).astype(np.float32)
    np.testing.assert_allclose(
        exported.predict_probs(video, audio),
        runner.predict_probs(video, audio),
        atol=1e-6,
    )


def test_export_missing_meta_raises(tmp_path):
    from multimodalemotionrecognition_tpu.runtime.export import load_exported

    p = tmp_path / "nothing.stablehlo.npz"
    np.savez(p.with_suffix(""), **{"1": np.zeros(4, np.uint8)})
    with pytest.raises(FileNotFoundError):
        load_exported(str(tmp_path / "nothing.stablehlo"))


def test_export_over_max_bucket_chunks(gated_checkpoint, tmp_path):
    """Requests larger than the biggest exported bucket must be chunked, not
    silently truncated (the reference ONNX path has a dynamic batch axis,
    src/optimized_runtime.py:133-143 — never loses rows)."""
    from multimodalemotionrecognition_tpu.runtime.export import (
        export_stablehlo,
        load_exported,
    )
    from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

    out = export_stablehlo(
        gated_checkpoint, str(tmp_path / "gated_small.stablehlo"), batch_sizes=(1, 2)
    )
    exported = load_exported(str(out))
    runner = JaxModelRunner(gated_checkpoint)
    rng = np.random.RandomState(1)
    n = 5  # > max bucket (2), not a multiple of it
    video = rng.randn(n, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(n, 1, 64, 301).astype(np.float32)
    probs = exported.predict_probs(video, audio)
    assert probs.shape == (n, 8)
    np.testing.assert_allclose(probs, runner.predict_probs(video, audio), atol=1e-6)
