"""Config schema: checkpoint-dict round trip, env loading, alias resolution."""

import pytest

from multimodalemotionrecognition_tpu.config import (
    EMOTION_LABELS_4,
    EMOTION_LABELS_8,
    ModelConfig,
    ServeConfig,
    labels_for,
)


def test_checkpoint_dict_round_trip():
    cfg = ModelConfig(
        fusion="xattn_gated",
        use_wavlm=True,
        xattn_d_model=64,
        temporal_pooling="attn",
        fusion_align_mode="clip",
    )
    d = cfg.to_checkpoint_dict()
    # exactly the reference's key set (src/train.py:697-720)
    assert set(d) == set(ModelConfig._CHECKPOINT_KEYS)
    restored = ModelConfig.from_checkpoint_dict(d, num_classes=4)
    assert restored.fusion == "xattn_gated"
    assert restored.num_classes == 4
    assert restored.xattn_d_model == 64
    assert restored.temporal_pooling == "attn"


def test_alias_resolution():
    assert ModelConfig(fusion="xattn_gated").canonical_fusion == "xattn"
    assert ModelConfig(fusion="xattn_gated").resolved_xattn_head == "gated"
    assert ModelConfig(fusion="xattn_concat").resolved_xattn_head == "concat"
    assert ModelConfig(fusion="xattn", xattn_head="gated").resolved_xattn_head == "gated"


def test_effective_audio_n_mels():
    # WavLM swaps n_mels for hidden size (src/train.py:462)
    assert ModelConfig(use_wavlm=True).effective_audio_n_mels == 768
    assert ModelConfig(use_wavlm=False, audio_n_mels=80).effective_audio_n_mels == 80


def test_labels():
    assert list(labels_for(8)) == EMOTION_LABELS_8
    assert list(labels_for(4)) == EMOTION_LABELS_4
    with pytest.raises(ValueError):
        labels_for(5)


def test_serve_config_env(monkeypatch):
    monkeypatch.setenv("EMO_BATCH_SIZE", "16")
    monkeypatch.setenv("EMO_BATCH_TIMEOUT_MS", "50")
    monkeypatch.setenv("EMO_MOCK", "1")
    monkeypatch.setenv("EMO_COMPUTE_DTYPE", "bfloat16")
    cfg = ServeConfig.from_env()
    assert cfg.batch_size == 16
    assert cfg.batch_timeout_ms == 50.0
    assert cfg.mock is True
    assert cfg.compute_dtype == "bfloat16"


def test_unknown_checkpoint_keys_ignored():
    restored = ModelConfig.from_checkpoint_dict({"fusion": "gated", "bogus_key": 1})
    assert restored.fusion == "gated"


def test_serve_config_mesh_shape(monkeypatch):
    """EMO_MESH_SHAPE parsing -> (data, model) inference mesh."""
    from multimodalemotionrecognition_tpu.config import (
        ServeConfig,
        _parse_mesh_shape,
    )

    assert _parse_mesh_shape("") is None
    assert _parse_mesh_shape("8") == (8, 1)
    assert _parse_mesh_shape("4,2") == (4, 2)
    assert _parse_mesh_shape("4x2") == (4, 2)

    assert ServeConfig.from_env().mesh_shape is None
    assert ServeConfig.from_env().make_mesh() is None
    monkeypatch.setenv("EMO_MESH_SHAPE", "2,1")
    cfg = ServeConfig.from_env()
    assert cfg.mesh_shape == (2, 1)
    mesh = cfg.make_mesh()
    assert dict(mesh.shape) == {"data": 2, "model": 1}
