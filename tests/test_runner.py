"""JaxModelRunner tests: checkpoint -> bucketed inference with the
reference TorchModelRunner contract (`src/optimized_runtime.py:44-108`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalemotionrecognition_tpu.config import ModelConfig
from multimodalemotionrecognition_tpu.convert.torch_import import save_torch_checkpoint
from multimodalemotionrecognition_tpu.models.factory import build_model
from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner


@pytest.fixture(scope="module")
def xattn_checkpoint(tmp_path_factory):
    cfg = ModelConfig(
        fusion="xattn",
        num_classes=8,
        spec_augment=False,
        xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
    )
    model = build_model(cfg)
    video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    audio = jnp.zeros((1, 1, 64, 301), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, audio)
    path = tmp_path_factory.mktemp("ckpt") / "best_xattn.pt"
    save_torch_checkpoint(path, variables, config=cfg.to_checkpoint_dict(), val_f1=0.9)
    return str(path), cfg, model, variables


def test_runner_loads_and_matches_direct_apply(xattn_checkpoint):
    path, cfg, model, variables = xattn_checkpoint
    runner = JaxModelRunner(path)
    assert runner.fusion_mode == "xattn"
    assert runner.use_wavlm is False
    assert runner.labels[0] == "neutral"

    rng = np.random.RandomState(0)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(2, 1, 64, 301).astype(np.float32)
    probs = runner.predict_probs(video, audio)
    assert probs.shape == (2, 8)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)

    logits, _ = model.apply(variables, jnp.asarray(video), jnp.asarray(audio))
    expected = np.asarray(jax.nn.softmax(logits, axis=1))
    np.testing.assert_allclose(probs, expected, atol=1e-5)


def test_runner_pads_to_bucket(xattn_checkpoint):
    path, *_ = xattn_checkpoint
    runner = JaxModelRunner(path, batch_buckets=(1, 2, 4))
    rng = np.random.RandomState(1)
    video = rng.randn(3, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(3, 1, 64, 301).astype(np.float32)
    probs = runner.predict_probs(video, audio)
    assert probs.shape == (3, 8)
    # bucket-4 result must equal per-sample results
    single = runner.predict_probs(video[:1], audio[:1])
    np.testing.assert_allclose(probs[0], single[0], atol=1e-5)


def test_runner_int8_close_to_fp32(xattn_checkpoint):
    path, *_ = xattn_checkpoint
    fp32 = JaxModelRunner(path)
    int8 = JaxModelRunner(path, quantize_int8=True)
    rng = np.random.RandomState(2)
    video = rng.randn(1, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(1, 1, 64, 301).astype(np.float32)
    p32 = fp32.predict_probs(video, audio)
    p8 = int8.predict_probs(video, audio)
    assert np.abs(p32 - p8).max() < 0.05
    assert np.argmax(p32) == np.argmax(p8)


def test_runner_late_no_double_softmax(tmp_path):
    cfg = ModelConfig(fusion="late", num_classes=8, spec_augment=False)
    model = build_model(cfg)
    video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    audio = jnp.zeros((1, 1, 64, 301), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, audio)
    path = tmp_path / "best_late.pt"
    save_torch_checkpoint(path, variables, config=cfg.to_checkpoint_dict())
    runner = JaxModelRunner(str(path))
    rng = np.random.RandomState(0)
    v = rng.randn(1, 8, 3, 112, 112).astype(np.float32)
    a = rng.randn(1, 1, 64, 301).astype(np.float32)
    probs = runner.predict_probs(v, a)
    direct, _ = model.apply(variables, jnp.asarray(v), jnp.asarray(a))
    np.testing.assert_allclose(probs, np.asarray(direct), atol=1e-6)


def test_runner_signature_fallback_no_config(tmp_path):
    """A raw state dict without config reconstructs via signature inference."""
    import torch

    cfg = ModelConfig(fusion="gated", num_classes=8, spec_augment=False)
    model = build_model(cfg)
    video = jnp.zeros((1, 4, 3, 64, 64), jnp.float32)
    audio = jnp.zeros((1, 1, 64, 101), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, audio)
    from multimodalemotionrecognition_tpu.convert.torch_import import (
        flax_to_torch_state_dict,
    )

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in flax_to_torch_state_dict(variables).items()
    }
    path = tmp_path / "raw.pt"
    torch.save({"model": sd}, path)
    runner = JaxModelRunner(str(path))
    assert runner.fusion_mode == "gated"


def test_runner_fused_matches_modular(xattn_checkpoint):
    path, *_ = xattn_checkpoint
    modular = JaxModelRunner(path)
    fused = JaxModelRunner(path, fused=True)
    assert fused._fused_forward is not None
    rng = np.random.RandomState(3)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(2, 1, 64, 301).astype(np.float32)
    pm = modular.predict_probs(video, audio)
    pf = fused.predict_probs(video, audio)
    np.testing.assert_allclose(pf, pm, atol=5e-5, rtol=5e-5)


def test_runner_device_normalize_uint8(xattn_checkpoint):
    """uint8 video + on-device ImageNet normalization matches the host-
    normalized float path (up to uint8 quantization)."""
    path, *_ = xattn_checkpoint
    host = JaxModelRunner(path)
    dev = JaxModelRunner(path, device_normalize=True)
    rng = np.random.RandomState(4)
    video_u8 = rng.randint(0, 256, (2, 8, 3, 112, 112)).astype(np.uint8)
    audio = rng.randn(2, 1, 64, 301).astype(np.float32)

    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 1, 3, 1, 1)
    video_f32 = (video_u8.astype(np.float32) / 255.0 - mean) / std

    p_host = host.predict_probs(video_f32, audio)
    p_dev = dev.predict_probs(video_u8, audio)
    np.testing.assert_allclose(p_dev, p_host, atol=1e-4, rtol=1e-4)


def test_runner_fused_int8_matches_modular_int8(xattn_checkpoint):
    """fused + int8 no longer falls back (round-1 limitation): dequantization
    happens INSIDE the Pallas kernel and matches the modular int8 path."""
    path, *_ = xattn_checkpoint
    modular = JaxModelRunner(path, quantize_int8=True)
    fused = JaxModelRunner(path, quantize_int8=True, fused=True)
    assert fused._fused_forward is not None
    rng = np.random.RandomState(5)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(2, 1, 64, 301).astype(np.float32)
    pm = modular.predict_probs(video, audio)
    pf = fused.predict_probs(video, audio)
    np.testing.assert_allclose(pf, pm, atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize(
    "extra",
    [
        {"temporal_pooling": "attn"},
        {"xattn_use_emotion_prior": True},
        {"xattn_head": "gated"},
        {"temporal_pooling": "attn", "xattn_use_emotion_prior": True,
         "xattn_head": "gated"},
    ],
    ids=["attn-pool", "emotion-prior", "gated-head", "all"],
)
def test_runner_fused_variants_match_modular(tmp_path, extra):
    """The full-block kernel absorbs attn pooling, the emotion-prior bias,
    and the gated head — each must match the modular graph."""
    cfg = ModelConfig(
        fusion="xattn",
        num_classes=8,
        spec_augment=False,
        xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
        **extra,
    )
    model = build_model(cfg)
    video = jnp.zeros((1, 4, 3, 64, 64), jnp.float32)
    audio = jnp.zeros((1, 1, 64, 101), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), video, audio)
    path = tmp_path / "variant.pt"
    save_torch_checkpoint(path, variables, config=cfg.to_checkpoint_dict())

    modular = JaxModelRunner(str(path))
    fused = JaxModelRunner(str(path), fused=True)
    assert fused._fused_forward is not None, extra
    rng = np.random.RandomState(7)
    v = rng.randn(2, 4, 3, 64, 64).astype(np.float32)
    a = rng.randn(2, 1, 64, 101).astype(np.float32)
    pm = modular.predict_probs(v, a)
    pf = fused.predict_probs(v, a)
    np.testing.assert_allclose(pf, pm, atol=5e-5, rtol=5e-5)


@pytest.fixture(scope="module")
def wavlm_checkpoint(tmp_path_factory):
    """Small-geometry WavLM xattn checkpoint for wire-format tests."""
    from multimodalemotionrecognition_tpu.models.fusion import FusionModel
    from multimodalemotionrecognition_tpu.models.video import VideoNet
    from multimodalemotionrecognition_tpu.models.wavlm import (
        WavLMAudioEncoder,
        WavLMConfig,
    )

    from tests.test_wavlm_parity import SMALL

    model = FusionModel(
        audio_model=WavLMAudioEncoder(
            num_classes=8, embedding_dim=32, wavlm_config=WavLMConfig(**SMALL)
        ),
        video_model=VideoNet(num_classes=8),
        num_classes=8,
        mode="xattn",
        d_model=32,
        num_heads=4,
        xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
    )
    video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    audio = jnp.zeros((1, 1, 48000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, audio)
    cfg = ModelConfig(
        fusion="xattn", num_classes=8, use_wavlm=True, spec_augment=False,
        xattn_d_model=32, xattn_attn_dropout=0.0, xattn_stochastic_depth=0.0,
        wavlm_geometry=dict(SMALL),
    )
    path = tmp_path_factory.mktemp("wire") / "best_xattn_wavlm.pt"
    save_torch_checkpoint(path, variables, config=cfg.to_checkpoint_dict())
    return str(path)


def test_runner_int16_audio_wire_matches_float(wavlm_checkpoint):
    """int16 PCM audio wire == float audio for PCM-derived waveforms."""
    runner = JaxModelRunner(wavlm_checkpoint)
    rng = np.random.RandomState(11)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    pcm = rng.randint(-32768, 32767, (2, 1, 48000)).astype(np.int16)
    wav = pcm.astype(np.float32) / 32768.0
    p_float = runner.predict_probs(video, wav)
    p_int16 = runner.predict_probs(video, pcm)
    np.testing.assert_allclose(p_int16, p_float, atol=1e-6)


def test_runner_blank_video_matches_zero_tensor(wavlm_checkpoint):
    """predict_probs_blank_video == predict_probs with explicit zero frames
    for both wire formats (uint8 device-normalize and pre-normalized float)."""
    rng = np.random.RandomState(12)
    wav = (rng.randn(3, 1, 48000) * 0.1).astype(np.float32)
    for device_normalize in (True, False):
        runner = JaxModelRunner(
            wavlm_checkpoint, device_normalize=device_normalize
        )
        if device_normalize:
            videos = np.zeros((3, 8, 3, 112, 112), np.uint8)
        else:
            from multimodalemotionrecognition_tpu.config import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 1, 3, 1, 1)
            std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 1, 3, 1, 1)
            videos = np.broadcast_to(
                -mean / std, (3, 8, 3, 112, 112)
            ).astype(np.float32)
        p_explicit = runner.predict_probs(videos, wav)
        p_blank = runner.predict_probs_blank_video(wav)
        np.testing.assert_allclose(p_blank, p_explicit, atol=1e-6)


def test_runner_mesh_dp_matches_single(xattn_checkpoint):
    """8-way batch-sharded inference == single-device inference (multi-chip
    serving scale-out; params replicated, batch over the "data" axis)."""
    from multimodalemotionrecognition_tpu.parallel.mesh import make_mesh

    path, *_ = xattn_checkpoint
    mesh = make_mesh((8, 1))
    base = JaxModelRunner(path)
    sharded = JaxModelRunner(path, mesh=mesh, batch_buckets=(1, 2, 4, 8))
    # Every bucket must be a multiple of the data-axis size.
    assert sharded.batch_buckets == (8,)
    rng = np.random.RandomState(3)
    video = rng.randn(3, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(3, 1, 64, 301).astype(np.float32)
    ps = sharded.predict_probs(video, audio)
    pb = base.predict_probs(video, audio)
    assert ps.shape == (3, 8)
    np.testing.assert_allclose(ps, pb, atol=1e-5)
    # Staged (async-transfer) path shards too.
    v_dev, a_dev, n = sharded.stage(video, audio)
    np.testing.assert_allclose(
        sharded.predict_probs(v_dev, a_dev, n=n), pb, atol=1e-5
    )


def test_runner_mesh_shardmap_fused_wavlm(wavlm_checkpoint):
    """Fused WavLM Pallas kernels under a dp mesh run via shard_map (each
    device executes the kernels on its batch shard) and match the modular
    auto-sharded path.  On CPU the default gate stays off (modular)."""
    from multimodalemotionrecognition_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    base = JaxModelRunner(wavlm_checkpoint)
    default = JaxModelRunner(wavlm_checkpoint, mesh=mesh, batch_buckets=(4,))
    assert not default._use_shard_map  # CPU backend: auto stays modular
    fused = JaxModelRunner(
        wavlm_checkpoint,
        mesh=mesh,
        batch_buckets=(4,),
        fused_wavlm="interpret",
    )
    assert fused._use_shard_map
    geometry = fused.model_config.wavlm_geometry
    assert geometry["fused_attention"] == "interpret"

    rng = np.random.RandomState(6)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = (rng.randn(2, 1, 48000) * 0.1).astype(np.float32)
    pb = base.predict_probs(video, audio)
    np.testing.assert_allclose(
        fused.predict_probs(video, audio), pb, atol=5e-5
    )
    np.testing.assert_allclose(
        fused.predict_probs_blank_video(audio),
        base.predict_probs_blank_video(audio),
        atol=5e-5,
    )


def test_runner_mesh_shardmap_full_block_kernel(xattn_checkpoint):
    """The full-block xattn kernel (runner fused=True) also runs under a dp
    mesh via shard_map instead of being disabled."""
    from multimodalemotionrecognition_tpu.parallel.mesh import make_mesh

    path, *_ = xattn_checkpoint
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    base = JaxModelRunner(path)
    fused = JaxModelRunner(path, mesh=mesh, batch_buckets=(4,), fused=True)
    assert fused._use_shard_map and fused._fused_forward is not None
    rng = np.random.RandomState(7)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = rng.randn(2, 1, 64, 301).astype(np.float32)
    np.testing.assert_allclose(
        fused.predict_probs(video, audio),
        base.predict_probs(video, audio),
        atol=5e-5,
        rtol=5e-5,
    )


def test_runner_mesh_dp_tp_wavlm_matches_single(wavlm_checkpoint):
    """dp=4 x tp=2 (WavLM trunk tensor-parallel) == unsharded probabilities,
    including the blank-video (audio-only upload) path."""
    from multimodalemotionrecognition_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 2))
    base = JaxModelRunner(wavlm_checkpoint)
    sharded = JaxModelRunner(wavlm_checkpoint, mesh=mesh, batch_buckets=(1, 2, 4))
    assert sharded.batch_buckets == (4,)
    rng = np.random.RandomState(4)
    video = rng.randn(2, 8, 3, 112, 112).astype(np.float32)
    audio = (rng.randn(2, 1, 48000) * 0.1).astype(np.float32)
    np.testing.assert_allclose(
        sharded.predict_probs(video, audio),
        base.predict_probs(video, audio),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        sharded.predict_probs_blank_video(audio),
        base.predict_probs_blank_video(audio),
        atol=2e-5,
    )
