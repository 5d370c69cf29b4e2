"""Fused Pallas cross-attention kernel vs the modular Flax path
(interpret mode on CPU; the real-TPU run happens in bench/serving)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalemotionrecognition_tpu.ops.attention import TorchMultiHeadAttention
from multimodalemotionrecognition_tpu.ops.pallas_xattn import (
    XattnParams,
    fused_bidirectional_xattn,
)

import flax.linen as nn

B, T, TA, D, H = 2, 8, 149, 128, 4


class _ModularBlock(nn.Module):
    """The exact xattn fusion block from FusionModel (mean pooling, eval)."""

    @nn.compact
    def __call__(self, v, a, v2a_bias=None, a2v_bias=None):
        v2 = TorchMultiHeadAttention(embed_dim=D, num_heads=H, name="v2a_attn")(
            v, a, a, bias=v2a_bias
        )
        v = nn.LayerNorm(epsilon=1e-5, name="v_norm")(v + v2)
        a2 = TorchMultiHeadAttention(embed_dim=D, num_heads=H, name="a2v_attn")(
            a, v, v, bias=a2v_bias
        )
        a = nn.LayerNorm(epsilon=1e-5, name="a_norm")(a + a2)
        return jnp.mean(v, axis=1), jnp.mean(a, axis=1)


def _setup(bias=False):
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    a = jnp.asarray(rng.randn(B, TA, D).astype(np.float32))
    v2a_bias = a2v_bias = None
    if bias:
        v2a_bias = jnp.asarray(rng.randn(B, T, TA).astype(np.float32) * 0.1)
        a2v_bias = jnp.asarray(rng.randn(B, TA, T).astype(np.float32) * 0.1)
    model = _ModularBlock()
    variables = model.init(jax.random.PRNGKey(1), v, a, v2a_bias, a2v_bias)
    p = variables["params"]
    params = XattnParams(
        v2a_in_kernel=p["v2a_attn"]["in_proj_kernel"],
        v2a_in_bias=p["v2a_attn"]["in_proj_bias"],
        v2a_out_kernel=p["v2a_attn"]["out_proj"]["kernel"],
        v2a_out_bias=p["v2a_attn"]["out_proj"]["bias"],
        a2v_in_kernel=p["a2v_attn"]["in_proj_kernel"],
        a2v_in_bias=p["a2v_attn"]["in_proj_bias"],
        a2v_out_kernel=p["a2v_attn"]["out_proj"]["kernel"],
        a2v_out_bias=p["a2v_attn"]["out_proj"]["bias"],
        v_norm_scale=p["v_norm"]["scale"],
        v_norm_bias=p["v_norm"]["bias"],
        a_norm_scale=p["a_norm"]["scale"],
        a_norm_bias=p["a_norm"]["bias"],
    )
    return model, variables, params, v, a, v2a_bias, a2v_bias


@pytest.mark.parametrize("bias", [False, True])
def test_fused_matches_modular(bias):
    model, variables, params, v, a, v2a_bias, a2v_bias = _setup(bias)
    ref_v, ref_a = model.apply(variables, v, a, v2a_bias, a2v_bias)
    out_v, out_a = fused_bidirectional_xattn(
        params, v, a, v2a_bias, a2v_bias, num_heads=H, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a), atol=2e-5, rtol=2e-5)


def test_fused_output_shapes():
    _, _, params, v, a, *_ = _setup()
    out_v, out_a = fused_bidirectional_xattn(params, v, a, num_heads=H, interpret=True)
    assert out_v.shape == (B, D) and out_a.shape == (B, D)


# ---------------------------------------------------------------------------
# Batched (multi-sample-per-program) full-block kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "pooling,head,prior",
    [("mean", "concat", False), ("attn", "gated", False),
     ("attn", "concat", True)],
)
def test_fused_block_batched_matches_modular(pooling, head, prior):
    """S=8 samples-per-program variant of the full-block kernel == modular
    FusionModel forward (interpret mode; the per-sample S=1 kernel is
    covered via the runner tests)."""
    from multimodalemotionrecognition_tpu.models.fusion import FusionModel
    from multimodalemotionrecognition_tpu.ops.pallas_fused_block import (
        FusedBlockSpec,
        build_fused_block_fn,
        extract_block_params,
    )

    class _FrameStub(nn.Module):
        def encode_frames(self, video, train=False):
            return video

    class _SeqStub(nn.Module):
        def encode_sequence(self, audio, train=False):
            return audio

    model = FusionModel(
        audio_model=_SeqStub(), video_model=_FrameStub(), num_classes=8,
        mode="xattn", xattn_head=head, d_model=D, xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0, temporal_pooling=pooling,
        xattn_use_emotion_prior=prior,
    )
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(8, T, 512).astype(np.float32))
    a = jnp.asarray(rng.randn(8, TA, 768).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), v, a)
    spec = FusedBlockSpec(num_heads=H, d_model=D, pooling=pooling, head=head,
                          use_prior=prior, num_classes=8)
    args, layout = extract_block_params(variables["params"], spec, {})
    fn = build_fused_block_fn(spec, layout, interpret=True,
                              samples_per_program=8)
    ref, _ = model.apply(variables, v, a)
    np.testing.assert_allclose(
        np.asarray(fn(v, a, *args)), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_fused_block_batched_s_fallback():
    """Ta=149 (odd) makes S*Ta % 8 != 0 for any S not a multiple of 8: the
    builder must quietly fall back to the per-sample kernel (Mosaic rejects
    non-8-divisible sublane block dims on hardware)."""
    from multimodalemotionrecognition_tpu.models.fusion import FusionModel
    from multimodalemotionrecognition_tpu.ops.pallas_fused_block import (
        FusedBlockSpec,
        build_fused_block_fn,
        extract_block_params,
    )

    class _FrameStub(nn.Module):
        def encode_frames(self, video, train=False):
            return video

    class _SeqStub(nn.Module):
        def encode_sequence(self, audio, train=False):
            return audio

    model = FusionModel(
        audio_model=_SeqStub(), video_model=_FrameStub(), num_classes=8,
        mode="xattn", d_model=D, xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
    )
    rng = np.random.RandomState(4)
    v = jnp.asarray(rng.randn(4, T, 512).astype(np.float32))
    a = jnp.asarray(rng.randn(4, TA, 768).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), v, a)
    spec = FusedBlockSpec(num_heads=H, d_model=D, pooling="mean",
                          head="concat", use_prior=False, num_classes=8)
    args, layout = extract_block_params(variables["params"], spec, {})
    fn = build_fused_block_fn(spec, layout, interpret=True,
                              samples_per_program=8)  # b=4 -> S falls to 1
    ref, _ = model.apply(variables, v, a)
    np.testing.assert_allclose(
        np.asarray(fn(v, a, *args)), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
