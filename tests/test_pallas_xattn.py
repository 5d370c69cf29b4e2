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
