"""Parity tests for the fused WavLM attention core (ops/pallas_wavlm_attn.py).

CPU interpreter mode; the kernel's math must match the modular XLA path of
`models/wavlm.py::WavLMAttentionSelf` (which itself carries HF parity).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalemotionrecognition_tpu.models.wavlm import WavLMConfig, WavLMModel
from multimodalemotionrecognition_tpu.ops.pallas_wavlm_attn import (
    wavlm_fused_attention_sublayer,
)


def _reference_sublayer(hidden, q, k, v, gate, bias, wo, bo, lns, lnb,
                        num_heads, seq_len, eps=1e-5):
    """Plain-jnp transcription of the fused sublayer on natural layout."""
    b, tp, e = q.shape
    h = num_heads
    dh = e // h
    q4 = q.reshape(b, tp, h, dh).transpose(0, 2, 1, 3)
    k4 = k.reshape(b, tp, h, dh).transpose(0, 2, 1, 3)
    v4 = v.reshape(b, tp, h, dh).transpose(0, 2, 1, 3)
    g4 = gate.reshape(b, h, tp, 1).astype(jnp.float32)
    bias4 = bias.reshape(h, tp, tp)
    s = jnp.einsum("bhld,bhsd->bhls", q4, k4, preferred_element_type=jnp.float32)
    s = s + g4 * bias4[None]
    col = jnp.arange(tp)[None, None, None, :]
    s = jnp.where(col < seq_len, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum(
        "bhls,bhsd->bhld", p.astype(v.dtype), v4,
        preferred_element_type=jnp.float32,
    )
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tp, e)
    out = jnp.dot(ctx.astype(v.dtype), wo, preferred_element_type=jnp.float32)
    out = out + bo.reshape(1, e) + hidden.astype(jnp.float32)
    mean = out.mean(-1, keepdims=True)
    var = ((out - mean) ** 2).mean(-1, keepdims=True)
    normed = (out - mean) * jax.lax.rsqrt(var + eps)
    return (normed * lns.reshape(1, e) + lnb.reshape(1, e)).astype(hidden.dtype)


def _random_sublayer_inputs(rng, b, h, tp, dh):
    e = h * dh
    hidden = jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.5)
    q = jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3)
    gate = jnp.asarray(1.0 + rng.rand(b, h * tp, 1).astype(np.float32))
    bias = jnp.asarray(rng.randn(h * tp, tp).astype(np.float32))
    wo = jnp.asarray(rng.randn(e, e).astype(np.float32) * 0.1)
    bo = jnp.asarray(rng.randn(1, e).astype(np.float32) * 0.1)
    lns = jnp.asarray(1.0 + 0.1 * rng.randn(1, e).astype(np.float32))
    lnb = jnp.asarray(0.1 * rng.randn(1, e).astype(np.float32))
    return hidden, q, k, v, gate, bias, wo, bo, lns, lnb


class TestFusedAttentionOp:
    def test_matches_reference_math(self):
        rng = np.random.RandomState(0)
        b, h, tp, dh, seq = 3, 4, 32, 16, 27
        args = _random_sublayer_inputs(rng, b, h, tp, dh)
        got = wavlm_fused_attention_sublayer(
            *args, num_heads=h, seq_len=seq, interpret=True
        )
        want = _reference_sublayer(*args, num_heads=h, seq_len=seq)
        np.testing.assert_allclose(
            np.asarray(got[:, :seq]), np.asarray(want[:, :seq]), atol=2e-5
        )

    def test_padded_rows_do_not_pollute_valid_rows(self):
        """Changing values in padded key rows must not change valid outputs."""
        rng = np.random.RandomState(1)
        b, h, tp, dh, seq = 2, 2, 16, 8, 11
        args = list(_random_sublayer_inputs(rng, b, h, tp, dh))
        out1 = wavlm_fused_attention_sublayer(
            *args, num_heads=h, seq_len=seq, interpret=True
        )
        row = jnp.arange(tp)[None, :, None]
        pad = row >= seq
        args2 = list(args)
        args2[2] = jnp.where(pad, 99.0, args[2])  # k
        args2[3] = jnp.where(pad, -99.0, args[3])  # v
        out2 = wavlm_fused_attention_sublayer(
            *args2, num_heads=h, seq_len=seq, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out1[:, :seq]), np.asarray(out2[:, :seq]), atol=1e-6
        )


SMALL = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_stride=(5, 2, 2),
    conv_kernel=(10, 3, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


class TestFusedAttentionInModel:
    def test_fused_matches_modular_full_model(self):
        cfg_mod = WavLMConfig(**SMALL, fused_attention=False, fused_conv=False)
        cfg_fused = WavLMConfig(
            **SMALL, fused_attention="interpret", fused_conv=False
        )
        rng = np.random.RandomState(2)
        wav = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)

        m_mod = WavLMModel(config=cfg_mod)
        variables = m_mod.init(jax.random.PRNGKey(0), wav[:1])
        out_mod = m_mod.apply(variables, wav)
        m_fused = WavLMModel(config=cfg_fused)
        out_fused = m_fused.apply(variables, wav)

        assert out_mod.shape == out_fused.shape
        np.testing.assert_allclose(
            np.asarray(out_mod), np.asarray(out_fused), atol=2e-5
        )


class TestFusedConvFE:
    def test_op_matches_unfused_layer(self):
        """fused_conv_layer == gelu-then-conv via strided_conv1d_valid."""
        from multimodalemotionrecognition_tpu.ops.audio_conv import (
            strided_conv1d_valid,
        )
        from multimodalemotionrecognition_tpu.ops.activations import gelu_erf
        from multimodalemotionrecognition_tpu.ops.pallas_conv_fe import (
            fused_conv_layer,
        )

        rng = np.random.RandomState(3)
        b, t, cin, cout, k, s = 2, 96, 16, 24, 3, 2
        x = jnp.asarray(rng.randn(b, t, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)

        want = strided_conv1d_valid(gelu_erf(x), w, s)  # [b, t_out, cout]
        t_out = (t - k) // s + 1

        y = x.reshape(b, t // s, s * cin)
        got = fused_conv_layer(
            y, w.reshape(k * cin, cout), k=k, stride=s, cin=cin,
            gelu_input=True, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got[:, :t_out]), np.asarray(want), atol=1e-5
        )

    def test_op_gelu_output_epilogue(self):
        """gelu_output=True == gelu(conv(x)) on the valid rows."""
        from multimodalemotionrecognition_tpu.ops.audio_conv import (
            strided_conv1d_valid,
        )
        from multimodalemotionrecognition_tpu.ops.activations import gelu_erf
        from multimodalemotionrecognition_tpu.ops.pallas_conv_fe import (
            fused_conv_layer,
        )

        rng = np.random.RandomState(7)
        b, t, cin, cout, k, s = 2, 96, 16, 24, 3, 2
        x = jnp.asarray(rng.randn(b, t, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)
        want = gelu_erf(strided_conv1d_valid(x, w, s))
        t_out = (t - k) // s + 1
        y = x.reshape(b, t // s, s * cin)
        got = fused_conv_layer(
            y, w.reshape(k * cin, cout), k=k, stride=s, cin=cin,
            gelu_output=True, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got[:, :t_out]), np.asarray(want), atol=1e-5
        )

    def test_fused_conv_model_matches_modular(self):
        cfg_mod = WavLMConfig(**SMALL, fused_attention=False, fused_conv=False)
        cfg_fused = WavLMConfig(
            **SMALL, fused_attention=False, fused_conv="interpret"
        )
        rng = np.random.RandomState(4)
        wav = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)

        m_mod = WavLMModel(config=cfg_mod)
        variables = m_mod.init(jax.random.PRNGKey(0), wav[:1])
        out_mod = m_mod.apply(variables, wav)
        m_fused = WavLMModel(config=cfg_fused)
        out_fused = m_fused.apply(variables, wav)

        assert out_mod.shape == out_fused.shape
        np.testing.assert_allclose(
            np.asarray(out_mod), np.asarray(out_fused), atol=2e-5
        )

    def test_all_fused_model_matches_modular(self):
        cfg_mod = WavLMConfig(**SMALL, fused_attention=False, fused_conv=False)
        cfg_fused = WavLMConfig(
            **SMALL, fused_attention="interpret", fused_conv="interpret"
        )
        rng = np.random.RandomState(5)
        wav = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)

        m_mod = WavLMModel(config=cfg_mod)
        variables = m_mod.init(jax.random.PRNGKey(0), wav[:1])
        out_mod = m_mod.apply(variables, wav)
        m_fused = WavLMModel(config=cfg_fused)
        out_fused = m_fused.apply(variables, wav)
        np.testing.assert_allclose(
            np.asarray(out_mod), np.asarray(out_fused), atol=2e-5
        )
