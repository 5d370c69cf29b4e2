"""Fused WavLM MLP sublayer (ops/pallas_wavlm_mlp.py): forward parity and
custom-VJP gradients, CPU interpreter mode.

Same verification strategy as tests/test_wavlm_attn_vjp.py: a plain-jnp twin
of the kernel math (rational-erf GELU + the stateless hash-RNG dropout, which
is bit-identical between Mosaic and the interpreter) is differentiated with
JAX autodiff and compared against the custom VJP for every tensor input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.ops.activations import gelu_erf
from multimodalemotionrecognition_tpu.ops.pallas_wavlm_attn import (
    _drop_threshold,
    _hash_keep,
)
from multimodalemotionrecognition_tpu.ops.pallas_wavlm_mlp import (
    wavlm_fused_mlp_sublayer,
)


def _reference_mlp(seed, hidden, w1, b1, w2, b2, lns, lnb,
                   eps=1e-5, act_dropout=0.0, hidden_dropout=0.0):
    """Differentiable jnp twin of `_mlp_kernel` (batch loop unrolled)."""
    b, tp, e = hidden.shape
    outs = []
    for bb in range(b):
        base = seed[0].astype(jnp.uint32) + jnp.uint32(
            (bb * 0x9E3779B1) & 0xFFFFFFFF
        )
        ff1 = (hidden[bb] @ w1).astype(jnp.float32) + b1.reshape(1, -1)
        a = gelu_erf(ff1)
        if act_dropout > 0.0:
            keep = _hash_keep(
                base + jnp.uint32(0x2545F491), ff1.shape,
                _drop_threshold(act_dropout),
            )
            a = jnp.where(keep, a / (1.0 - act_dropout), 0.0)
        y = (a.astype(hidden.dtype) @ w2).astype(jnp.float32) + b2.reshape(1, -1)
        if hidden_dropout > 0.0:
            keep = _hash_keep(
                base + jnp.uint32(0x41C64E6D), y.shape,
                _drop_threshold(hidden_dropout),
            )
            y = jnp.where(keep, y / (1.0 - hidden_dropout), 0.0)
        out = y + hidden[bb].astype(jnp.float32)
        mean = out.mean(-1, keepdims=True)
        var = ((out - mean) ** 2).mean(-1, keepdims=True)
        normed = (out - mean) * jax.lax.rsqrt(var + eps)
        outs.append(
            (normed * lns.reshape(1, -1) + lnb.reshape(1, -1)).astype(
                hidden.dtype
            )
        )
    return jnp.stack(outs)


def _inputs(b=2, tp=16, e=32, f=64, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        hidden=jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.5),
        w1=jnp.asarray(rng.randn(e, f).astype(np.float32) * 0.2),
        b1=jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(f, e).astype(np.float32) * 0.2),
        b2=jnp.asarray(rng.randn(e).astype(np.float32) * 0.1),
        lns=jnp.asarray(1.0 + 0.1 * rng.randn(e).astype(np.float32)),
        lnb=jnp.asarray(0.1 * rng.randn(e).astype(np.float32)),
    )


def _grads(fn, args, cot_seed=7):
    names = list(args.keys())
    rng = np.random.RandomState(cot_seed)
    out0 = fn(**args)
    cot = jnp.asarray(rng.randn(*out0.shape).astype(np.float32))

    def loss(*tensors):
        return jnp.sum(fn(**dict(zip(names, tensors))) * cot)

    g = jax.grad(loss, argnums=tuple(range(len(names))))(
        *[args[n] for n in names]
    )
    return dict(zip(names, g)), out0


class TestFusedMlpOp:
    @pytest.mark.parametrize(
        "act_p,hid_p", [(0.0, 0.0), (0.1, 0.1), (0.2, 0.05)]
    )
    def test_forward_and_all_input_grads(self, act_p, hid_p):
        args = _inputs()
        seed = jnp.asarray([5], jnp.int32)
        statics = dict(act_dropout=act_p, hidden_dropout=hid_p)

        def kernel_fn(**tensors):
            return wavlm_fused_mlp_sublayer(
                tensors["hidden"], tensors["w1"], tensors["b1"],
                tensors["w2"], tensors["b2"], tensors["lns"], tensors["lnb"],
                dropout_seed=seed, interpret=True, **statics,
            )

        def ref_fn(**tensors):
            return _reference_mlp(seed, **tensors, **statics)

        got, out_k = _grads(kernel_fn, args)
        want, out_r = _grads(ref_fn, args)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_r), atol=1e-5
        )
        for name in args:
            np.testing.assert_allclose(
                np.asarray(got[name]), np.asarray(want[name]),
                atol=2e-4, rtol=2e-4,
                err_msg=f"grad mismatch for {name} "
                        f"(act_p={act_p}, hid_p={hid_p})",
            )

    def test_padded_rows_get_zero_grads(self):
        """Zero upstream cotangents on padded rows -> exactly-zero dhidden
        there and no contribution to the shared param grads (checked by
        comparing dW1 against the twin restricted to valid rows)."""
        args = _inputs(tp=16)
        seq_len = 11
        seed = jnp.asarray([3], jnp.int32)

        def loss_kernel(hidden, w1):
            out = wavlm_fused_mlp_sublayer(
                hidden, w1, args["b1"], args["w2"], args["b2"], args["lns"],
                args["lnb"], act_dropout=0.1, hidden_dropout=0.1,
                dropout_seed=seed, interpret=True,
            )
            return jnp.sum(out[:, :seq_len] ** 2)

        gh, gw1 = jax.grad(loss_kernel, argnums=(0, 1))(
            args["hidden"], args["w1"]
        )
        pad = np.asarray(gh)[:, seq_len:]
        np.testing.assert_array_equal(pad, np.zeros_like(pad))
        assert np.abs(np.asarray(gh)[:, :seq_len]).max() > 0.0

        def loss_ref(hidden, w1):
            out = _reference_mlp(
                seed, hidden, w1, args["b1"], args["w2"], args["b2"],
                args["lns"], args["lnb"], act_dropout=0.1, hidden_dropout=0.1,
            )
            return jnp.sum(out[:, :seq_len] ** 2)

        gw1_ref = jax.grad(loss_ref, argnums=1)(args["hidden"], args["w1"])
        np.testing.assert_allclose(
            np.asarray(gw1), np.asarray(gw1_ref), atol=2e-4, rtol=2e-4
        )

    def test_bf16_grads_close_to_f32(self):
        args = _inputs()
        seed = jnp.asarray([1], jnp.int32)

        def loss(dtype, w1):
            out = wavlm_fused_mlp_sublayer(
                args["hidden"].astype(dtype), w1, args["b1"],
                args["w2"].astype(dtype), args["b2"], args["lns"],
                args["lnb"], dropout_seed=seed, interpret=True,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g32 = jax.grad(lambda w: loss(jnp.float32, w))(args["w1"])
        g16 = jax.grad(lambda w: loss(jnp.bfloat16, w))(
            args["w1"].astype(jnp.bfloat16)
        )
        np.testing.assert_allclose(
            np.asarray(g16).astype(np.float32), np.asarray(g32),
            atol=0.3, rtol=0.1,
        )


class TestFusedMlpInModel:
    def test_fused_mlp_matches_modular_full_model(self):
        """WavLMModel with fused_attention+fused_mlp in interpreter mode
        matches the fully-modular model on the same params (eval path)."""
        from multimodalemotionrecognition_tpu.models.wavlm import (
            WavLMConfig,
            WavLMModel,
        )

        small = dict(
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
        cfg_mod = WavLMConfig(
            **small, fused_attention=False, fused_conv=False, fused_mlp=False
        )
        cfg_fused = WavLMConfig(
            **small, fused_attention="interpret", fused_conv=False,
            fused_mlp="interpret",
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
