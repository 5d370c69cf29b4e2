"""Custom VJP of the fused WavLM attention sublayer.

`ops/pallas_wavlm_attn.py` pairs the forward kernel with a flash-style
recompute backward kernel (`_sublayer_bwd_kernel`) via jax.custom_vjp, so
TRAINABLE encoder layers can run fused in the train step — not just the
stop-gradient'd frozen prefix (reference regime: stage-2 finetuning
unfreezes the last N WavLM layers, `src/train.py:819-822`).

Verification strategy: a plain-jnp twin of the kernel math (including the
stateless hash-RNG dropout, which is bit-identical between Mosaic and the
CPU interpreter) is differentiated with JAX autodiff and compared against
the custom VJP (kernels in interpret mode) for every tensor input, with and
without dropout, padded and unpadded.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.ops.pallas_wavlm_attn import (
    _drop_threshold,
    _hash_keep,
    wavlm_fused_attention_sublayer,
)


def _reference_sublayer(
    seed, hidden, q, k, v, gate, bias, wo, bo, lns, lnb,
    num_heads, seq_len, eps=1e-5, attn_dropout=0.0, hidden_dropout=0.0,
):
    """Differentiable jnp twin of `_sublayer_kernel` (same math, same hash
    dropout streams, batch loop unrolled in Python)."""
    b, tp, e = hidden.shape
    dh = e // num_heads
    if tp != seq_len:
        col = jnp.arange(tp)[None, :]
        pad_mask = jnp.broadcast_to(col >= seq_len, (tp, tp))
    else:
        pad_mask = None
    outs = []
    for bb in range(b):
        base = seed[0].astype(jnp.uint32) + jnp.uint32(
            (bb * 0x632BE59B) & 0xFFFFFFFF
        )
        acc = jnp.zeros((tp, e), jnp.float32)
        for h in range(num_heads):
            qh = q[bb, :, h * dh:(h + 1) * dh]
            kh = k[bb, :, h * dh:(h + 1) * dh]
            vh = v[bb, :, h * dh:(h + 1) * dh]
            scores = (qh @ kh.T).astype(jnp.float32)
            scores = scores + gate[bb, h * tp:(h + 1) * tp] * bias[
                h * tp:(h + 1) * tp
            ]
            if pad_mask is not None:
                scores = jnp.where(pad_mask, jnp.float32(-1e30), scores)
            probs = jax.nn.softmax(scores, axis=-1)
            if attn_dropout > 0.0:
                keep = _hash_keep(
                    base + jnp.uint32(((h + 1) * 0x9E3779B9) & 0xFFFFFFFF),
                    (tp, tp),
                    _drop_threshold(attn_dropout),
                )
                probs = jnp.where(keep, probs / (1.0 - attn_dropout), 0.0)
            ctx = probs.astype(v.dtype) @ vh
            acc = acc + (
                ctx.astype(v.dtype) @ wo[h * dh:(h + 1) * dh]
            ).astype(jnp.float32)
        proj = acc + bo
        if hidden_dropout > 0.0:
            keep = _hash_keep(
                base + jnp.uint32(0x7FEB352D), (tp, e),
                _drop_threshold(hidden_dropout),
            )
            proj = jnp.where(keep, proj / (1.0 - hidden_dropout), 0.0)
        out = proj + hidden[bb].astype(jnp.float32)
        mean = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
        normed = (out - mean) * jax.lax.rsqrt(var + eps)
        outs.append((normed * lns + lnb).astype(hidden.dtype))
    return jnp.stack(outs)


def _inputs(b=2, h=4, tp=16, dh=8, seed=0):
    rng = np.random.RandomState(seed)
    e = h * dh
    return dict(
        hidden=jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.5),
        q=jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3),
        k=jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3),
        v=jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3),
        gate=jnp.asarray(1.0 + rng.rand(b, h * tp, 1).astype(np.float32)),
        bias=jnp.asarray(rng.randn(h * tp, tp).astype(np.float32)),
        wo=jnp.asarray(rng.randn(e, e).astype(np.float32) * 0.1),
        bo=jnp.asarray(rng.randn(1, e).astype(np.float32) * 0.1),
        lns=jnp.asarray(1.0 + 0.1 * rng.randn(1, e).astype(np.float32)),
        lnb=jnp.asarray(0.1 * rng.randn(1, e).astype(np.float32)),
    )


def _grads(fn, args, cot_seed=7):
    """Cotangent-weighted scalar loss -> grads for every tensor input."""
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


class TestVjpMatchesAutodiff:
    @pytest.mark.parametrize(
        "attn_p,hid_p,seq_len",
        [(0.0, 0.0, 16), (0.0, 0.0, 13), (0.1, 0.1, 16), (0.2, 0.1, 13)],
    )
    def test_all_input_grads(self, attn_p, hid_p, seq_len):
        args = _inputs()
        seed = jnp.asarray([5], jnp.int32)
        statics = dict(
            num_heads=4, seq_len=seq_len, attn_dropout=attn_p,
            hidden_dropout=hid_p,
        )

        def kernel_fn(**tensors):
            return wavlm_fused_attention_sublayer(
                tensors["hidden"], tensors["q"], tensors["k"], tensors["v"],
                tensors["gate"], tensors["bias"], tensors["wo"],
                tensors["bo"], tensors["lns"], tensors["lnb"],
                dropout_seed=seed, interpret=True, **statics,
            )

        def ref_fn(**tensors):
            return _reference_sublayer(seed, **tensors, **statics)

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
                        f"(attn_p={attn_p}, hid_p={hid_p}, seq_len={seq_len})",
            )

    def test_padded_rows_get_zero_grads(self):
        """Upstream cotangents that are zero on padded rows must produce
        exactly-zero q/k/v/hidden grads on those rows (so padding can flow
        through a stack of fused layers without leaking gradient)."""
        args = _inputs(tp=16)
        seq_len = 12
        seed = jnp.asarray([3], jnp.int32)

        def loss(hidden, q, k, v):
            out = wavlm_fused_attention_sublayer(
                hidden, q, k, v, args["gate"], args["bias"], args["wo"],
                args["bo"], args["lns"], args["lnb"], num_heads=4,
                seq_len=seq_len, attn_dropout=0.1, hidden_dropout=0.1,
                dropout_seed=seed, interpret=True,
            )
            return jnp.sum(out[:, :seq_len] ** 2)

        gh, gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2, 3))(
            args["hidden"], args["q"], args["k"], args["v"]
        )
        for name, g in [("hidden", gh), ("q", gq), ("k", gk), ("v", gv)]:
            pad = np.asarray(g)[:, seq_len:]
            np.testing.assert_array_equal(
                pad, np.zeros_like(pad), err_msg=f"{name} pad rows"
            )
            assert np.abs(np.asarray(g)[:, :seq_len]).max() > 0.0

    def test_bf16_grads_close_to_f32(self):
        """Smoke: bf16 operands differentiate and land near the f32 grads."""
        args = _inputs()
        seed = jnp.asarray([1], jnp.int32)

        def loss(dtype, q):
            out = wavlm_fused_attention_sublayer(
                args["hidden"].astype(dtype), q, args["k"].astype(dtype),
                args["v"].astype(dtype), args["gate"], args["bias"],
                args["wo"].astype(dtype), args["bo"], args["lns"],
                args["lnb"], num_heads=4, seq_len=16, dropout_seed=seed,
                interpret=True,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g32 = jax.grad(lambda q: loss(jnp.float32, q))(args["q"])
        g16 = jax.grad(lambda q: loss(jnp.bfloat16, q))(
            args["q"].astype(jnp.bfloat16)
        )
        np.testing.assert_allclose(
            np.asarray(g16).astype(np.float32), np.asarray(g32),
            atol=0.15, rtol=0.1,
        )
