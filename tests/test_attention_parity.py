"""Numerical parity of attention primitives against torch built-ins."""

import jax
import numpy as np
import torch

from multimodalemotionrecognition_tpu.models.temporal import (
    TorchTransformerEncoderLayer,
)
from multimodalemotionrecognition_tpu.ops.attention import TorchMultiHeadAttention

from tests.helpers import assert_close, convert


def test_mha_matches_torch_no_mask():
    e, h, b, lq, lk = 32, 4, 3, 5, 7
    torch_mha = torch.nn.MultiheadAttention(e, h, batch_first=True).eval()
    q = np.random.randn(b, lq, e).astype(np.float32)
    k = np.random.randn(b, lk, e).astype(np.float32)
    v = np.random.randn(b, lk, e).astype(np.float32)

    with torch.no_grad():
        ref, _ = torch_mha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))

    flax_mha = TorchMultiHeadAttention(embed_dim=e, num_heads=h)
    jq, jk, jv = map(jax.numpy.asarray, (q, k, v))
    variables, report = convert(torch_mha, flax_mha, jq, jk, jv)
    assert not report.unused_torch_keys
    out = flax_mha.apply(variables, jq, jk, jv)
    assert_close(out, ref.numpy(), atol=1e-5, rtol=1e-5)


def test_mha_matches_torch_with_float_mask():
    e, h, b, lq, lk = 16, 4, 2, 4, 6
    torch_mha = torch.nn.MultiheadAttention(e, h, batch_first=True).eval()
    q = np.random.randn(b, lq, e).astype(np.float32)
    kv = np.random.randn(b, lk, e).astype(np.float32)
    bias = np.random.randn(b, lq, lk).astype(np.float32)

    # torch expects [B*H, L, S] (reference expands via repeat_interleave,
    # src/models/fusion.py:351-354).
    torch_bias = torch.from_numpy(bias).repeat_interleave(h, dim=0)
    with torch.no_grad():
        ref, _ = torch_mha(
            torch.from_numpy(q),
            torch.from_numpy(kv),
            torch.from_numpy(kv),
            attn_mask=torch_bias,
        )

    flax_mha = TorchMultiHeadAttention(embed_dim=e, num_heads=h)
    jq, jkv, jb = map(jax.numpy.asarray, (q, kv, bias))
    variables, _ = convert(torch_mha, flax_mha, jq, jkv, jkv)
    out = flax_mha.apply(variables, jq, jkv, jkv, bias=jb)
    assert_close(out, ref.numpy(), atol=1e-5, rtol=1e-5)


def test_transformer_encoder_layer_matches_torch():
    d, h, ffn, b, t = 24, 4, 96, 2, 9
    torch_layer = torch.nn.TransformerEncoderLayer(
        d_model=d,
        nhead=h,
        dim_feedforward=ffn,
        dropout=0.1,
        activation="gelu",
        batch_first=True,
        norm_first=True,
    ).eval()
    x = np.random.randn(b, t, d).astype(np.float32)
    with torch.no_grad():
        ref = torch_layer(torch.from_numpy(x))

    flax_layer = TorchTransformerEncoderLayer(d_model=d, nhead=h, dim_feedforward=ffn)
    jx = jax.numpy.asarray(x)
    variables, _ = convert(torch_layer, flax_layer, jx)
    out = flax_layer.apply(variables, jx)
    assert_close(out, ref.numpy(), atol=1e-5, rtol=1e-5)
