"""Numerical parity of the Flax WavLM against HF transformers' torch WavLM.

Random-initialized HF models (offline-safe, like the reference's fallback at
`src/models/wavlm_audio.py:35-41`) are converted through the generic converter
and compared through the encoder wrapper surface
(`encode_sequence` / full classify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn
from transformers import WavLMConfig as HFWavLMConfig
from transformers import WavLMModel as HFWavLMModel

from multimodalemotionrecognition_tpu.models.wavlm import (
    WavLMAudioEncoder,
    WavLMConfig,
)

from tests.helpers import assert_close, convert
from tests.torch_ref import RefTemporalPooler

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


def _hf_config(small: dict) -> HFWavLMConfig:
    return HFWavLMConfig(
        hidden_size=small["hidden_size"],
        num_hidden_layers=small["num_hidden_layers"],
        num_attention_heads=small["num_attention_heads"],
        intermediate_size=small["intermediate_size"],
        conv_dim=list(small["conv_dim"]),
        conv_stride=list(small["conv_stride"]),
        conv_kernel=list(small["conv_kernel"]),
        num_feat_extract_layers=len(small["conv_dim"]),
        num_conv_pos_embeddings=small["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=small["num_conv_pos_embedding_groups"],
        do_stable_layer_norm=False,
        feat_extract_norm="group",
    )


class RefWavLMAudioEncoder(nn.Module):
    """Torch oracle for the reference wrapper (src/models/wavlm_audio.py)."""

    def __init__(self, num_classes, hf_config, embedding_dim=64, pooling="mean"):
        super().__init__()
        self.wavlm = HFWavLMModel(hf_config)
        hidden = hf_config.hidden_size
        self.temporal_pool = RefTemporalPooler(hidden, mode=pooling)
        self.classifier = nn.Sequential(
            nn.Linear(hidden, embedding_dim),
            nn.ReLU(inplace=True),
            nn.Dropout(0.2),
            nn.Linear(embedding_dim, num_classes),
        )

    def encode_sequence(self, x):
        if x.dim() == 3:
            x = x.squeeze(1)
        return self.wavlm(x).last_hidden_state

    def forward(self, x):
        return self.classifier(self.temporal_pool(self.encode_sequence(x)))


def _build_pair(pooling="mean", embedding_dim=64):
    torch.manual_seed(0)
    torch_model = RefWavLMAudioEncoder(
        num_classes=8, hf_config=_hf_config(SMALL), embedding_dim=embedding_dim,
        pooling=pooling,
    ).eval()
    flax_model = WavLMAudioEncoder(
        num_classes=8,
        embedding_dim=embedding_dim,
        wavlm_config=WavLMConfig(**SMALL),
        temporal_pooling=pooling,
    )
    return torch_model, flax_model


@pytest.mark.parametrize("pooling", ["mean", "attn"])
def test_wavlm_encoder_parity_small(pooling):
    torch_model, flax_model = _build_pair(pooling=pooling)
    wav = np.random.RandomState(0).randn(2, 1, 3200).astype(np.float32) * 0.1

    with torch.no_grad():
        ref_seq = torch_model.encode_sequence(torch.from_numpy(wav))
        ref_logits = torch_model(torch.from_numpy(wav))

    jw = jnp.asarray(wav)
    variables, report = convert(torch_model, flax_model, jw)
    assert not report.missing_flax_paths
    # position_ids-style buffers may be unused but nothing else should be
    assert all("position" in k or "masked" in k for k in report.unused_torch_keys), (
        report.unused_torch_keys
    )

    seq = flax_model.apply(variables, jw, method="encode_sequence")
    assert seq.shape == ref_seq.shape
    assert_close(seq, ref_seq.numpy(), atol=2e-4, rtol=2e-4)

    logits = flax_model.apply(variables, jw)
    assert_close(logits, ref_logits.numpy(), atol=2e-4, rtol=2e-4)


def test_wavlm_base_full_size_parity():
    """Full microsoft/wavlm-base geometry (12 layers, 768 hidden), random
    weights, 1 s of audio -> 49 frames."""
    torch.manual_seed(1)
    hf = HFWavLMModel(HFWavLMConfig()).eval()

    class Wrap(nn.Module):
        def __init__(self):
            super().__init__()
            self.wavlm = hf

        def forward(self, x):
            return self.wavlm(x).last_hidden_state

    torch_model = Wrap().eval()
    flax_model = WavLMAudioEncoder(num_classes=8)

    wav = np.random.RandomState(2).randn(1, 16000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(wav))

    jw = jnp.asarray(wav)
    variables, report = convert(torch_model, flax_model, jw, strict=False)
    # Only head params (classifier/pool) should be missing from this
    # backbone-only torch source.
    assert all(
        "classifier" in p or "temporal_pool" in p for p in report.missing_flax_paths
    ), report.missing_flax_paths

    seq = flax_model.apply(variables, jw, method="encode_sequence")
    assert seq.shape == ref.shape
    assert_close(seq, ref.numpy(), atol=5e-4, rtol=5e-4)


def test_wavlm_sequence_dim_contract():
    flax_model = WavLMAudioEncoder(num_classes=8)
    assert flax_model.sequence_dim == 768
    assert flax_model.embedding_dim == 768
