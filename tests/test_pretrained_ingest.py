"""Pretrained-backbone ingestion (reference inits: torchvision
`resnet18(IMAGENET1K_V1)`, `src/models/video.py:21-23`, and HF
`microsoft/wavlm-base`, `src/models/wavlm_audio.py:30-34`).

The raw-state-dict fixtures are generated from the torch oracles, so the test
covers real key spaces (conv1/bn1/layerK for torchvision; trunk modules for
HF WavLMModel) without downloading weights.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multimodalemotionrecognition_tpu.config import ModelConfig
from multimodalemotionrecognition_tpu.convert.pretrained import (
    convert_pretrained,
    hf_wavlm_to_audio_branch,
    torchvision_resnet_to_video_branch,
)
from multimodalemotionrecognition_tpu.convert.torch_import import (
    load_reference_checkpoint,
    torch_state_dict_to_flax,
)
from multimodalemotionrecognition_tpu.models.factory import build_model

from tests.torch_ref import RefVideoNet


_SEQ_TO_TORCHVISION = {
    "0": "conv1",
    "1": "bn1",
    "4": "layer1",
    "5": "layer2",
    "6": "layer3",
    "7": "layer4",
}


def _raw_torchvision_sd(ref: RefVideoNet):
    """Invert the children[:-1] Sequential naming back to torchvision's
    (conv1/bn1/layer1..4) and add a dummy 1000-class fc head."""
    raw = {}
    for key, value in ref.state_dict().items():
        m = re.match(r"^backbone\.(\d)\.(.*)$", key)
        if m is None:
            continue  # temporal pooler / classifier head: not torchvision's
        raw[f"{_SEQ_TO_TORCHVISION[m.group(1)]}.{m.group(2)}"] = value
    raw["fc.weight"] = torch.zeros(1000, 512)
    raw["fc.bias"] = torch.zeros(1000)
    return raw


def test_resnet18_ingestion_forward_parity(tmp_path):
    torch.manual_seed(0)
    ref = RefVideoNet(num_classes=8).eval()
    raw = _raw_torchvision_sd(ref)
    raw_path = tmp_path / "resnet18-imagenet.pth"
    torch.save(raw, raw_path)

    out = convert_pretrained("resnet18", raw_path, tmp_path / "video_imagenet.pt")
    sd, config = load_reference_checkpoint(out)
    assert config["branch"] == "video"
    assert not any(k.startswith("fc.") for k in sd)

    # Warm-start the flax VideoNet from the branch checkpoint and check the
    # backbone features match the torch oracle (head stays random -> compare
    # the 512-d encoded features, not logits).
    cfg = ModelConfig(fusion="video", num_classes=8, spec_augment=False)
    model = build_model(cfg)
    video = np.random.RandomState(0).randn(2, 4, 3, 64, 64).astype(np.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(video))
    )
    filled, report = torch_state_dict_to_flax(sd, template, strict=False)
    # every backbone tensor must land; only pooler/head may be missing
    assert all(
        "backbone" not in p for p in report.missing_flax_paths
    ), report.missing_flax_paths[:5]
    assert report.unused_torch_keys == ()

    filled = jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, np.float32)
        if isinstance(leaf, jax.ShapeDtypeStruct)
        else leaf,
        filled,
    )
    feats = model.apply(filled, jnp.asarray(video), method="encode_frames")
    with torch.no_grad():
        b, t, c, h, w = video.shape
        x = torch.from_numpy(video).view(b * t, c, h, w)
        ref_feats = ref.backbone(x).view(b, t, 512).numpy()
    np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=5e-4)


def test_wavlm_ingestion_key_space(tmp_path):
    """A bare WavLMModel dump (no `wavlm.` prefix) and a prefixed wrapper dump
    must both land on the audio branch's exact `wavlm.*` key space."""
    from flax.traverse_util import flatten_dict

    from multimodalemotionrecognition_tpu.convert.torch_import import (
        flax_to_torch_state_dict,
    )

    from multimodalemotionrecognition_tpu.models.wavlm import (
        WavLMAudioEncoder,
        WavLMConfig,
    )

    from tests.test_wavlm_parity import SMALL

    model = WavLMAudioEncoder(num_classes=8, wavlm_config=WavLMConfig(**SMALL))
    audio = jnp.zeros((1, 1, 16000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio)
    full_sd = flax_to_torch_state_dict(variables)
    wavlm_keys = {k for k in full_sd if k.startswith("wavlm.")}

    # Simulate the raw HF WavLMModel dump: strip the wrapper prefix.
    bare = {k[len("wavlm.") :]: v for k, v in full_sd.items() if k in wavlm_keys}
    converted = hf_wavlm_to_audio_branch(bare)
    assert set(converted) == wavlm_keys

    prefixed = {k: v for k, v in full_sd.items() if k in wavlm_keys}
    prefixed["lm_head.weight"] = np.zeros((4, 4), np.float32)  # dropped
    assert set(hf_wavlm_to_audio_branch(prefixed)) == wavlm_keys

    # End-to-end through the CLI entry: file in, branch checkpoint out,
    # loadable into the flax template with zero unused trunk keys.
    raw_path = tmp_path / "pytorch_model.bin"
    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in bare.items()},
        raw_path,
    )
    out = convert_pretrained("wavlm-base", raw_path, tmp_path / "audio_wavlm.pt")
    sd, _ = load_reference_checkpoint(out)
    filled, report = torch_state_dict_to_flax(sd, variables, strict=False)
    assert report.unused_torch_keys == ()
    missing = [p for p in report.missing_flax_paths if "classifier" not in p]
    assert missing == []
    # The warm-started trunk is numerically identical to the source variables.
    src = flatten_dict(variables["params"])
    dst = flatten_dict(filled["params"])
    for path in src:
        if path[0] == "wavlm":
            np.testing.assert_array_equal(np.asarray(src[path]), np.asarray(dst[path]))


def test_ingestion_rejects_wrong_arch(tmp_path):
    with pytest.raises((KeyError, ValueError)):
        torchvision_resnet_to_video_branch({"encoder.layers.0.w": np.zeros(2)})
    with pytest.raises(ValueError):
        hf_wavlm_to_audio_branch({"conv1.weight": np.zeros(2)})
