#!/usr/bin/env python
"""Generate golden parity fixtures from the ACTUAL reference model code.

Round-1 parity tests compare against self-authored torch oracles
(`tests/torch_ref.py`); a shared misreading of the reference would pass
every test.  This script closes that hole: it imports the reference's own
model definitions (`/root/reference/src/models/{fusion,temporal,audio}.py`
— the torchvision-free subset), runs them on fixed inputs in eval mode,
and records (state_dict, inputs, outputs) as `.npz` fixtures under
`tests/fixtures/`.  `tests/test_reference_golden.py` replays the state
dicts through the mechanical converter into the Flax models and compares
logits — drift between `torch_ref.py` and the reference becomes a test
failure.

The fusion fixtures drive the reference `FusionModel` with PARAMLESS stub
branches (flatten video / mean-pool mel), so every parameter in the fixture
belongs to reference fusion code and the mel-fallback `audio_time_conv`
path (dormant with the built-in encoders) gets exercised too.

Run (regenerates fixtures; requires /root/reference):
    python tools/gen_reference_fixtures.py
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import numpy as np
import torch
from torch import nn

REFERENCE = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

# audio.py does `import torchaudio.transforms as T` but never uses it;
# torchaudio is not installed here, so satisfy the import with a stub.
if "torchaudio" not in sys.modules:
    ta = types.ModuleType("torchaudio")
    ta.transforms = types.ModuleType("torchaudio.transforms")
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = ta.transforms

sys.path.insert(0, str(REFERENCE))
from src.models.audio import AudioNet  # noqa: E402
from src.models.fusion import FusionModel  # noqa: E402


class VideoStub(nn.Module):
    """Paramless video branch: backbone flattens pixels, encode mean-pools
    frames.  embedding_dim = 3*H*W so every downstream weight is fusion's."""

    def __init__(self, c=3, h=8, w=8):
        super().__init__()
        self.embedding_dim = c * h * w
        self.backbone = nn.Flatten()

    def encode(self, video):  # [B,T,3,H,W] -> [B, D]
        b, t = video.shape[:2]
        return video.reshape(b, t, -1).mean(dim=1)


class AudioStub(nn.Module):
    """Paramless mel branch WITHOUT encode_sequence -> the reference's
    mel-fallback (`audio_time_conv`) path runs in xattn mode."""

    def __init__(self, n_mels=64):
        super().__init__()
        self.embedding_dim = n_mels

    def encode(self, audio):  # [B,1,n_mels,Ta] -> [B, n_mels]
        return audio.squeeze(1).mean(dim=-1)


class LinearHeadStub(nn.Module):
    """Late-fusion branch: one Linear so branch logits have real params."""

    def __init__(self, in_dim, num_classes, pool):
        super().__init__()
        self.head = nn.Linear(in_dim, num_classes)
        self._pool = pool

    def forward(self, x):
        return self.head(self._pool(x))


def _save(name: str, model: nn.Module, inputs: dict, output: torch.Tensor,
          config: dict) -> None:
    arrays = {f"sd.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    for k, v in inputs.items():
        arrays[f"in.{k}"] = v.numpy()
    arrays["out"] = output.detach().numpy()
    arrays["config_json"] = np.array(json.dumps(config))
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez(OUT / f"golden_{name}.npz", **arrays)
    print(f"golden_{name}.npz: out shape {tuple(output.shape)}, "
          f"{len(model.state_dict())} params")


def gen_fusion(name: str, seed: int, **kwargs) -> None:
    torch.manual_seed(seed)
    b, t, h, w, n_mels, ta = 2, 3, 8, 8, 64, 25
    model = FusionModel(
        audio_model=AudioStub(n_mels),
        video_model=VideoStub(3, h, w),
        num_classes=8,
        common_dim=32,
        d_model=128,
        audio_n_mels=n_mels,
        **kwargs,
    ).eval()
    video = torch.randn(b, t, 3, h, w)
    audio = torch.randn(b, 1, n_mels, ta)
    with torch.no_grad():
        out = model(video, audio)
    _save(name, model, {"video": video, "audio": audio}, out,
          {"kind": "fusion", **kwargs})


def gen_late(seed: int) -> None:
    torch.manual_seed(seed)
    b, t, h, w, n_mels, ta = 2, 3, 8, 8, 64, 25
    audio_m = LinearHeadStub(n_mels, 8, lambda x: x.squeeze(1).mean(dim=-1))
    video_m = LinearHeadStub(3 * h * w, 8,
                             lambda x: x.reshape(x.shape[0], x.shape[1], -1).mean(dim=1))
    model = FusionModel(audio_model=audio_m, video_model=video_m,
                        num_classes=8, mode="late").eval()
    video = torch.randn(b, t, 3, h, w)
    audio = torch.randn(b, 1, n_mels, ta)
    with torch.no_grad():
        out = model(video, audio)
    _save("late", model, {"video": video, "audio": audio}, out,
          {"kind": "fusion", "mode": "late"})


def gen_audionet(name: str, seed: int, use_resnet: bool) -> None:
    """AudioNet weights are SYNTHESIZED per-key (tests/helpers.synth_param)
    instead of stored — AudioResNet18 is 11M params (51 MB fixture).  The
    replay test regenerates the identical state dict from the flax-derived
    key set, so only inputs/outputs are checked in."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tests.helpers import synth_param

    torch.manual_seed(seed)
    model = AudioNet(num_classes=8, use_resnet=use_resnet).eval()
    sd = model.state_dict()
    filled = {
        k: (v if k.endswith("num_batches_tracked")
            else torch.from_numpy(synth_param(k, tuple(v.shape), seed)))
        for k, v in sd.items()
    }
    model.load_state_dict(filled)
    mel = torch.randn(2, 1, 64, 101)
    with torch.no_grad():
        out = model(mel)
    arrays = {"in.mel": mel.numpy(), "out": out.detach().numpy(),
              "config_json": np.array(json.dumps(
                  {"kind": "audionet", "use_resnet": use_resnet,
                   "weights": "synth", "seed": seed}))}
    OUT.mkdir(parents=True, exist_ok=True)
    np.savez(OUT / f"golden_{name}.npz", **arrays)
    print(f"golden_{name}.npz: out shape {tuple(out.shape)} (synth weights)")


def main() -> None:
    gen_fusion("xattn_concat_mean", 10, mode="xattn", xattn_head="concat",
               temporal_pooling="mean")
    gen_fusion("xattn_gated_attn_prior", 11, mode="xattn", xattn_head="gated",
               temporal_pooling="attn", xattn_use_emotion_prior=True)
    gen_fusion("xattn_concat_transformer", 12, mode="xattn", xattn_head="concat",
               temporal_pooling="transformer", temporal_num_layers=1)
    gen_fusion("concat_clip", 13, mode="concat", fusion_align_mode="clip",
               fusion_align_dim=16)
    gen_fusion("gated", 14, mode="gated")
    gen_late(15)
    gen_audionet("audiocnn", 16, use_resnet=False)
    gen_audionet("audioresnet", 17, use_resnet=True)


if __name__ == "__main__":
    main()
