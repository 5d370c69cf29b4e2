"""PyTorch checkpoint <-> Flax params conversion.

Design: every Flax module in this framework names its submodules with the exact
torch state-dict path components of the reference architecture (including
Sequential indices like `xattn_mlp.0`), so conversion is a *mechanical* walk of
the Flax variable tree — no per-architecture mapping tables:

    flax ("params", "backbone", "4.0", "conv1", "kernel")
      <->  torch "backbone.4.0.conv1.weight"   (transposed per tensor rank)

Leaf-level transforms:
    kernel (2D)        <-> weight.T                (nn.Linear)
    kernel (3D)        <-> weight.permute(2,1,0)   (nn.Conv1d)
    kernel (4D)        <-> weight.permute(2,3,1,0) (nn.Conv2d)
    scale              <-> weight                  (LayerNorm/BatchNorm/GroupNorm)
    in_proj_kernel     <-> in_proj_weight.T        (nn.MultiheadAttention packed qkv)
    embedding          <-> weight                  (nn.Embedding)
    batch_stats mean   <-> running_mean
    batch_stats var    <-> running_var

Checkpoint container format matches the reference
(`src/train.py:1141-1144`): {"model": state_dict, "val_f1": float,
"config": {...}}, with raw-state-dict fallback (`src/train.py:904-911`).
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np

try:
    from flax.core import FrozenDict, freeze, unfreeze
    from flax.traverse_util import flatten_dict, unflatten_dict
except ImportError as exc:  # pragma: no cover
    raise RuntimeError("flax is required for checkpoint conversion") from exc

__all__ = [
    "ConversionReport",
    "torch_state_dict_to_flax",
    "flax_to_torch_state_dict",
    "load_reference_checkpoint",
    "normalize_torch_state_dict",
]

_BATCH_STAT_LEAVES = {"mean": "running_mean", "var": "running_var"}
_WEIGHT_NORM_G_RE = re.compile(
    r"^(?P<mod>.*)\.(?:weight_g|parametrizations\.weight\.original0)$"
)
_WEIGHT_NORM_V_RE = re.compile(
    r"^(?P<mod>.*)\.(?:weight_v|parametrizations\.weight\.original1)$"
)


@dataclasses.dataclass
class ConversionReport:
    converted: int
    unused_torch_keys: Tuple[str, ...]
    missing_flax_paths: Tuple[str, ...]

    def raise_on_missing(self) -> None:
        if self.missing_flax_paths:
            preview = ", ".join(self.missing_flax_paths[:8])
            raise KeyError(
                f"{len(self.missing_flax_paths)} flax leaves had no torch source "
                f"(first: {preview})"
            )


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def normalize_torch_state_dict(
    state_dict: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """Convert tensors to numpy and merge weight-norm parametrizations
    (used by WavLM's positional conv) into plain `weight` entries."""
    out: Dict[str, np.ndarray] = {}
    g_parts: Dict[str, np.ndarray] = {}
    v_parts: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        m_g = _WEIGHT_NORM_G_RE.match(key)
        if m_g:
            g_parts[m_g.group("mod")] = _to_numpy(value)
            continue
        m_v = _WEIGHT_NORM_V_RE.match(key)
        if m_v:
            v_parts[m_v.group("mod")] = _to_numpy(value)
            continue
        out[key] = _to_numpy(value)
    for mod, v in v_parts.items():
        g = g_parts.get(mod)
        if g is None:
            out[f"{mod}.weight"] = v
            continue
        # torch weight_norm with dim=2 (WavLM pos conv): w = g * v / ||v||
        # where the norm is over all dims except `dim`. g carries the shape
        # that broadcasts correctly (size-1 on the normed axes).
        norm_axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
        norm = np.sqrt(np.sum(v**2, axis=norm_axes, keepdims=True))
        out[f"{mod}.weight"] = (g * v / np.maximum(norm, 1e-12)).astype(v.dtype)
    return out


def _torch_source_for(
    collection: str, mod_path: str, leaf: str, flax_shape: Tuple[int, ...]
) -> Tuple[str, Callable[[np.ndarray], np.ndarray]]:
    """Return (torch_key, torch->flax transform) for one flax leaf."""
    dot = "." if mod_path else ""

    def identity(x: np.ndarray) -> np.ndarray:
        return x

    if collection == "batch_stats":
        return f"{mod_path}{dot}{_BATCH_STAT_LEAVES[leaf]}", identity

    if leaf == "kernel":
        rank = len(flax_shape)
        if rank == 2:
            return f"{mod_path}{dot}weight", lambda x: x.T
        if rank == 3:
            return f"{mod_path}{dot}weight", lambda x: x.transpose(2, 1, 0)
        if rank == 4:
            return f"{mod_path}{dot}weight", lambda x: x.transpose(2, 3, 1, 0)
        raise ValueError(f"Unsupported kernel rank {rank} at {mod_path}")
    if leaf == "scale":
        return f"{mod_path}{dot}weight", identity
    if leaf == "bias":
        return f"{mod_path}{dot}bias", identity
    if leaf == "in_proj_kernel":
        return f"{mod_path}{dot}in_proj_weight", lambda x: x.T
    if leaf == "in_proj_bias":
        return f"{mod_path}{dot}in_proj_bias", identity
    if leaf == "embedding":
        return f"{mod_path}{dot}weight", identity
    # Scalar/named params (logit_scale, bias_scale, masked_spec_embed, ...).
    return f"{mod_path}{dot}{leaf}", identity


def torch_state_dict_to_flax(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
    torch_prefix: str = "",
    strict: bool = True,
) -> Tuple[Dict[str, Any], ConversionReport]:
    """Fill a Flax variable tree (template from `model.init` or
    `jax.eval_shape` thereof) from a torch state_dict.

    `torch_prefix` supports loading a submodule checkpoint (e.g. warm-starting
    the fusion audio branch from a standalone audio checkpoint, reference
    `src/train.py:913-947` — pass prefix="" with the branch's sub-template).
    """
    sd = normalize_torch_state_dict(state_dict)
    if torch_prefix:
        sd = {
            k[len(torch_prefix) :]: v
            for k, v in sd.items()
            if k.startswith(torch_prefix)
        }

    was_frozen = isinstance(variables, FrozenDict)
    flat = flatten_dict(unfreeze(variables) if was_frozen else dict(variables))

    used: set = set()
    missing: list = []
    out_flat: Dict[Tuple[str, ...], Any] = {}
    for path, template_leaf in flat.items():
        collection = path[0]
        joined = ".".join(path[1:])
        mod_path, _, leaf = joined.rpartition(".")
        torch_key, transform = _torch_source_for(
            collection, mod_path, leaf, tuple(np.shape(template_leaf))
        )
        if torch_key not in sd:
            missing.append(f"{collection}:{mod_path}.{leaf}")
            out_flat[path] = template_leaf
            continue
        arr = transform(sd[torch_key]).astype(np.float32)
        expected = tuple(np.shape(template_leaf))
        if tuple(arr.shape) != expected:
            # torch scalars sometimes materialize as shape (1,)
            if expected == () and arr.size == 1:
                arr = arr.reshape(())
            else:
                raise ValueError(
                    f"Shape mismatch at {torch_key}: torch {arr.shape} vs flax "
                    f"{expected} (path {path})"
                )
        out_flat[path] = arr
        used.add(torch_key)

    unused = tuple(
        k
        for k in sd.keys()
        if k not in used and not k.endswith("num_batches_tracked")
    )
    report = ConversionReport(
        converted=len(used),
        unused_torch_keys=unused,
        missing_flax_paths=tuple(missing),
    )
    if strict:
        report.raise_on_missing()
    result = unflatten_dict(out_flat)
    return (freeze(result) if was_frozen else result), report


def flax_to_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Export Flax variables to a reference-compatible torch-style state dict
    (numpy values; wrap with `save_torch_checkpoint` to emit a .pt file).

    Inverse transforms of `torch_state_dict_to_flax`; adds zero
    `num_batches_tracked` entries next to BatchNorm running stats so torch-side
    strict loads see familiar keys.
    """
    was_frozen = isinstance(variables, FrozenDict)
    flat = flatten_dict(unfreeze(variables) if was_frozen else dict(variables))

    out: Dict[str, np.ndarray] = {}
    bn_modules: set = set()
    for path, leaf in flat.items():
        collection = path[0]
        joined = ".".join(path[1:])
        mod_path, _, leaf_name = joined.rpartition(".")
        arr = np.asarray(leaf)
        if collection == "batch_stats":
            out[f"{mod_path}.{_BATCH_STAT_LEAVES[leaf_name]}"] = arr
            bn_modules.add(mod_path)
            continue
        if leaf_name == "kernel":
            if arr.ndim == 2:
                out[f"{mod_path}.weight"] = arr.T
            elif arr.ndim == 3:
                out[f"{mod_path}.weight"] = arr.transpose(2, 1, 0)
            elif arr.ndim == 4:
                out[f"{mod_path}.weight"] = arr.transpose(3, 2, 0, 1)
            else:
                raise ValueError(f"Unsupported kernel rank at {mod_path}")
        elif leaf_name == "scale":
            out[f"{mod_path}.weight"] = arr
        elif leaf_name == "in_proj_kernel":
            out[f"{mod_path}.in_proj_weight"] = arr.T
        elif leaf_name == "embedding":
            out[f"{mod_path}.weight"] = arr
        else:
            dot = "." if mod_path else ""
            out[f"{mod_path}{dot}{leaf_name}"] = arr
    for mod in bn_modules:
        out[f"{mod}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return out


def load_reference_checkpoint(path: str | Path) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .pt checkpoint -> (state_dict, config).

    Accepts both {"model": sd, "config": ...} and raw state_dicts
    (reference `src/train.py:904-911`).
    """
    import torch

    obj = torch.load(Path(path).expanduser(), map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        return obj["model"], dict(obj.get("config", {}))
    if isinstance(obj, dict) and obj and all(isinstance(k, str) for k in obj):
        return obj, {}
    raise RuntimeError(
        "Checkpoint format not supported. Expected {'model': state_dict} or raw state_dict."
    )


def save_torch_checkpoint(
    path: str | Path,
    variables: Mapping[str, Any],
    config: Optional[Mapping[str, Any]] = None,
    val_f1: float = 0.0,
) -> None:
    """Write a reference-format .pt checkpoint from Flax variables."""
    import torch

    state = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in flax_to_torch_state_dict(variables).items()
    }
    payload = {"model": state, "val_f1": float(val_f1), "config": dict(config or {})}
    Path(path).expanduser().parent.mkdir(parents=True, exist_ok=True)
    torch.save(payload, Path(path).expanduser())
