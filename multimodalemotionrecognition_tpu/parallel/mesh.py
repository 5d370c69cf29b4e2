"""Device mesh + sharding rules.

The reference is single-device (no DDP anywhere — SURVEY.md §2.2); its only
distributed mechanism is a Redis work queue.  Here parallelism is first-class:

  * "data" axis — batch-sharded training/inference (the strategy that pays for
    these <=107M-param models); gradients all-reduce over ICI automatically by
    compiling the step under jit with sharded batch + replicated params.
  * "model" axis — optional tensor parallelism for the WavLM branch: qkv/mlp
    kernels sharded column-wise, output projections row-wise, so the 768-wide
    transformer can span chips if ever scaled up.  Degenerates cleanly to 1.

Everything rides jax.sharding.NamedSharding; XLA inserts the collectives
(psum for DP grads, all-gather/reduce-scatter for TP) — no hand-written NCCL
analog, per the scaling-book recipe.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "param_sharding_rules",
    "shard_params",
]


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over (data, model) axes. shape=None -> all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    dp, tp = shape
    if dp * tp != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over "data"."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with the batch dim sharded."""

    def put(x):
        x = np.asarray(x)
        spec = P("data") if x.ndim >= 1 and x.shape[0] % mesh.shape["data"] == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


# (regex over joined param path, PartitionSpec) — first match wins.
# Only the WavLM trunk is worth sharding on "model"; everything else is small
# and replicated.
_TP_RULES = [
    # attention qkv: column-parallel [in, out_sharded]
    (re.compile(r"wavlm\.encoder\.layers\.\d+\.attention\.[qkv]_proj\.kernel$"), P(None, "model")),
    (re.compile(r"wavlm\.encoder\.layers\.\d+\.attention\.[qkv]_proj\.bias$"), P("model")),
    # attention out: row-parallel [in_sharded, out]
    (re.compile(r"wavlm\.encoder\.layers\.\d+\.attention\.out_proj\.kernel$"), P("model", None)),
    # mlp up: column-parallel; mlp down: row-parallel
    (re.compile(r"wavlm\.encoder\.layers\.\d+\.feed_forward\.intermediate_dense\.kernel$"), P(None, "model")),
    (re.compile(r"wavlm\.encoder\.layers\.\d+\.feed_forward\.intermediate_dense\.bias$"), P("model")),
    (re.compile(r"wavlm\.encoder\.layers\.\d+\.feed_forward\.output_dense\.kernel$"), P("model", None)),
]


def param_sharding_rules(path: str, use_tp: bool) -> P:
    if use_tp:
        for rule, spec in _TP_RULES:
            if rule.search(path):
                return spec
    return P()


def shard_params(mesh: Mesh, variables: Any) -> Any:
    """Place a variable tree on the mesh: TP rules when the "model" axis is
    >1, replicated otherwise."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    use_tp = mesh.shape["model"] > 1
    flat = flatten_dict(variables)
    out = {}
    for path, leaf in flat.items():
        joined = ".".join(str(p) for p in path)
        spec = param_sharding_rules(joined, use_tp)
        # Skip TP specs that don't divide evenly (e.g. tiny test models).
        if use_tp and spec != P():
            divisible = all(
                name is None or leaf.shape[axis_i] % mesh.shape[name] == 0
                for axis_i, name in enumerate(spec)
            )
            if not divisible:
                spec = P()
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return unflatten_dict(out)
