"""Shared test utilities: torch->flax conversion plumbing for parity tests."""

from __future__ import annotations

import jax
import numpy as np
import torch

from multimodalemotionrecognition_tpu.convert import torch_state_dict_to_flax


def randomize_bn_stats(model: torch.nn.Module, seed: int = 0) -> None:
    """Give BatchNorms non-trivial running stats so parity tests exercise them."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0.0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)


def convert(torch_model: torch.nn.Module, flax_model, *example_inputs, **init_kwargs):
    """Init the flax model (shapes only) and fill it from the torch state dict."""
    strict = init_kwargs.pop("strict", True)
    template = jax.eval_shape(
        lambda: flax_model.init(
            jax.random.PRNGKey(0), *example_inputs, **init_kwargs
        )
    )
    variables, report = torch_state_dict_to_flax(
        torch_model.state_dict(), template, strict=strict
    )
    return variables, report


def synth_param(key: str, shape, seed: int = 0) -> np.ndarray:
    """Deterministic, order-independent synthetic parameter value.

    Seeded per key name (sha256), so the generator (torch key iteration,
    includes num_batches_tracked) and the replay test (flax-derived key set)
    draw identical values regardless of iteration order or extra keys.
    Used by tools/gen_reference_fixtures.py for fixtures too large to check
    in verbatim (AudioResNet18: 11M params)."""
    import hashlib

    digest = hashlib.sha256(f"{seed}:{key}".encode()).digest()
    rng = np.random.default_rng(np.frombuffer(digest, dtype=np.uint64))
    if "running_var" in key:
        return rng.uniform(0.5, 2.0, shape).astype(np.float32)
    return rng.normal(0.0, 0.05, shape).astype(np.float32)


def assert_close(a, b, atol=2e-4, rtol=2e-4, msg=""):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)
