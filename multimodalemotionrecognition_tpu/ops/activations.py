"""Fast exact-accuracy activations for large activation tensors.

XLA's `erf` lowering on TPU is a high-degree piecewise rational that does
not fuse cheaply: on the WavLM conv feature extractor's L0 output
([128, 9599, 512] bf16) exact-GELU added 7.8 ms per step while tanh-GELU
fused to ~0 (measured, see benchmarks/RESULTS.md).  `gelu_erf` keeps
erf-GELU semantics (torch `nn.GELU()` / HF WavLM, reference
`src/models/wavlm_audio.py`) using the Abramowitz–Stegun 7.1.26 rational
erf, whose absolute error <= 1.5e-7 sits at the f32 noise floor — parity
with torch stays well inside the repo's 2e-4 tolerances — at roughly half
the VPU cost.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["erf_rational", "gelu_erf"]


def erf_rational(z: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz–Stegun 7.1.26 erf, |abs err| <= 1.5e-7 (f32 inputs)."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


@jax.custom_jvp
def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-form GELU (0.5·x·(1+erf(x/√2))) with the rational erf.

    Computes in f32 regardless of input dtype (bf16 in would otherwise lose
    the approximation's accuracy) and casts back.  A custom JVP supplies the
    analytic derivative Φ(x) + x·φ(x) — autodiff through the rational would
    cost ~2× the exact form (and is non-smooth at 0 through sign/abs).
    """
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + erf_rational(xf * (2.0**-0.5)))
    return out.astype(x.dtype)


@gelu_erf.defjvp
def _gelu_erf_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + erf_rational(xf * (2.0**-0.5)))
    pdf = jnp.exp(-0.5 * xf * xf) * (1.0 / math.sqrt(2.0 * math.pi))
    grad = (cdf + xf * pdf).astype(x.dtype)
    return (cdf * xf).astype(x.dtype), grad * dx
