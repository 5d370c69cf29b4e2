"""MXU-friendly strided 1D convolution.

XLA lowers WavLM's strided VALID conv1d stack (k in {10,3,2}, strides
{5,2,2}, 512 channels over 48k samples) to a poor TPU schedule (~96 ms for
the 7-layer stack at batch 16 f32, ~1.9 TFLOP/s measured), and strided
slicing lowers as gathers which are no better.

Every layer in the stack satisfies k <= 2*stride, which admits a zero-copy
decomposition: reshape [B, T, C] -> [B, T/s, s*C] (pure layout change), then

    out[t] = y[t]   @ W_lo   (taps j <  s)
           + y[t+1][: (k-s)*C] @ W_hi   (taps j >= s)

i.e. two contiguous-slice MXU matmuls per layer.  Falls back to an explicit
tap loop for k > 2s.  Numerically identical to lax.conv (f32 accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["strided_conv1d_valid"]


def _tap_loop(x: jnp.ndarray, kernel: jnp.ndarray, stride: int) -> jnp.ndarray:
    b, t, cin = x.shape
    k, _, cout = kernel.shape
    t_out = (t - k) // stride + 1
    out = None
    for j in range(k):
        xs = jax.lax.slice(
            x, (0, j, 0), (b, j + stride * (t_out - 1) + 1, cin), (1, stride, 1)
        )
        partial = jnp.einsum(
            "btc,cd->btd", xs, kernel[j], preferred_element_type=jnp.float32
        )
        out = partial if out is None else out + partial
    return out.astype(x.dtype)


def strided_conv1d_valid(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """VALID-padding conv1d: x [B, T, C_in] x kernel [k, C_in, C_out]
    -> [B, T_out, C_out], T_out = (T - k)//stride + 1."""
    b, t, cin = x.shape
    k, kcin, cout = kernel.shape
    if kcin != cin:
        raise ValueError(f"kernel C_in {kcin} != input C_in {cin}")
    if k > 2 * stride:
        return _tap_loop(x, kernel, stride)

    t_out = (t - k) // stride + 1
    rows = t_out + (1 if k > stride else 0)
    t_use = rows * stride
    if t_use > t:
        x = jnp.pad(x, ((0, 0), (0, t_use - t), (0, 0)))
    else:
        x = x[:, :t_use, :]
    y = x.reshape(b, rows, stride * cin)  # row t = taps [t*s .. t*s+s-1]

    w_flat = kernel.reshape(k * cin, cout)  # tap-major rows match y's layout
    if k > stride and k * cin <= 128:
        # NARROW-K layers (WavLM L0: k=10, cin=1): ONE im2col matmul.  The
        # lo/hi partial-sum scheme materializes two f32 [B, T_out, C_out]
        # partials — at K=5 the matmul is output-write-bound, so the second
        # pass nearly doubles the cost (measured: L0 conv 8.9 ms -> 1.4 ms
        # at b128 bf16).  For wide-K layers (cin=512) the concat copy costs
        # more than the partial it saves, so they keep the lo/hi path.
        lo = y[:, :t_out, :]
        hi = y[:, 1 : t_out + 1, : (k - stride) * cin]
        cat = jnp.concatenate([lo, hi], axis=2)  # [B, T_out, k*cin]
        out = jnp.einsum(
            "btc,cd->btd", cat, w_flat, preferred_element_type=jnp.float32
        )
        return out.astype(x.dtype)

    w_lo = w_flat[: min(k, stride) * cin]
    out = jnp.einsum(
        "btc,cd->btd",
        y[:, :t_out, : w_lo.shape[0]],
        w_lo,
        preferred_element_type=jnp.float32,
    )
    if k > stride:
        w_hi = w_flat[stride * cin :]  # taps j >= s live in the NEXT row
        out = out + jnp.einsum(
            "btc,cd->btd",
            y[:, 1 : t_out + 1, : w_hi.shape[0]],
            w_hi,
            preferred_element_type=jnp.float32,
        )
    return out.astype(x.dtype)
