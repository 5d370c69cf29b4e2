"""Fused WavLM conv-feature-extractor layers (Pallas, TPU).

The reference's WavLM front-end (HF feature extractor, used via
`src/models/wavlm_audio.py:30-41`; reimplemented as matmul decompositions in
`ops/audio_conv.py`) spends most of its TPU time on HBM traffic, not FLOPs:
the lo/hi partial-sum scheme materializes two f32 partial outputs per layer
(~2.5 GB at b128 for L1 alone) and every GELU is a separate full-tensor
read/write pass (measured: conv FE stack 41.7 ms of a 104 ms forward,
benchmarks/RESULTS.md round-2 decomposition).

This kernel computes one wide-K layer (k <= 2*stride, the L1..L6 shapes)
with everything resident in VMEM per grid step:

    y    = reshape(x, [B, T/s, s*Cin])        (free layout change, outside)
    out[t] = gelu?(y[t]) @ W_lo  +  gelu?(y[t+1][:, :(k-s)*Cin]) @ W_hi
    (f32 accumulation on the MXU, single bf16 write)

and optionally applies the PREVIOUS layer's GELU to its input tiles on load
("gelu_input"), so the standalone activation passes between layers vanish:
each layer writes its raw conv output and the next layer's kernel applies
the nonlinearity while the tile is already in VMEM.

Halo handling: blocks cannot overlap, so the row needed from the next time
block arrives through a SECOND BlockSpec view of the same array with a
16-row block whose index map points at the first rows of block t+1 (clamped
at the end; the resulting garbage rows are beyond the layer's logical
t_out and are never consumed downstream — physical row counts are chosen in
models/wavlm.py so padding flows through the stack without pad/slice
copies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.ops.activations import gelu_erf

__all__ = ["fused_conv_layer"]

_HALO_ROWS = 16


def _conv_kernel(
    k, stride, cin, gelu_input, gelu_output, y_ref, halo_ref, w_ref, o_ref
):
    y = y_ref[0]  # [tt, s*cin]
    if gelu_input:
        y = gelu_erf(y)
    w = w_ref[...]  # [k*cin, cout]
    s_cin = stride * cin
    acc = jnp.dot(
        y, w[:s_cin], preferred_element_type=jnp.float32
    )
    if k > stride:
        halo = halo_ref[0, 0:1]  # first row of the NEXT time block
        if gelu_input:
            halo = gelu_erf(halo)
        shifted = jnp.concatenate([y[1:], halo], axis=0)
        acc = acc + jnp.dot(
            shifted[:, : (k - stride) * cin],
            w[s_cin:],
            preferred_element_type=jnp.float32,
        )
    if gelu_output:
        # GELU on the f32 accumulator: half the elements of the input-side
        # variant and no bf16<->f32 converts (the kernel is VPU-bound with
        # the GELU serialized against the MXU, so this is the cheap side).
        acc = gelu_erf(acc)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_tile(rows: int, target: int = 640) -> int:
    """Largest divisor of rows <= target, preferring multiples of 16 (so the
    cheap 16-row halo view stays addressable)."""
    if rows <= target:
        return rows
    for tt in range(target - target % 16, 0, -16):
        if rows % tt == 0:
            return tt
    for tt in range(target, 0, -1):
        if rows % tt == 0:
            return tt
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("k", "stride", "cin", "gelu_input", "gelu_output",
                     "interpret"),
)
def fused_conv_layer(
    y: jnp.ndarray,  # [B, rows, stride*cin] — stride-reshaped input
    w_flat: jnp.ndarray,  # [k*cin, cout] — tap-major flattened kernel
    k: int,
    stride: int,
    cin: int,
    gelu_input: bool = False,
    gelu_output: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> conv output [B, rows, cout] (same dtype as y).

    Rows at or beyond the layer's logical t_out contain garbage (they mix
    zero padding / clamped halo); callers track logical lengths.
    gelu_input applies the exact-erf GELU to input tiles in VMEM before the
    matmuls (the PREVIOUS layer's activation); gelu_output applies it to
    the f32 accumulator before the write (THIS layer's activation — the
    cheap side: half the elements and no bf16<->f32 converts).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, rows, s_cin = y.shape
    if s_cin != stride * cin:
        raise ValueError(f"lane dim {s_cin} != stride*cin {stride * cin}")
    if k > 2 * stride:
        raise ValueError("fused_conv_layer requires k <= 2*stride")
    cout = w_flat.shape[1]
    tt = _pick_tile(rows)
    ntc = rows // tt

    y_spec = pl.BlockSpec(
        (1, tt, s_cin), lambda bb, t: (bb, t, 0), memory_space=pltpu.VMEM
    )
    if tt % _HALO_ROWS == 0 and rows % _HALO_ROWS == 0:
        # Cheap halo: a 16-row view pointed at the first rows of block t+1.
        halo_blocks = rows // _HALO_ROWS
        halo_spec = pl.BlockSpec(
            (1, _HALO_ROWS, s_cin),
            lambda bb, t: (
                bb,
                jnp.minimum((t + 1) * (tt // _HALO_ROWS), halo_blocks - 1),
                0,
            ),
            memory_space=pltpu.VMEM,
        )
    else:
        # Small layers: just fetch the whole next block as the halo.
        halo_spec = pl.BlockSpec(
            (1, tt, s_cin),
            lambda bb, t: (bb, jnp.minimum(t + 1, ntc - 1), 0),
            memory_space=pltpu.VMEM,
        )
    w_spec = pl.BlockSpec(
        (k * cin, cout), lambda bb, t: (0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        functools.partial(_conv_kernel, k, stride, cin, gelu_input, gelu_output),
        grid=(b, ntc),
        in_specs=[y_spec, halo_spec, w_spec],
        out_specs=pl.BlockSpec(
            (1, tt, cout), lambda bb, t: (bb, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, cout), y.dtype),
        interpret=interpret,
    )(y, y, w_flat)
