"""Batch-tiled grid experiment for the fused WavLM attention sublayer.

VERDICT r4 item 3: attention is the named remaining MFU candidate (the r2
decomposition put the modular sublayer at 2.96 ms and the fused kernel at
1.54 ms/layer at b128 — still ~8x off both the compute and HBM rooflines,
i.e. VPU/per-instance-overhead bound).  The full-block fusion kernel's
batch-tiled grid (S=8) bought 219 -> 93 us in round 2; this experiment asks
whether the same lever moves the attention sublayer kernel: grid=(B/G,)
with G batch elements per instance (G=1 == the production kernel's shape).

Numerics are asserted identical to the production kernel before timing.
Timing is scan-slope (chained loop lengths) so the ~170 ms tunnel RPC cost
cancels; each G runs in the SAME process (no OOM risk at these sizes — the
working set is ~150 MB).

Usage: python benchmarks/bench_attn_tile.py [--batch 128] [--tiles 1,2,4,8]
Writes one JSON line; record keep-or-kill in RESULTS.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEQ = 149  # WavLM-base tokens for 3 s @ 16 kHz
PAD = 160
E = 768
H = 12
EPS = 1e-5


def _tiled_kernel(num_heads, g_tile, tp, seq_len, eps,
                  h_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                  wo_ref, bo_ref, lns_ref, lnb_ref, o_ref):
    """G batch elements per grid instance; otherwise the production math
    (ops/pallas_wavlm_attn.py::_sublayer_kernel, eval path: no dropout)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    e = h_ref.shape[-1]
    dh = e // num_heads
    if tp != seq_len:
        col = lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        pad_mask = col >= seq_len
    else:
        pad_mask = None
    for g in range(g_tile):
        hidden = h_ref[g]
        acc = jnp.zeros((tp, e), jnp.float32)
        for h in range(num_heads):
            lsl = slice(h * dh, (h + 1) * dh)
            ssl = slice(h * tp, (h + 1) * tp)
            q = q_ref[g][:, lsl]
            k = k_ref[g][:, lsl]
            v = v_ref[g][:, lsl]
            gate = g_ref[g, ssl]
            bias = bias_ref[ssl]
            scores = lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores = scores + gate * bias
            if pad_mask is not None:
                scores = jnp.where(pad_mask, jnp.float32(-1e30), scores)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.dot(
                probs.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            acc = acc + jnp.dot(
                ctx.astype(v.dtype), wo_ref[lsl],
                preferred_element_type=jnp.float32,
            )
        out = acc + bo_ref[...] + hidden.astype(jnp.float32)
        mean = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean((out - mean) ** 2, axis=-1, keepdims=True)
        normed = (out - mean) * lax.rsqrt(var + eps)
        o_ref[g] = (normed * lns_ref[...] + lnb_ref[...]).astype(o_ref.dtype)


def tiled_call(g_tile, hidden, q, k, v, gate, bias, wo, bo, lns, lnb):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tp, e = hidden.shape
    assert b % g_tile == 0
    nat = pl.BlockSpec((g_tile, tp, e), lambda bb: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    gsp = pl.BlockSpec((g_tile, H * tp, 1), lambda bb: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    bsp = pl.BlockSpec((H * tp, tp), lambda bb: (0, 0),
                       memory_space=pltpu.VMEM)
    wsp = pl.BlockSpec((e, e), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    rsp = pl.BlockSpec((1, e), lambda bb: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tiled_kernel, H, g_tile, tp, SEQ, EPS),
        grid=(b // g_tile,),
        in_specs=[nat, nat, nat, nat, gsp, bsp, wsp, rsp, rsp, rsp],
        out_specs=nat,
        out_shape=jax.ShapeDtypeStruct((b, tp, e), hidden.dtype),
        # G>1 blocks exceed Mosaic's 16 MB default scoped-VMEM budget (G=2
        # wants 20.4 MB); v5e has 128 MB physical — same lever the
        # production backward kernel uses (ops/pallas_wavlm_attn.py).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(hidden, q, k, v, gate, bias, wo, bo, lns, lnb)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tiles", default="1,2,4,8")
    ap.add_argument("--lens", default="4,12")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    b = args.batch
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(b, PAD, E).astype(np.float32),
                         jnp.bfloat16)
    q = jnp.asarray(rng.randn(b, PAD, E).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, PAD, E).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, PAD, E).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    gate = jnp.asarray(rng.rand(b, H * PAD, 1).astype(np.float32))
    bias = jnp.asarray(rng.randn(H * PAD, PAD).astype(np.float32) * 0.05)
    wo = jnp.asarray(rng.randn(E, E).astype(np.float32) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.randn(1, E).astype(np.float32) * 0.01)
    lns = jnp.asarray(np.ones((1, E), np.float32))
    lnb = jnp.asarray(np.zeros((1, E), np.float32))
    tensors = (hidden, q, k, v, gate, bias, wo, bo, lns, lnb)

    # -- numerics: every tile size must match G=1 exactly ------------------
    ref = np.asarray(jax.jit(functools.partial(tiled_call, 1))(*tensors),
                     np.float32)
    tiles = [int(t) for t in args.tiles.split(",")]
    for g in tiles:
        if g == 1:
            continue
        got = np.asarray(jax.jit(functools.partial(tiled_call, g))(*tensors),
                         np.float32)
        np.testing.assert_array_equal(got, ref, err_msg=f"G={g} differs")
    print(f"[attn_tile] numerics identical for G in {tiles}")

    # -- scan-slope timing -------------------------------------------------
    lens = [int(x) for x in args.lens.split(",")]
    results = {}
    for g in tiles:
        call = functools.partial(tiled_call, g)

        def make_loop(n):
            @jax.jit
            def loop(tensors):
                hidden, q, k, v, *rest = tensors

                def body(carry, _):
                    out = call(hidden + carry * 1e-24, q, k, v, *rest)
                    return carry + out.astype(jnp.float32)[0, 0, 0], None

                c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
                return c

            return loop

        per_len = {}
        for n in lens:
            loop = make_loop(n)
            float(loop(tensors))  # compile + warm
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                float(loop(tensors))
            per_len[n] = (time.perf_counter() - t0) / reps
        n0, n1 = lens[0], lens[-1]
        slope_ms = (per_len[n1] - per_len[n0]) / (n1 - n0) * 1000
        results[g] = round(slope_ms, 3)
        print(f"[attn_tile] G={g}: {slope_ms:.3f} ms/layer (b{b})")

    best = min(results, key=results.get)
    print(json.dumps({
        "metric": "wavlm_attn_sublayer_ms_per_layer",
        "value": results[best],
        "unit": f"ms_b{b}_bf16",
        "results": {str(k): v for k, v in results.items()},
        "best_tile": best,
        "baseline_g1": results.get(1),
    }))


if __name__ == "__main__":
    main()
