"""Fusion-block microbenchmark: modular XLA graph vs the full-block Pallas
kernel (ops/pallas_fused_block.py), isolated from the encoder towers.

Both paths consume precomputed tower outputs (v_feat [B,T,512], a_seq
[B,149,768] — flagship WavLM geometry), so the delta is purely the fused
block: projections + bidirectional cross-attention + residual/LN + temporal
pooling + head.

Timing methodology (tunnel-safe): each path runs inside ONE jitted
`lax.scan` of N iterations with a carry-perturbed input (prevents LICM/CSE
from hoisting the loop body); per-iteration device time is the SLOPE
between two scan lengths, so the ~170 ms RPC and dispatch overheads cancel.
Sync is a host fetch (block_until_ready lies on the axon backend).

Usage: python benchmarks/bench_fused.py [--batch 64] [--pooling mean]
       [--head concat] [--dtype float32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--audio-len", type=int, default=149)
    ap.add_argument("--pooling", default="mean", choices=["mean", "attn"])
    ap.add_argument("--head", default="concat", choices=["concat", "gated"])
    ap.add_argument("--prior", action="store_true")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8,
                    help="samples per kernel program (1 = per-sample grid)")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    from jax import lax
    import flax.linen as nn

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodalemotionrecognition_tpu.models.fusion import FusionModel
    from multimodalemotionrecognition_tpu.ops.pallas_fused_block import (
        FusedBlockSpec,
        build_fused_block_fn,
        extract_block_params,
    )

    B, T, TA = args.batch, args.frames, args.audio_len
    V_DIM, A_DIM, D = 512, 768, 128
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    class _FrameStub(nn.Module):
        def encode_frames(self, video, train=False):
            return video

    class _SeqStub(nn.Module):
        def encode_sequence(self, audio, train=False):
            return audio

    model = FusionModel(
        audio_model=_SeqStub(),
        video_model=_FrameStub(),
        num_classes=8,
        mode="xattn",
        xattn_head=args.head,
        d_model=D,
        xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
        temporal_pooling=args.pooling,
        xattn_use_emotion_prior=args.prior,
    )
    rng = np.random.RandomState(0)
    v_feat = jnp.asarray(rng.randn(B, T, V_DIM).astype(np.float32), dtype)
    a_seq = jnp.asarray(rng.randn(B, TA, A_DIM).astype(np.float32), dtype)
    variables = model.init(jax.random.PRNGKey(0), v_feat, a_seq)

    spec = FusedBlockSpec(
        num_heads=4,
        d_model=D,
        pooling=args.pooling,
        head=args.head,
        use_prior=args.prior,
        num_classes=8,
    )
    block_args, layout = extract_block_params(variables["params"], spec, {})
    block_fn = build_fused_block_fn(spec, layout, samples_per_program=args.spp)

    def modular_step(v, a):
        out, _aux = model.apply(variables, v, a)
        return out

    def fused_step(v, a):
        return block_fn(v, a, *block_args)

    def make_loop(step, n):
        @jax.jit
        def loop(v, a):
            def body(carry, _):
                out = step(v + carry * 1e-24, a)
                return carry + out.astype(jnp.float32).sum(), None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        return loop

    def timed(step, n, repeats=5):
        """min-of-repeats wall time for one scan(n) launch: the min strips
        tunnel RPC jitter (~tens of ms), which otherwise swamps the slope."""
        loop = make_loop(step, n)
        np.asarray(loop(v_feat, a_seq))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(v_feat, a_seq))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for name, step in (("modular", modular_step), ("fused", fused_step)):
        n_lo, n_hi = max(4, args.iters // 8), args.iters
        t_lo, t_hi = timed(step, n_lo), timed(step, n_hi)
        per_iter = (t_hi - t_lo) / (n_hi - n_lo)
        results[name] = per_iter
        print(f"[{name}] {per_iter * 1e6:.0f} us/iter "
              f"(scan {n_lo}: {t_lo * 1e3:.1f} ms, scan {n_hi}: {t_hi * 1e3:.1f} ms)")

    # numerical agreement
    m = np.asarray(modular_step(v_feat, a_seq), np.float32)
    f = np.asarray(fused_step(v_feat, a_seq), np.float32)
    max_dev = float(np.abs(m - f).max())

    speedup = results["modular"] / results["fused"]
    print(
        json.dumps(
            {
                "metric": f"fused_block_{args.pooling}_{args.head}"
                          f"{'_prior' if args.prior else ''}_b{B}_{args.dtype}",
                "value": round(results["fused"] * 1e6, 1),
                "unit": "us_per_block",
                "modular_us": round(results["modular"] * 1e6, 1),
                "speedup": round(speedup, 3),
                "max_dev": max_dev,
            }
        )
    )


if __name__ == "__main__":
    main()
