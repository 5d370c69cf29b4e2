"""Peak-HBM + step-time for rematerialization policies on the train step.

VERDICT r3 item 6 (next measured MFU/memory increment): the all-trainable
flagship step holds every encoder activation for the backward — at b64
that is the WavLM stack's [B, 149, 3072] intermediates x 12 layers plus
the ResNet feature pyramid.  `TrainConfig.remat` now supports:

  off    — save everything (fastest, most HBM)
  dots   — jax.checkpoint(policy=checkpoint_dots): keep matmul/conv
           outputs, recompute elementwise/norm/dropout glue between them
           (near-zero extra MXU work)
  full   — checkpoint the whole forward (~1.3x FLOPs, max HBM cut)

Peak HBM comes from `device.memory_stats()` and is IMMUNE to shared-chip
contention (unlike every wall-clock number on this tunnel), so the memory
column is the load-bearing one; the step-time column is same-process
relative only.  Each config runs in a fresh subprocess (one OOM poisons
the TPU client — same rationale as bench.py).  `--probe` additionally
searches the largest admissible batch per mode by doubling until OOM.

Usage: python benchmarks/bench_remat.py [--batch 64] [--dtype bfloat16]
       [--modes off,dots,full] [--probe]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_child(remat: str, batch: int, dtype: str, iters: int) -> None:
    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodalemotionrecognition_tpu.config import ModelConfig, TrainConfig
    from multimodalemotionrecognition_tpu.parallel.mesh import shard_batch
    from multimodalemotionrecognition_tpu.train.freeze import lr_tree, trainable_mask
    from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

    cfg = ModelConfig(
        fusion="xattn", use_wavlm=True, num_classes=8, compute_dtype=dtype
    )
    tc = TrainConfig(
        lr=1e-3,
        epochs=10,
        remat={"off": False, "dots": "dots", "full": True}[remat],
    )
    trainer = EmotionTrainer(cfg, tc)
    state = trainer.init_state()
    mask = trainable_mask(state.params, cfg, tc, stage=0)
    lrs = lr_tree(state.params, cfg, tc, stage=0, scale={})

    rng = np.random.RandomState(0)
    sb = shard_batch(
        trainer.mesh,
        {
            "video": rng.randn(batch, 8, 3, 112, 112).astype(np.float32),
            "audio": (rng.randn(batch, 1, 48000) * 0.1).astype(np.float32),
            "labels": rng.randint(0, 8, batch).astype(np.int32),
            "valid": np.ones(batch, bool),
        },
    )
    args = (sb["video"], sb["audio"], sb["labels"], sb["valid"], mask, lrs,
            np.float32(0.0), None)
    state, total, *_ = trainer._train_step(state, *args)  # compile
    np.asarray(total)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, total, *_ = trainer._train_step(state, *args)
    np.asarray(total)  # chains through state — waits for every step
    step_ms = (time.perf_counter() - t0) / iters * 1000

    stats = jax.devices()[0].memory_stats() or {}
    peak = int(stats.get("peak_bytes_in_use", -1))
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "remat": remat,
                "batch": batch,
                "peak_bytes_in_use": peak,
                "peak_gib": round(peak / 2**30, 3) if peak >= 0 else None,
                "step_ms": round(step_ms, 1),
            }
        ),
        flush=True,
    )


def _spawn(remat: str, batch: int, dtype: str, iters: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--batch", str(batch),
         "--dtype", dtype, "--iters", str(iters)],
        env={**os.environ, "BENCH_REMAT_CHILD": remat},
        capture_output=True,
        text=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    return {"remat": remat, "batch": batch, "failed": True}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--modes", default="off,dots,full")
    ap.add_argument(
        "--probe", action="store_true",
        help="also find the largest admissible batch per mode (doubling)",
    )
    args = ap.parse_args()

    if os.environ.get("BENCH_REMAT_CHILD"):
        run_child(
            os.environ["BENCH_REMAT_CHILD"], args.batch, args.dtype, args.iters
        )
        return

    results = []
    for mode in args.modes.split(","):
        print(f"[bench_remat] {mode} b{args.batch} (fresh subprocess)")
        r = _spawn(mode, args.batch, args.dtype, args.iters)
        results.append(r)
        print(f"[bench_remat] {mode}: {r}")

    if args.probe:
        for mode in args.modes.split(","):
            b = args.batch * 2
            while b <= 512:
                print(f"[bench_remat] probe {mode} b{b}")
                r = _spawn(mode, b, args.dtype, 2)
                results.append(r)
                print(f"[bench_remat] probe {mode} b{b}: {r}")
                if r.get("failed"):
                    break
                b *= 2

    print(json.dumps({"metric": f"remat_hbm_{args.dtype}", "results": results}))


if __name__ == "__main__":
    main()
