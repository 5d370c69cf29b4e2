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

    # ---- AOT memory analysis (round 5): device.memory_stats() returns
    # None on the axon backend, and actually RUNNING the step can OOM under
    # shared-chip contention (observed: all three modes failed at b64 in a
    # contended session where r2-r4 ran b64 fine).  The compiler's static
    # HBM plan needs ZERO device allocation: lower the jitted step over
    # ShapeDtypeStructs, compile, read memory_analysis().  temp_size is the
    # activation/workspace plan — exactly what remat changes.
    import jax.numpy as jnp

    state_sds = jax.eval_shape(trainer.init_state)
    abstract = lambda s, d: jax.ShapeDtypeStruct(s, d)  # noqa: E731
    video_sds = abstract((batch, 8, 3, 112, 112), jnp.float32)
    audio_sds = abstract((batch, 1, 48000), jnp.float32)
    labels_sds = abstract((batch,), jnp.int32)
    valid_sds = abstract((batch,), jnp.bool_)
    mask_sds = jax.eval_shape(
        lambda p: trainable_mask(p, cfg, tc, stage=0), state_sds.params
    )
    lrs_sds = jax.eval_shape(
        lambda p: lr_tree(p, cfg, tc, stage=0, scale={}), state_sds.params
    )
    lowered = trainer._train_step.lower(
        state_sds, video_sds, audio_sds, labels_sds, valid_sds,
        mask_sds, lrs_sds, abstract((), jnp.float32), None,
    )
    ma = lowered.compile().memory_analysis()
    aot = {
        "remat": remat,
        "batch": batch,
        "aot_temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
        "aot_argument_gib": round(ma.argument_size_in_bytes / 2**30, 3),
        "aot_output_gib": round(ma.output_size_in_bytes / 2**30, 3),
        "aot_alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
        "aot_total_gib": round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes - ma.alias_size_in_bytes) / 2**30, 3),
    }
    print("CHILD_AOT " + json.dumps(aot), flush=True)
    if os.environ.get("BENCH_REMAT_AOT_ONLY"):
        return

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


def _spawn(remat: str, batch: int, dtype: str, iters: int,
           aot_only: bool = False) -> dict:
    env = {**os.environ, "BENCH_REMAT_CHILD": remat}
    if aot_only:
        env["BENCH_REMAT_AOT_ONLY"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--batch", str(batch),
         "--dtype", dtype, "--iters", str(iters)],
        env=env,
        capture_output=True,
        text=True,
    )
    aot = {}
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_AOT "):
            aot = json.loads(line[len("CHILD_AOT "):])
        if line.startswith("CHILD_RESULT "):
            return {**aot, **json.loads(line[len("CHILD_RESULT "):])}
    if aot:
        if aot_only:
            return aot
        # AOT analysis succeeded but the run OOM'd (shared-chip contention):
        # the static HBM plan is still the measurement that matters.
        return {**aot, "run_failed": True}
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
    ap.add_argument(
        "--hbm_gib", type=float, default=16.0,
        help="chip HBM capacity the AOT probe checks against (v5e: 16)",
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
        # Round-5 probe: admissibility from the compiler's static HBM plan
        # (AOT-only children — no allocation, so shared-chip contention
        # can't fake an OOM).  A mode's max batch = largest doubling whose
        # aot_total fits the chip (v5e: 16 GiB HBM).
        for mode in args.modes.split(","):
            b = args.batch * 2
            while b <= 512:
                print(f"[bench_remat] probe {mode} b{b} (AOT)")
                r = _spawn(mode, b, args.dtype, 2, aot_only=True)
                results.append(r)
                print(f"[bench_remat] probe {mode} b{b}: {r}")
                if r.get("failed") or r.get("aot_total_gib", 0) > args.hbm_gib:
                    break
                b *= 2

    print(json.dumps({"metric": f"remat_hbm_{args.dtype}", "results": results}))


if __name__ == "__main__":
    main()
