"""Peak-HBM measurement: flat vs per-leaf optimizer on the all-trainable step.

ADVICE r2 #4: the flat Adam path concatenates the live sub-tree into single
f32 vectors (p_f, g_f, mu_f, nu_f + broadcast mask/lr), materializing ~6
full-size temporaries that the per-leaf path never builds, and donated input
buffers cannot alias into the concatenation.  At the flagship's ~95M live
params that is >2 GB of transient HBM — this script measures the actual peak
with `device.memory_stats()` so the 'auto' gate can be justified (or gated
on live-subtree size) with a number instead of a guess.

Each config runs in a fresh subprocess (an OOM would poison the parent's
TPU client — same rationale as bench.py / bench_int8.py).

Usage: python benchmarks/bench_hbm_flat.py [--batch 64] [--dtype bfloat16]
       [--stage 0|2]   (0 = all-trainable, 2 = stage-2 finetune)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_child(flat: str, batch: int, dtype: str, stage: int) -> None:
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
        two_stage_training=(stage == 2),
        epochs=10,
        stage1_epochs=3,
        flat_optimizer=flat,
    )
    trainer = EmotionTrainer(cfg, tc)

    # AOT static HBM plan (round 5): memory_stats() is None on the axon
    # backend, so the peak comes from the compiler's memory analysis
    # (same approach as bench_remat.py — zero device allocation needed).
    import jax.numpy as jnp

    state_sds = jax.eval_shape(trainer.init_state)
    mask_sds = jax.eval_shape(
        lambda p: trainable_mask(p, cfg, tc, stage=stage), state_sds.params
    )
    lrs_sds = jax.eval_shape(
        lambda p: lr_tree(p, cfg, tc, stage=stage, scale={}), state_sds.params
    )
    sds = lambda s, d: jax.ShapeDtypeStruct(s, d)  # noqa: E731
    ma = trainer._train_step.lower(
        state_sds, sds((batch, 8, 3, 112, 112), jnp.float32),
        sds((batch, 1, 48000), jnp.float32), sds((batch,), jnp.int32),
        sds((batch,), jnp.bool_), mask_sds, lrs_sds, sds((), jnp.float32),
        None,
    ).compile().memory_analysis()
    aot_total = (
        ma.temp_size_in_bytes + ma.argument_size_in_bytes
        + ma.output_size_in_bytes - ma.alias_size_in_bytes
    )

    state = trainer.init_state()
    mask = trainable_mask(state.params, cfg, tc, stage=stage)
    lrs = lr_tree(state.params, cfg, tc, stage=stage, scale={})

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
    state, total, *_ = trainer._train_step(state, *args)  # compile + warm
    np.asarray(total)
    import time

    t0 = time.perf_counter()
    for _ in range(8):
        state, total, *_ = trainer._train_step(state, *args)
    np.asarray(total)  # chains through state — waits for every step
    step_ms = (time.perf_counter() - t0) / 8 * 1000

    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    live = int(
        sum(
            l.size  # shape metadata only — no host fetch over the tunnel
            for l, m in zip(
                jax.tree_util.tree_leaves(state.params),
                jax.tree_util.tree_leaves(mask),
            )
            if np.asarray(m).any()
        )
    )
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "flat_optimizer": flat,
                "stage": stage,
                "live_params": live,
                "aot_total_gib": round(aot_total / 2**30, 3),
                "aot_temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
                "step_ms": round(step_ms, 1),
                "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", -1)),
                "bytes_in_use": int(stats.get("bytes_in_use", -1)),
                "largest_alloc": int(stats.get("largest_alloc_size", -1)),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stage", type=int, default=0, choices=(0, 2))
    args = ap.parse_args()

    if os.environ.get("BENCH_HBM_CHILD"):
        run_child(
            os.environ["BENCH_HBM_CHILD"], args.batch, args.dtype, args.stage
        )
        return

    results = {}
    for flat in ("off", "on"):
        print(f"[bench_hbm_flat] measuring flat={flat} (fresh subprocess)")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--batch",
             str(args.batch), "--dtype", args.dtype, "--stage",
             str(args.stage)],
            env={**os.environ, "BENCH_HBM_CHILD": flat},
            capture_output=True,
            text=True,
        )
        out = None
        for line in proc.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                out = json.loads(line[len("CHILD_RESULT "):])
        if out is None:
            sys.stderr.write(proc.stdout + proc.stderr)
            print(f"[bench_hbm_flat] flat={flat} FAILED (OOM?); recording null")
            results[flat] = {"failed": True}
            continue
        results[flat] = out
        print(f"[bench_hbm_flat] flat={flat}: "
              f"peak {out['peak_bytes_in_use'] / 2**30:.2f} GiB")

    delta = None
    if all(
        not r.get("failed") and r.get("peak_bytes_in_use", -1) >= 0
        for r in results.values()
    ):
        delta = results["on"]["peak_bytes_in_use"] - results["off"][
            "peak_bytes_in_use"
        ]
    print(
        json.dumps(
            {
                "metric": f"hbm_peak_flat_optimizer_b{args.batch}_"
                f"{args.dtype}_stage{args.stage}",
                "results": results,
                "flat_minus_perleaf_bytes": delta,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
