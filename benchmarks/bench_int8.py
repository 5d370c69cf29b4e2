"""int8 characterization: throughput / accuracy-delta / artifact-size vs
bf16 and f32 for the flagship xattn+WavLM serving path.

Mirrors the reference's FP32/INT8 table (`SYSTEM_SUMMARY.md:623-631`; dynamic
quantization in `src/export_optimized_model.py:89-104`).  Our int8 is
weight-only per-column quantization of 2D Dense kernels stored as int8
(`runtime/runner.py::_quantize_dense_int8`), dequantized at trace time so XLA
fuses convert+scale into the matmul; the fused full-block kernel variant
dequantizes INSIDE the Pallas kernel (`runtime/fused.py`).

No trained checkpoint exists in this environment (the reference ships only a
Zone.Identifier stub), so the accuracy column is the probability delta and
top-1 agreement vs the f32 runner on random-init weights over a batch of
random inputs — the quantization-noise term, not a task-accuracy claim.

Each config runs in a FRESH subprocess (one OOM on the shared tunneled chip
poisons the whole process — see bench.py) and the scan loop perturbs BOTH
towers' inputs with the carry (perturbing one lets XLA hoist the other tower
out of the scan — measured 5x fake speedup, RESULTS.md).

Usage: python benchmarks/bench_int8.py [--batch 64] [--iters 24]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = {
    "f32": dict(compute_dtype="float32"),
    "bf16": dict(compute_dtype="bfloat16"),
    "bf16_int8": dict(compute_dtype="bfloat16", quantize_int8=True),
    "bf16_int8_fusedblock": dict(
        compute_dtype="bfloat16", quantize_int8=True, fused=True
    ),
}


def _make_checkpoint(path: str) -> None:
    import jax

    # Random-init weights need no TPU; a tunneled-TPU init is one giant
    # UNCACHED compile (~30+ min observed round 5).  Pin this child to CPU.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodalemotionrecognition_tpu.config import ModelConfig
    from multimodalemotionrecognition_tpu.convert.torch_import import (
        save_torch_checkpoint,
    )
    from multimodalemotionrecognition_tpu.models.factory import build_model

    cfg = ModelConfig(
        fusion="xattn",
        use_wavlm=True,
        num_classes=8,
        spec_augment=False,
        xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
    )
    model = build_model(cfg)
    video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    audio = jnp.zeros((1, 1, 48000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video, audio)
    save_torch_checkpoint(
        path, variables, config=cfg.to_checkpoint_dict(), val_f1=0.0
    )


def _inputs(batch: int):
    rng = np.random.RandomState(0)
    video = rng.randn(batch, 8, 3, 112, 112).astype(np.float32)
    audio = (rng.randn(batch, 1, 48000) * 0.1).astype(np.float32)
    return video, audio


def run_child(name: str, ckpt: str, batch: int, iters: int) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

    runner = JaxModelRunner(ckpt, batch_buckets=(batch,), **CONFIGS[name])

    param_bytes = sum(
        np.asarray(leaf).nbytes
        for leaf in jax.tree_util.tree_leaves(runner.variables)
    )

    video_np, audio_np = _inputs(batch)
    video = jnp.asarray(video_np)
    audio = jnp.asarray(audio_np)

    probs = runner.predict_probs(video_np, audio_np)

    forward = runner._forward
    variables = runner.variables

    def make_loop(n):
        @jax.jit
        def loop(variables, video, audio):
            def body(carry, _):
                # Perturb BOTH towers' inputs: keeps each tower inside the
                # scan body (RESULTS.md round-2 measurement note).
                p = forward(
                    variables, video + carry * 1e-24, audio + carry * 1e-24
                )
                return carry + p.astype(jnp.float32).sum(), None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        return loop

    def timed(n, repeats=3):
        loop = make_loop(n)
        np.asarray(loop(variables, video, audio))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(variables, video, audio))
            best = min(best, time.perf_counter() - t0)
        return best

    n_lo, n_hi = max(2, iters // 4), iters
    t_lo, t_hi = timed(n_lo), timed(n_hi)
    per_iter = (t_hi - t_lo) / (n_hi - n_lo)

    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "config": name,
                "per_iter_ms": round(per_iter * 1e3, 2),
                "clips_per_min": round(batch / per_iter * 60.0, 1),
                "param_bytes": int(param_bytes),
                "probs": np.asarray(probs, np.float64).tolist(),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    args = ap.parse_args()

    if os.environ.get("BENCH_INT8_CHILD"):
        run_child(
            os.environ["BENCH_INT8_CHILD"],
            os.environ["BENCH_INT8_CKPT"],
            args.batch,
            args.iters,
        )
        return

    tmp = tempfile.mkdtemp(prefix="bench_int8_")
    ckpt = str(Path(tmp) / "flagship_xattn_wavlm.pt")
    print(f"[bench_int8] building random-init flagship checkpoint at {ckpt}")
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); "
            "from benchmarks.bench_int8 import _make_checkpoint; "
            "_make_checkpoint(%r)"
            % (str(Path(__file__).resolve().parent.parent), ckpt),
        ],
        check=True,
        env={**os.environ, "JAX_PLATFORMS": os.environ.get("JAX_PLATFORMS", "")},
    )

    results = {}
    for name in args.configs.split(","):
        print(f"[bench_int8] measuring {name} (fresh subprocess)")
        env = {
            **os.environ,
            "BENCH_INT8_CHILD": name,
            "BENCH_INT8_CKPT": ckpt,
        }
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)]
            + ["--batch", str(args.batch), "--iters", str(args.iters)],
            env=env,
            capture_output=True,
            text=True,
        )
        out = None
        for line in proc.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                out = json.loads(line[len("CHILD_RESULT "):])
        if out is None:
            sys.stderr.write(proc.stdout + proc.stderr)
            print(f"[bench_int8] {name} FAILED; skipping")
            continue
        results[name] = out
        print(
            f"[bench_int8] {name}: {out['per_iter_ms']} ms/iter, "
            f"{out['clips_per_min']} clips/min, "
            f"params {out['param_bytes'] / 1e6:.1f} MB"
        )

    if "f32" in results:
        ref = np.asarray(results["f32"]["probs"])
        for name, out in results.items():
            p = np.asarray(out["probs"])
            out["max_prob_delta_vs_f32"] = float(np.abs(p - ref).max())
            out["top1_agreement_vs_f32"] = float(
                (p.argmax(1) == ref.argmax(1)).mean()
            )

    summary = {
        name: {k: v for k, v in out.items() if k != "probs"}
        for name, out in results.items()
    }
    print(json.dumps({"metric": f"int8_characterization_b{args.batch}",
                      "results": summary}, indent=2))


if __name__ == "__main__":
    main()
