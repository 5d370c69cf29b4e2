"""Throughput benchmark: flagship xattn fusion forward on real hardware.

Measures end-to-end model throughput for 3-second clips — raw waveform in
(mel/WavLM front-end fused on device), 8 face-cropped frames through ResNet18,
bidirectional cross-attention fusion — and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "3s_clips_per_min", "vs_baseline": N}

Baseline: the reference reports <1 s/clip on an NVIDIA GPU for the full
pipeline (SYSTEM_SUMMARY.md:737-740) => 60 clips/min; vs_baseline = value/60.

The benched TPU chip is shared/tunneled: available HBM varies between runs
(b128 measured fine in round 1 and OOMed in round 2 with no code change).
On RESOURCE_EXHAUSTED the bench halves the batch and retries IN A FRESH
SUBPROCESS — an OOM poisons the originating process (buffers from the failed
attempt stay pinned; even batch-8 allocations fail afterwards, measured).
Throughput is within ~10% across b32..b128 (the per-clip slope ~0.5 ms
dominates the batch term), so the reported number stays comparable; the
metric name carries the batch actually used.

Env knobs: BENCH_BATCH (default 128), BENCH_WAVLM (default 1),
BENCH_DTYPE (bfloat16|float32, default bfloat16), BENCH_ITERS (default 40).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def measure(batch: int, use_wavlm: bool, dtype: str, iters: int) -> float:
    """Scan-slope per-iteration time for one batch size -> clips/min."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from multimodalemotionrecognition_tpu.config import ModelConfig
    from multimodalemotionrecognition_tpu.models.factory import build_model

    config = ModelConfig(
        fusion="xattn",
        use_wavlm=use_wavlm,
        num_classes=8,
        xattn_attn_dropout=0.0,
        xattn_stochastic_depth=0.0,
        compute_dtype=dtype,
        spec_augment=False,
    )
    model = build_model(config)

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(batch, 8, 3, 112, 112).astype(np.float32))
    audio = jnp.asarray(rng.randn(batch, 1, 48000).astype(np.float32) * 0.1)
    if use_wavlm:
        def prep(a):
            return a
    else:
        def prep(a):
            from multimodalemotionrecognition_tpu.ops.mel import (
                log_mel_spectrogram,
            )

            return log_mel_spectrogram(a[:, 0, :])[:, None, :, :]

    variables = model.init(jax.random.PRNGKey(0), video, prep(audio))

    def step(variables, video, audio):
        out, _ = model.apply(variables, video, prep(audio))
        return jax.nn.softmax(out.astype(jnp.float32), axis=1)

    def make_loop(n):
        @jax.jit
        def loop(variables, video, audio):
            def body(carry, _):
                # Chain each iteration's input to the previous output:
                # defeats CSE/LICM and keeps every iteration doing real
                # compute; the final carry fetch transitively waits for all.
                probs = step(variables, video, audio + carry * 1e-24)
                return carry + probs.sum(), None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        return loop

    def timed(n, repeats=3):
        # Sync via a host fetch — on the tunneled axon backend
        # block_until_ready() returns before device completion.  min-of-
        # repeats strips tunnel RPC jitter.
        loop = make_loop(n)
        np.asarray(loop(variables, video, audio))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop(variables, video, audio))
            best = min(best, time.perf_counter() - t0)
        return best

    # Slope between two scan lengths: per-iteration DEVICE time with the
    # fixed per-call dispatch/RPC overhead cancelled (the round-1 per-call
    # loop measured dispatch, not compute — see benchmarks/RESULTS.md).
    n_lo, n_hi = max(2, iters // 4), iters
    t_lo, t_hi = timed(n_lo), timed(n_hi)
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    return batch / dt * 60.0


def run_single() -> None:
    """Child mode: one measurement at BENCH_BATCH, print the JSON line."""
    import jax

    # Persistent compilation cache: tunnel compiles of the flagship take
    # minutes; repeated bench runs (and the driver's) reuse the executable.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    use_wavlm = os.environ.get("BENCH_WAVLM", "1") == "1"
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", "40"))

    clips_per_min = measure(batch, use_wavlm, dtype, iters)
    baseline_clips_per_min = 60.0  # reference GPU: <1 s per 3 s clip
    print(
        json.dumps(
            {
                "metric": f"xattn{'_wavlm' if use_wavlm else ''}_fwd_throughput_b{batch}_{dtype}",
                "value": round(clips_per_min, 1),
                "unit": "3s_clips_per_min",
                "vs_baseline": round(clips_per_min / baseline_clips_per_min, 2),
                "method": "scan_slope_min3",
            }
        )
    )


def main() -> None:
    if os.environ.get("BENCH_SINGLE") == "1":
        run_single()
        return

    import subprocess
    import sys

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    while batch >= 8:
        env = {**os.environ, "BENCH_SINGLE": "1", "BENCH_BATCH": str(batch)}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        err = proc.stdout + proc.stderr
        if "RESOURCE_EXHAUSTED" not in err:
            sys.stderr.write(err)
            raise RuntimeError(f"bench subprocess failed (batch {batch})")
        print(
            f"[bench] batch {batch} hit RESOURCE_EXHAUSTED on the shared "
            f"chip; retrying at {batch // 2} in a fresh process",
            flush=True,
        )
        batch //= 2
    raise RuntimeError("bench failed: RESOURCE_EXHAUSTED even at batch 8")


if __name__ == "__main__":
    main()
