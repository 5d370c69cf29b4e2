"""End-to-end serving throughput: synthetic 3 s clips through the full queued
pipeline (multipart bytes -> task store -> dynamic batcher -> host decode +
face crop + resample -> jitted TPU forward -> worker result JSON).

This is the BASELINE.json north-star metric shape (>=5,000 3 s clips/min).

Usage: python benchmarks/bench_serving.py [--clips 256] [--checkpoint ...]
       (no checkpoint -> random-weight flagship xattn model)
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _make_wav_bytes(tmp: Path, seconds: float = 3.0) -> bytes:
    import wave

    p = tmp / "clip.wav"
    sr = 16000
    t = np.arange(int(sr * seconds)) / sr
    wav = 0.3 * np.sin(2 * np.pi * 300 * t) + 0.02 * np.random.randn(t.size)
    with wave.open(str(p), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.clip(wav * 32767, -32768, 32767).astype("<i2").tobytes())
    return p.read_bytes()


def _make_clip_bytes(tmp: Path, container: str, seconds: float = 3.0) -> tuple:
    """(filename, bytes) for one synthetic 3 s clip.

    container mp4/webm: REAL audio-carrying video (480x360@30fps synthetic
    face + tone) muxed by the native encoder — the shape of an actual browser
    upload.  container wav: audio-only fallback (zero-frame video path)."""
    sr = 16000
    if container == "wav":
        return "clip.wav", _make_wav_bytes(tmp, seconds)
    from multimodalemotionrecognition_tpu.native import medialoader

    if not medialoader.available():
        raise RuntimeError(
            "mp4/webm payloads need the native medialoader: "
            "python -m multimodalemotionrecognition_tpu.native.build"
        )
    n, h, w = int(30 * seconds), 360, 480
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 40, (n, h, w, 3)).astype(np.uint8)
    for i in range(n):  # moving skin-tone "face" so the detector has work
        y0, x0 = 100 + (i % 5), 180 + (i % 5)
        frames[i, y0 : y0 + 150, x0 : x0 + 120] = (200, 140, 110)
    t = np.arange(int(sr * seconds)) / sr
    tone = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    if container == "mp4b":
        # B-frame-heavy x264 (the real browser-upload shape): 8 consecutive
        # non-reference B-frames between references — lets the decoder's
        # NONREF skip drop ~90% of frames (bench_decode r5: 2.4x preprocess).
        os.environ["EMO_ENCODE_X264OPTS"] = (
            "bf=8:b_strategy=0:b-pyramid=none:sc_threshold=0"
        )
        path = tmp / "clip.mp4"
    else:
        path = tmp / f"clip.{container}"
    try:
        medialoader.encode_av(
            str(path), frames, fps=30.0, audio=tone, sample_rate=sr
        )
    finally:
        os.environ.pop("EMO_ENCODE_X264OPTS", None)
    return path.name, path.read_bytes()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=256)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument(
        "--container",
        default="mp4",
        choices=["mp4", "mp4b", "webm", "wav"],
        help="payload type; mp4/webm are real audio-carrying videos",
    )
    ap.add_argument("--preprocess-workers", type=int, default=8)
    ap.add_argument(
        "--latency",
        action="store_true",
        help="sequential single-request latency (p50/p95) instead of throughput",
    )
    args = ap.parse_args()

    import os

    import jax

    # Persistent compilation cache: tunnel compiles of the flagship take
    # minutes; cached reloads take seconds (same setup as bench.py).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodalemotionrecognition_tpu.config import ModelConfig, ServeConfig
    from multimodalemotionrecognition_tpu.serving.batcher import (
        DynamicBatcher,
        InferenceGateway,
    )

    if args.checkpoint:
        from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

        runner = JaxModelRunner(
            args.checkpoint, batch_buckets=(args.batch_size,), device_normalize=True
        )
    else:
        # Random-weight flagship via an in-memory checkpoint.
        from multimodalemotionrecognition_tpu.convert.torch_import import (
            save_torch_checkpoint,
        )
        from multimodalemotionrecognition_tpu.models.factory import build_model
        from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

        cfg = ModelConfig(
            fusion="xattn", use_wavlm=True, num_classes=8,
            xattn_attn_dropout=0.0, xattn_stochastic_depth=0.0,
            compute_dtype="bfloat16", spec_augment=False,
        )
        model = build_model(cfg)
        import jax.numpy as jnp

        video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
        audio = jnp.zeros((1, 1, 48000), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), video, audio)
        with tempfile.TemporaryDirectory() as d:
            ckpt = Path(d) / "flagship.pt"
            save_torch_checkpoint(ckpt, variables, config=cfg.to_checkpoint_dict())
            runner = JaxModelRunner(
                str(ckpt),
                batch_buckets=(args.batch_size,),
                compute_dtype="bfloat16",
                device_normalize=True,
            )

    print("[bench_serving] warming up buckets...")
    runner.warmup()

    config = ServeConfig(batch_size=args.batch_size, batch_timeout_ms=20)

    async def run() -> float:
        gateway = InferenceGateway(config)
        batcher = DynamicBatcher(
            gateway, runner, config, preprocess_workers=args.preprocess_workers
        )
        task = asyncio.create_task(batcher.run())
        with tempfile.TemporaryDirectory() as d:
            name, payload = _make_clip_bytes(Path(d), args.container)
            ext = Path(name).suffix
            # Warm one clip through (first host decode paths).
            tid = await gateway.submit(f"warm{ext}", payload)
            await gateway.wait_for_result(tid, timeout_sec=120)

            if args.latency:
                # Sequential submits: per-request wall time (batching window
                # included — this is what one live client observes).
                lats = []
                for i in range(args.clips):
                    t0 = time.perf_counter()
                    tid = await gateway.submit(f"clip{i}{ext}", payload)
                    await gateway.wait_for_result(tid, timeout_sec=600)
                    lats.append(time.perf_counter() - t0)
                dt = float(np.sum(lats))
            else:
                t0 = time.perf_counter()
                ids = await gateway.submit_many(
                    [(f"clip{i}{ext}", payload) for i in range(args.clips)]
                )
                await asyncio.gather(
                    *(gateway.wait_for_result(i, timeout_sec=600) for i in ids)
                )
                dt = time.perf_counter() - t0
                lats = None
        batcher.stop()
        task.cancel()
        print("[bench_serving] stages:", json.dumps(batcher.timer.summary()))
        return dt, lats

    dt, lats = asyncio.run(run())
    if args.latency:
        arr = np.asarray(sorted(lats))
        p50 = float(arr[len(arr) // 2]) * 1e3
        p95 = float(arr[int(len(arr) * 0.95)]) * 1e3
        print(
            json.dumps(
                {
                    "metric": f"serving_request_latency_{args.container}",
                    "value": round(p50, 1),
                    "unit": "ms_p50",
                    "p95_ms": round(p95, 1),
                    # ref GPU full pipeline <1 s/clip (SYSTEM_SUMMARY.md:737)
                    "vs_baseline": round(1000.0 / p50, 2),
                }
            )
        )
        return
    clips_per_min = args.clips / dt * 60.0
    print(
        json.dumps(
            {
                "metric": f"serving_e2e_throughput_b{args.batch_size}_{args.container}",
                "value": round(clips_per_min, 1),
                "unit": "3s_clips_per_min",
                "vs_baseline": round(clips_per_min / 60.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
