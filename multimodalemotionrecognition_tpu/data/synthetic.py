"""Synthetic RAVDESS-style dataset generation (for smoke tests / demos).

Builds a directory tree of correctly-named pairs — `02-01-EE-01-01-01-AA.mp4`
video-only clips (moving skin-tone "face" on dark background, emotion-coded
motion) and `03-01-EE-01-01-01-AA.wav` audio-only clips (emotion-coded tone
stacks) — so the full train/eval/serve workflow can run end-to-end without
the real corpus.
"""

from __future__ import annotations

import wave
from pathlib import Path
from typing import Sequence

import numpy as np

__all__ = ["generate_synthetic_ravdess"]


def _write_wav(path: Path, wav: np.ndarray, sr: int) -> None:
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.clip(wav * 32767, -32768, 32767).astype("<i2").tobytes())


def generate_synthetic_ravdess(
    root: Path | str,
    actors: Sequence[int] = (1, 2),
    emotions: Sequence[int] = (3, 5),
    seconds: float = 1.0,
    fps: int = 10,
    size: int = 160,
    sample_rate: int = 16000,
    seed: int = 0,
) -> int:
    """Write paired clips; returns the number of pairs created."""
    import cv2

    root = Path(root)
    rng = np.random.RandomState(seed)
    n_frames = int(seconds * fps)
    count = 0
    for actor in actors:
        actor_dir = root / f"Actor_{actor:02d}"
        actor_dir.mkdir(parents=True, exist_ok=True)
        for emotion in emotions:
            stem = f"01-0{emotion}-01-01-01-{actor:02d}"
            # video: skin-tone block whose drift speed encodes the emotion
            vpath = actor_dir / f"02-{stem}.mp4"
            writer = cv2.VideoWriter(
                str(vpath), cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, int(size * 0.75))
            )
            h = int(size * 0.75)
            for i in range(n_frames):
                frame = np.full((h, size, 3), 25, np.uint8)
                dx = int(3 * emotion * np.sin(i / 2.0))
                y0, x0 = h // 4 + dx % 5, size // 3 + dx % 7
                frame[y0 : y0 + h // 2, x0 : x0 + size // 4] = (110, 140, 200)  # BGR skin
                writer.write(frame)
            writer.release()
            # audio: tone stack at emotion-dependent frequencies + noise
            t = np.arange(int(sample_rate * seconds)) / sample_rate
            f0 = 160 + 40 * emotion
            wav = (
                0.4 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 2.1 * f0 * t)
                + 0.02 * rng.randn(t.size)
            )
            _write_wav(actor_dir / f"03-{stem}.wav", wav * 0.5, sample_rate)
            count += 1
    return count


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data_synthetic")
    p.add_argument("--actors", type=int, default=4)
    p.add_argument("--emotions", default="1,2,3,4,5,6,7,8")
    p.add_argument("--seconds", type=float, default=3.0)
    args = p.parse_args()
    n = generate_synthetic_ravdess(
        args.root,
        actors=range(1, args.actors + 1),
        emotions=[int(x) for x in args.emotions.split(",")],
        seconds=args.seconds,
    )
    print(f"wrote {n} pairs under {args.root}")
