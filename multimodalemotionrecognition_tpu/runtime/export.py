"""Model export (reference `src/export_optimized_model.py:26-104`).

The reference exports torch -> ONNX (opset 17, dynamic batch) with a sidecar
`*.meta.json` and an optional dynamically-quantized int8 variant.  The
TPU-native equivalent serializes the jitted forward as **StableHLO** via
`jax.export` — a stable, runtime-loadable artifact the same way ONNX is — with
the same sidecar metadata contract ({fusion, num_classes, use_wavlm, labels})
and an int8 weight-only variant.

Usage:
  python -m multimodalemotionrecognition_tpu.runtime.export \
      --checkpoint outputs/best_xattn.pt --output exports/best_xattn.stablehlo \
      [--int8] [--batch-sizes 1,8]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = ["export_stablehlo", "load_exported", "main"]


def export_stablehlo(
    checkpoint_path: str,
    output_path: str,
    batch_sizes: Sequence[int] = (1, 8),
    quantize_int8: bool = False,
    num_classes: Optional[int] = None,
) -> Path:
    """Serialize the checkpoint's forward to StableHLO + meta.json sidecar."""
    import jax
    from jax import export as jax_export

    from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

    runner = JaxModelRunner(
        checkpoint_path, num_classes=num_classes, quantize_int8=quantize_int8
    )

    artifacts = {}
    for b in batch_sizes:
        video, audio = runner._example_inputs(b)

        def fn(video, audio):
            # Closure over the weights is deliberate here: the export must be
            # a self-contained artifact with parameters baked in (like ONNX).
            return runner._forward(runner.variables, video, audio)

        exported = jax_export.export(jax.jit(fn))(video, audio)
        artifacts[str(b)] = exported.serialize()

    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    # Container: simple npz of serialized modules keyed by batch size.
    np.savez(
        out,
        **{k: np.frombuffer(v, dtype=np.uint8) for k, v in artifacts.items()},
    )
    final = out if out.suffix == ".npz" else Path(str(out) + ".npz")

    meta = {
        "format": "stablehlo",
        "fusion": runner.fusion_mode,
        "num_classes": runner.num_classes,
        "use_wavlm": runner.use_wavlm,
        "labels": runner.labels,
        "batch_sizes": list(batch_sizes),
        "quantized_int8": quantize_int8,
        "input_layout": {
            "video": "[B, T=8, 3, 112, 112] float32 (ImageNet-normalized)",
            "audio": "[B, 1, 48000] float32"
            if runner.use_wavlm
            else f"[B, 1, {runner.model_config.audio_n_mels}, 301] float32 (log-mel dB)",
        },
        "output": "[B, num_classes] probabilities",
    }
    meta_path = Path(str(final) + ".meta.json")
    meta_path.write_text(json.dumps(meta, indent=2), encoding="utf-8")
    print(f"[export] wrote {final} + {meta_path}")
    return final


class ExportedRunner:
    """Load and run a StableHLO export (OnnxModelRunner analog,
    `src/optimized_runtime.py:111-143`)."""

    def __init__(self, path: str):
        from jax import export as jax_export

        p = Path(path)
        if p.suffix != ".npz":
            p = Path(str(p) + ".npz")
        meta_path = Path(str(p) + ".meta.json")
        if not p.exists():
            raise FileNotFoundError(f"Export not found: {p}")
        if not meta_path.exists():
            raise FileNotFoundError(f"Export metadata file not found: {meta_path}")
        self.meta = json.loads(meta_path.read_text(encoding="utf-8"))
        self.fusion_mode = str(self.meta["fusion"])
        self.num_classes = int(self.meta["num_classes"])
        self.labels = list(self.meta["labels"])
        data = np.load(p)
        self._fns = {
            int(k): jax_export.deserialize(bytes(data[k].tobytes())).call
            for k in data.files
        }
        self._buckets = sorted(self._fns)

    def predict_probs(self, videos: np.ndarray, audios: np.ndarray) -> np.ndarray:
        n = len(videos)
        max_bucket = self._buckets[-1]
        if n > max_bucket:
            # Chunk oversized requests through the largest exported bucket
            # (mirrors JaxModelRunner._bucket_for; the reference's ONNX path
            # has a dynamic batch axis so it never truncates,
            # `src/optimized_runtime.py:133-143`).
            outs = [
                self.predict_probs(videos[i : i + max_bucket], audios[i : i + max_bucket])
                for i in range(0, n, max_bucket)
            ]
            return np.concatenate(outs, axis=0)
        bucket = next(b for b in self._buckets if b >= n)
        pad = bucket - n
        if pad > 0:
            videos = np.concatenate([videos, np.zeros((pad,) + videos.shape[1:], np.float32)])
            audios = np.concatenate([audios, np.zeros((pad,) + audios.shape[1:], np.float32)])
        out = np.asarray(self._fns[bucket](videos, audios))
        return out[:n]


def load_exported(path: str) -> ExportedRunner:
    return ExportedRunner(path)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--batch-sizes", default="1,8")
    p.add_argument("--num_classes", type=int, default=None)
    args = p.parse_args(argv)
    export_stablehlo(
        args.checkpoint,
        args.output,
        batch_sizes=[int(x) for x in args.batch_sizes.split(",")],
        quantize_int8=args.int8,
        num_classes=args.num_classes,
    )


if __name__ == "__main__":
    main()
