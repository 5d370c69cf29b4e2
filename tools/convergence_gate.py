"""Synthetic convergence regression gate (VERDICT r2 item 7).

Trains the gated fusion model end-to-end (decode -> augment -> train) on a
procedurally generated strong-signal RAVDESS-style corpus with a FIXED seed
and asserts the actor-held-out test accuracy lands in a target band.  A
silent training-quality regression (optimizer, augmentation, data pipeline,
model) shows up as a miss; stands in for the reference's reported accuracy
table (`README.md:361-368`) until real RAVDESS data exists in this
environment.

Corpus: 8 actors x 8 emotions x 4 clips = 256 pairs (data/synthetic.py
`strong_signal=True`: mel-separable tone stacks + position/motion-coded
video, per-actor nuisance variation so the split is meaningful).  Train
actors 1-6, val 7, test 8.

Round-5 resolution upgrade (VERDICT r4 item 4): the s=1.0 corpus saturated
at 1.000 accuracy — only a catastrophic regression could miss the 0.70 band.
`--signal_strength` (data/synthetic.py) now controls corpus separability;
the gate default is calibrated so a healthy run lands mid-band (~0.8-0.9),
and the report carries continuous margin metrics that move before pass/fail
does: mean test top-1 softmax margin (p1 - p2), val F1 at epoch 3, and the
first epoch to reach 0.8 val accuracy.

Usage: python tools/convergence_gate.py [--epochs 12] [--target 0.70]
       [--signal_strength 0.5] [--device cpu] [--root DIR]
Prints one JSON line; exit code 1 if below target.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--target", type=float, default=0.70)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--device", choices=["default", "cpu"], default="default")
    ap.add_argument("--root", default="", help="reuse an existing corpus dir")
    ap.add_argument("--fusion", default="gated")
    ap.add_argument(
        "--signal_strength",
        type=float,
        default=0.4,
        help="corpus separability in [0,1]; 1.0 = the saturating r3 corpus. "
        "0.4 calibrated on TPU (round 5): healthy run lands ~0.81 test acc "
        "(s=0.5 -> 0.97, s=1.0 -> 1.00), so the 0.70 target has real "
        "resolution — see benchmarks/gate_r05.json",
    )
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodalemotionrecognition_tpu.data.synthetic import (
        generate_synthetic_ravdess,
    )

    if args.root:
        root = Path(args.root)
        root.mkdir(parents=True, exist_ok=True)
    else:
        root = Path(tempfile.mkdtemp(prefix="convergence_gate_"))
    if not any(root.rglob("*.mp4")):
        t0 = time.time()
        n = generate_synthetic_ravdess(
            root,
            actors=range(1, 9),
            emotions=range(1, 9),
            seconds=1.0,
            fps=10,
            seed=7,
            clips_per_pair=4,
            strong_signal=True,
            signal_strength=args.signal_strength,
        )
        print(
            f"[gate] wrote {n} pairs (s={args.signal_strength}) in "
            f"{time.time() - t0:.1f}s at {root}"
        )

    from multimodalemotionrecognition_tpu.train.cli import (
        build_arg_parser,
        configs_from_args,
    )

    out_dir = root / "outputs"
    cli = build_arg_parser().parse_args(
        [
            "--data_root", str(root),
            "--fusion", args.fusion,
            "--epochs", str(args.epochs),
            "--batch_size", str(args.batch_size),
            "--frames", str(args.frames),
            "--img_size", str(args.img_size),
            "--split_mode", "actor",
            "--train_actors", "1,2,3,4,5,6",
            "--val_actors", "7",
            "--test_actors", "8",
            "--early_stopping_patience", "0",
            "--seed", "42",
            "--output_dir", str(out_dir),
            "--no_face_crop",
        ]
    )
    model_cfg, train_cfg, data_cfg = configs_from_args(cli)

    from multimodalemotionrecognition_tpu.data.pipeline import build_loaders
    from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

    cwd = os.getcwd()
    os.chdir(root)  # pairs.csv lands here, not in the repo
    try:
        train_loader, val_loader, test_loader = build_loaders(
            data_cfg, args.batch_size
        )
        print(
            f"[gate] train {train_loader.num_samples} / val "
            f"{val_loader.num_samples} / test {test_loader.num_samples}"
        )
        trainer = EmotionTrainer(model_cfg, train_cfg, data_cfg)
        t0 = time.time()
        state, result = trainer.fit(train_loader, val_loader, test_loader)
        train_s = time.time() - t0
    finally:
        os.chdir(cwd)

    test_acc = float(result["test"]["acc"])
    test_f1 = float(result["test"]["f1"])
    ok = test_acc >= args.target

    # ---- continuous resolution metrics (move before pass/fail does) ----
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def _probs(params, batch_stats, video, audio_wav):
        v = trainer._device_video(video, None, None)
        a = trainer._audio_features(audio_wav)
        out, _, _ = trainer._apply(
            {"params": params, "batch_stats": batch_stats}, v, a, False, None,
            mutable=False,
        )
        if args.fusion == "late":
            # Reference quirk: late fusion already returns probabilities —
            # re-softmaxing would compress margins toward uniform.
            return out
        return jax.nn.softmax(out, axis=-1)

    margins = []
    for batch in test_loader:
        p = np.asarray(
            _probs(state.params, state.batch_stats, batch.video, batch.audio)
        )[np.asarray(batch.valid)]
        top2 = np.sort(p, axis=1)[:, -2:]
        margins.append(top2[:, 1] - top2[:, 0])
    mean_margin = float(np.concatenate(margins).mean()) if margins else None

    history = result["history"]
    val_f1_at_3 = (
        round(float(history[2]["val/f1"]), 4) if len(history) >= 3 else None
    )
    epochs_to_08 = next(
        (row["epoch"] for row in history if row["val/acc"] >= 0.8), None
    )

    print(
        json.dumps(
            {
                "metric": "synthetic_convergence_gate",
                "value": round(test_acc, 4),
                "unit": "actor_heldout_test_acc",
                "target": args.target,
                "pass": ok,
                "signal_strength": args.signal_strength,
                "test_f1": round(test_f1, 4),
                "best_val_f1": round(float(result["best_val_f1"]), 4),
                "mean_top1_margin": (
                    round(mean_margin, 4) if mean_margin is not None else None
                ),
                "val_f1_at_epoch3": val_f1_at_3,
                "epochs_to_val_acc_0.8": epochs_to_08,
                "epochs": args.epochs,
                "fusion": args.fusion,
                "train_seconds": round(train_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
