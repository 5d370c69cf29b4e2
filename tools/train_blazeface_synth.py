"""Pretrain the JAX BlazeFace on procedural face scenes; bundle the weights.

The reference's detector is MediaPipe's pretrained BlazeFace
(`/root/reference/src/utils/face_crop.py:40-148`).  This image has no egress
to fetch those weights, so this tool produces the bundled fallback: the same
short-range architecture (`models/blazeface.py`) trained on the procedural
scene distribution of `data/synthface.py` (frontal skin-tone faces with
eye/mouth features over cluttered backdrops — the RAVDESS studio shape).
The official weights remain a strict drop-in upgrade through
`convert/blazeface_export.py`; anchors/decode/NMS are shared.

TPU-first training loop: the whole dataset lives on device, and steps run
in `lax.scan` chunks (default 100 steps per dispatch) so a tunneled TPU
pays one RPC per chunk, not per step.  Use --cpu to force the host backend.

Usage:
    python tools/train_blazeface_synth.py [--steps 4000] [--out PATH] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _default_out() -> Path:
    return REPO / "multimodalemotionrecognition_tpu" / "assets" / "blazeface_synth.npz"


def train(args) -> Path:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from multimodalemotionrecognition_tpu.data.synthface import make_dataset
    from multimodalemotionrecognition_tpu.models import blazeface as bf

    print(f"[train] generating {args.n_scenes} scenes ...", flush=True)
    imgs, cls_t, box_t = make_dataset(args.n_scenes, seed=args.seed, p_face=0.9)
    imgs_d = jnp.asarray(imgs)  # uint8 on device; normalized per minibatch
    cls_d = jnp.asarray(cls_t)
    box_d = jnp.asarray(box_t)

    params = bf.load_params(bf.random_blazeface_state_dict(seed=args.seed))
    warmup = min(100, args.steps // 4)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup, decay_steps=args.steps, end_value=args.lr * 1e-2
    )
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    batch, k_neg, w_box = args.batch, 64, 0.05

    def loss_fn(p, bimgs, bcls, bbox):
        x = bimgs.astype(jnp.float32) / 127.5 - 1.0
        raw, logits = bf.blazeface_forward_logits(p, x)
        bce = optax.sigmoid_binary_cross_entropy(logits, bcls)  # (b, 896)
        npos = jnp.maximum(bcls.sum(), 1.0)
        pos_loss = (bce * bcls).sum() / npos
        # Hard-negative mining: the k_neg highest-loss negatives per image.
        neg_bce = jnp.where(bcls > 0, -jnp.inf, bce)
        hard, _ = jax.lax.top_k(neg_bce, k_neg)
        neg_loss = jnp.maximum(hard, 0.0).sum() / (batch * k_neg)
        l1 = jnp.abs(raw[..., :4] - bbox) * bcls[..., None]
        box_loss = l1.sum() / (4.0 * npos)
        return pos_loss + neg_loss + w_box * box_loss, (pos_loss, neg_loss, box_loss)

    def step(carry, i):
        p, s, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch,), 0, imgs_d.shape[0])
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, imgs_d[idx], cls_d[idx], box_d[idx]
        )
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s, key), jnp.stack([loss, *aux])

    @jax.jit
    def run_chunk(p, s, key):
        (p, s, key), hist = jax.lax.scan(step, (p, s, key), jnp.arange(args.chunk))
        return p, s, key, hist

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    done = 0
    while done < args.steps:
        params, opt_state, key, hist = run_chunk(params, opt_state, key)
        done += args.chunk
        h = np.asarray(hist)
        print(
            f"[train] step {done}/{args.steps}  loss {h[-1, 0]:.4f} "
            f"(pos {h[-1, 1]:.4f} neg {h[-1, 2]:.4f} box {h[-1, 3]:.2f}px) "
            f"{time.time() - t0:.0f}s",
            flush=True,
        )

    # HWIO jnp params -> torch OIHW layout npz (the format load_params expects).
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    state = {}
    for k, v in params.items():
        a = np.asarray(v, np.float32)
        state[k] = np.transpose(a, (3, 2, 0, 1)) if a.ndim == 4 else a
    from multimodalemotionrecognition_tpu.convert.blazeface_export import (
        validate_blazeface_state_dict,
    )

    validate_blazeface_state_dict(state)
    np.savez(out, **state)
    print(f"[train] wrote {out} ({out.stat().st_size / 1024:.0f} KiB)")
    return out


def evaluate(weights: Path, n: int = 160, seed: int = 999) -> dict:
    """Held-out eval of the FULL detector pipeline (resize, forward, decode,
    weighted NMS) vs scene ground truth, alongside the heuristic detector."""
    from multimodalemotionrecognition_tpu.data.face import (
        BlazeFaceDetector,
        HeuristicFaceDetector,
    )
    from multimodalemotionrecognition_tpu.data.synthface import make_scene

    def iou(a, b):
        ax, ay, aw, ah = a
        bx, by, bw, bh = b
        x0, y0 = max(ax, bx), max(ay, by)
        x1, y1 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
        inter = max(0, x1 - x0) * max(0, y1 - y0)
        return inter / float(aw * ah + bw * bh - inter)

    det = BlazeFaceDetector(weights)
    heur = HeuristicFaceDetector()
    rng = np.random.default_rng(seed)
    stats = {"faces": 0, "det": 0, "fp": 0, "noface": 0}
    ious, h_ious = [], []
    for _ in range(n):
        img, truth = make_scene(rng, p_face=0.85)
        got = det.detect_face_bbox(img)
        hgot = heur.detect_face_bbox(img)
        if truth is None:
            stats["noface"] += 1
            stats["fp"] += int(got is not None)
            continue
        stats["faces"] += 1
        if got is not None:
            stats["det"] += 1
            ious.append(iou(got, truth))
        if hgot is not None:
            h_ious.append(iou(hgot, truth))
    report = {
        "faces": stats["faces"],
        "detection_rate": stats["det"] / max(1, stats["faces"]),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
        "median_iou": float(np.median(ious)) if ious else 0.0,
        "false_positive_rate": stats["fp"] / max(1, stats["noface"]),
        "heuristic_mean_iou": float(np.mean(h_ious)) if h_ious else 0.0,
    }
    print("[eval] " + json.dumps(report))
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=100, help="scan steps per dispatch")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-scenes", type=int, default=768)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=str(_default_out()))
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args(argv)
    out = Path(args.out)
    if not args.eval_only:
        out = train(args)
    evaluate(out)


if __name__ == "__main__":
    main()
