"""Face-crop parity error budget (r2 VERDICT item #3).

The reference crops with MediaPipe boxes (`src/utils/face_crop.py:40-148`);
this build ships three detector families (skin-chroma heuristic, bundled
synthetic BlazeFace, OpenCV Haar cascade) but — with no egress to record
MediaPipe fixtures — cannot measure bbox parity against MediaPipe directly.
This tool converts that unknown into a BOUNDED error budget, two ways:

1. **Crop-sensitivity curve**: perturb ground-truth bboxes by +-k px on
   synthetic scenes and measure how far the video-branch logits move
   through the exact production crop path (30%-padded crop -> 112x112
   bilinear resize -> /255 -> ImageNet normalize -> VideoNet forward).
   This maps "bbox error in px" -> "logit error", so ANY future measured
   detector disagreement reads off the curve as a logit bound.

2. **Detector triangulation**: run all three families over the same scenes
   and report detection rate, IoU vs ground truth, pairwise IoU and mean
   corner distance in px.  Haar is trained on real faces (like MediaPipe),
   so heuristic<->haar disagreement is the best offline proxy for
   heuristic<->MediaPipe disagreement.

Outputs one JSON blob (benchmarks/face_parity.json) + a markdown table on
stdout.  Runs on CPU (host preprocessing path; scenes are numpy).

Usage: python tools/face_crop_parity.py [--scenes 24] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side study; tunnel RPC-free

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodalemotionrecognition_tpu.config import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
    ModelConfig,
)
from multimodalemotionrecognition_tpu.data.face import (  # noqa: E402
    BUNDLED_BLAZEFACE_WEIGHTS,
    BlazeFaceDetector,
    HaarFaceDetector,
    HeuristicFaceDetector,
    crop_with_padding,
)
from multimodalemotionrecognition_tpu.data.synthface import make_scene  # noqa: E402
from multimodalemotionrecognition_tpu.models.factory import build_model  # noqa: E402


def iou(a, b) -> float:
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    ix0, iy0 = max(ax0, bx0), max(ay0, by0)
    ix1, iy1 = min(ax0 + aw, bx0 + bw), min(ay0 + ah, by0 + bh)
    inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
    union = aw * ah + bw * bh - inter
    return inter / union if union > 0 else 0.0


def corner_dist(a, b) -> float:
    """Mean L2 distance of the two bbox corners, in px."""
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    d0 = np.hypot(ax0 - bx0, ay0 - by0)
    d1 = np.hypot(ax0 + aw - (bx0 + bw), ay0 + ah - (by0 + bh))
    return float((d0 + d1) / 2)


def crop_pipeline(frame: np.ndarray, bbox) -> np.ndarray:
    """The production crop path (data/media.py::decode_video_frames_u8 tail):
    30%-padded crop, bilinear 112 resize, /255, ImageNet normalize."""
    crop = crop_with_padding(frame, bbox, pad_ratio=0.3)
    img = cv2.resize(crop, (112, 112), interpolation=cv2.INTER_LINEAR)
    f = img.astype(np.float32) / 255.0
    f = (f - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
        IMAGENET_STD, np.float32
    )
    return f.transpose(2, 0, 1)  # [3,112,112]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--perturb-samples", type=int, default=4)
    ap.add_argument(
        "--out", type=str, default="benchmarks/face_parity.json"
    )
    ap.add_argument(
        "--weights",
        type=str,
        default="",
        help="trained .pt checkpoint (video-only or fusion; fusion video "
        "branch is extracted) — replaces the random-init VideoNet so the "
        "sensitivity curve reflects a trained backbone (VERDICT r3 item 3)",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(42)
    scenes = []
    while len(scenes) < args.scenes:
        img, bbox = make_scene(rng, size=args.size, p_face=1.0)
        if bbox is not None:
            scenes.append((img, bbox))

    # ------------------------------------------------------------------
    # 1. Crop-sensitivity curve
    # ------------------------------------------------------------------
    model = build_model(ModelConfig(fusion="video", num_classes=8))
    video0 = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), video0)
    weights_src = "random_init"
    weights_sha256 = None
    if args.weights:
        from multimodalemotionrecognition_tpu.convert.torch_import import (
            load_reference_checkpoint,
            torch_state_dict_to_flax,
        )

        sd, _ = load_reference_checkpoint(args.weights)
        prefix = (
            "video_model."
            if any(k.startswith("video_model.") for k in sd)
            else ""
        )
        variables, report = torch_state_dict_to_flax(
            sd, variables, torch_prefix=prefix, strict=False
        )
        # The fusion checkpoint trains VideoNet as an encoder, so its
        # classifier head stays at init — fine for a sensitivity study:
        # the curve measures feature movement under crop error, and a fixed
        # random linear readout of TRAINED features preserves exactly that.
        print(
            f"[parity] loaded trained weights from {args.weights} "
            f"(prefix='{prefix}', missing={len(report.missing_flax_paths)}, "
            f"unused={len(report.unused_torch_keys)})"
        )
        weights_src = args.weights
        # Content hash so the committed artifact's provenance survives the
        # machine-local path (advisor r4 finding).
        import hashlib

        weights_sha256 = hashlib.sha256(
            Path(args.weights).read_bytes()
        ).hexdigest()

    @jax.jit
    def forward(video):
        return model.apply(variables, video, train=False)

    def logits_for(frame, bbox):
        f = crop_pipeline(frame, bbox)
        video = np.broadcast_to(f, (8,) + f.shape)[None]  # static 8-frame clip
        return np.asarray(forward(jnp.asarray(video)))[0]

    ks = [0, 1, 2, 4, 8, 16, 32]
    curve = []
    base_logits = [logits_for(img, bbox) for img, bbox in scenes]
    logit_scale = float(np.mean([np.std(l) for l in base_logits]))
    for k in ks:
        dl, dp, dpx = [], [], []
        for (img, bbox), base in zip(scenes, base_logits):
            for _ in range(args.perturb_samples if k > 0 else 1):
                if k == 0:
                    pb = bbox
                else:
                    jit_ = rng.integers(-k, k + 1, size=4)
                    pb = (
                        int(bbox[0] + jit_[0]),
                        int(bbox[1] + jit_[1]),
                        max(8, int(bbox[2] + jit_[2])),
                        max(8, int(bbox[3] + jit_[3])),
                    )
                logits = logits_for(img, pb)
                dl.append(np.abs(logits - base).max())
                pa = np.exp(base - base.max()) / np.exp(base - base.max()).sum()
                pbq = np.exp(logits - logits.max())
                pbq /= pbq.sum()
                dp.append(np.abs(pa - pbq).max())
                dpx.append(
                    float(
                        np.abs(
                            crop_pipeline(img, pb) - crop_pipeline(img, bbox)
                        ).mean()
                    )
                )
        curve.append(
            {
                "k_px": k,
                "max_abs_dlogit_mean": float(np.mean(dl)),
                "max_abs_dlogit_p95": float(np.percentile(dl, 95)),
                "max_abs_dprob_mean": float(np.mean(dp)),
                "crop_pixel_mae": float(np.mean(dpx)),
            }
        )
        print(
            f"k={k:3d}px  dlogit mean={np.mean(dl):.4f} p95={np.percentile(dl, 95):.4f}"
            f"  dprob mean={np.mean(dp):.4f}  pixMAE={np.mean(dpx):.4f}"
        )

    # ------------------------------------------------------------------
    # 2. Detector triangulation
    # ------------------------------------------------------------------
    detectors = {"heuristic": HeuristicFaceDetector()}
    haar = HaarFaceDetector()
    if haar.available:
        detectors["haar"] = haar
    if Path(BUNDLED_BLAZEFACE_WEIGHTS).exists():
        detectors["blazeface"] = BlazeFaceDetector(BUNDLED_BLAZEFACE_WEIGHTS)

    results = {name: [] for name in detectors}
    for img, gt in scenes:
        for name, det in detectors.items():
            results[name].append(det.detect_face_bbox(img))

    tri = {}
    for name, dets in results.items():
        hits = [d for d in dets if d is not None]
        ious = [iou(d, gt) for d, (_, gt) in zip(dets, scenes) if d is not None]
        tri[name] = {
            "detection_rate": len(hits) / len(scenes),
            "iou_vs_gt_mean": float(np.mean(ious)) if ious else 0.0,
        }
        print(
            f"{name:10s} rate={tri[name]['detection_rate']:.2f} "
            f"IoU(gt)={tri[name]['iou_vs_gt_mean']:.3f}"
        )
    pair = {}
    names = list(detectors)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            both = [
                (da, db)
                for da, db in zip(results[a], results[b])
                if da is not None and db is not None
            ]
            if both:
                pair[f"{a}~{b}"] = {
                    "iou_mean": float(np.mean([iou(x, y) for x, y in both])),
                    "corner_px_mean": float(
                        np.mean([corner_dist(x, y) for x, y in both])
                    ),
                    "n": len(both),
                }
                print(
                    f"{a}~{b}: IoU={pair[f'{a}~{b}']['iou_mean']:.3f} "
                    f"corner={pair[f'{a}~{b}']['corner_px_mean']:.1f}px (n={len(both)})"
                )

    out = {
        "scene_size_px": args.size,
        "n_scenes": len(scenes),
        "weights": weights_src,
        "weights_sha256": weights_sha256,
        "logit_scale_std": logit_scale,
        "sensitivity_curve": curve,
        "detectors": tri,
        "pairwise": pair,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
