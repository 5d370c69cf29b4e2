"""BlazeFace single-shot face detector, JAX-native.

The reference crops faces with MediaPipe's BlazeFace
(`/root/reference/src/utils/face_crop.py:40-148`, legacy API,
``model_selection=1``, ``min_detection_confidence=0.5``, first detection
wins).  MediaPipe is unavailable here, so this module reimplements the
detector itself: the short-range BlazeFace architecture (128x128 input,
896 SSD anchors over 16x16 + 8x8 feature maps) as a pure-functional JAX
forward pass, plus the MediaPipe anchor decode and weighted ("blending")
non-max suppression.

Weights are a deployment-time asset (this image has no egress): the model
runs from an ``.npz`` produced by ``convert/blazeface_export.py`` from the
widely mirrored PyTorch port of the official tflite weights (state-dict
keys ``backbone1.*``, ``backbone2.*``, ``classifier_8`` ...).  Everything
downstream of the raw head outputs — anchors, decode, NMS — is exact
MediaPipe math and is unit-tested against numpy oracles, so once real
weights are supplied the bbox contract matches the reference.

Architecture notes (TPU-first): all convs are expressed as
``lax.conv_general_dilated`` in NHWC/HWIO with ``feature_group_count`` for
the depthwise stages; the whole forward jits into one executable.  The
kernel size is read from the weight shapes, so 3x3 and 5x5 exports both
load.  Anchor decode happens inside the jitted graph; only the tiny
(896,) score/box tensors cross back to the host, where thresholding and
weighted NMS run in numpy (dynamic-shape logic stays out of XLA).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "BLAZEFACE_INPUT_SIZE",
    "generate_anchors",
    "blazeface_forward",
    "blazeface_forward_logits",
    "decode_boxes_np",
    "weighted_nms_np",
    "random_blazeface_state_dict",
    "BLAZEFACE_SPEC",
]

BLAZEFACE_INPUT_SIZE = 128

# (layer index in the torch Sequential, in_channels, out_channels, stride).
# Index 0 is the 5x5 stem conv, index 1 its ReLU; BlazeBlocks start at 2.
_B1_BLOCKS: List[Tuple[int, int, int, int]] = [
    (2, 24, 24, 1),
    (3, 24, 28, 1),
    (4, 28, 32, 2),
    (5, 32, 36, 1),
    (6, 36, 42, 1),
    (7, 42, 48, 2),
    (8, 48, 56, 1),
    (9, 56, 64, 1),
    (10, 64, 72, 1),
    (11, 72, 80, 1),
    (12, 80, 88, 1),
]
_B2_BLOCKS: List[Tuple[int, int, int, int]] = [
    (0, 88, 96, 2),
    (1, 96, 96, 1),
    (2, 96, 96, 1),
    (3, 96, 96, 1),
    (4, 96, 96, 1),
]

# Exported for the converter: every expected state-dict key -> shape,
# kernel size k for the depthwise convs (the public ports use 3).
def _spec(kernel_size: int = 3) -> Dict[str, Tuple[int, ...]]:
    k = kernel_size
    spec: Dict[str, Tuple[int, ...]] = {
        "backbone1.0.weight": (24, 3, 5, 5),
        "backbone1.0.bias": (24,),
    }
    for idx, cin, cout, _ in _B1_BLOCKS:
        spec[f"backbone1.{idx}.convs.0.weight"] = (cin, 1, k, k)
        spec[f"backbone1.{idx}.convs.0.bias"] = (cin,)
        spec[f"backbone1.{idx}.convs.1.weight"] = (cout, cin, 1, 1)
        spec[f"backbone1.{idx}.convs.1.bias"] = (cout,)
    for idx, cin, cout, _ in _B2_BLOCKS:
        spec[f"backbone2.{idx}.convs.0.weight"] = (cin, 1, k, k)
        spec[f"backbone2.{idx}.convs.0.bias"] = (cin,)
        spec[f"backbone2.{idx}.convs.1.weight"] = (cout, cin, 1, 1)
        spec[f"backbone2.{idx}.convs.1.bias"] = (cout,)
    spec.update(
        {
            "classifier_8.weight": (2, 88, 1, 1),
            "classifier_8.bias": (2,),
            "classifier_16.weight": (6, 96, 1, 1),
            "classifier_16.bias": (6,),
            "regressor_8.weight": (32, 88, 1, 1),
            "regressor_8.bias": (32,),
            "regressor_16.weight": (96, 96, 1, 1),
            "regressor_16.bias": (96,),
        }
    )
    return spec


BLAZEFACE_SPEC = _spec()


def generate_anchors() -> np.ndarray:
    """MediaPipe SSD anchors for the short-range model: (896, 4) rows of
    (x_center, y_center, w, h) in normalized [0,1] coordinates.

    With ``fixed_anchor_size=True`` every anchor has w = h = 1.0; the SSD
    options (strides [8,16,16,16], aspect_ratios [1.0]) collapse to a 16x16
    grid with 2 anchors per cell followed by an 8x8 grid with 6 per cell.
    """
    rows = []
    for grid, per_cell in ((16, 2), (8, 6)):
        for y in range(grid):
            for x in range(grid):
                cx = (x + 0.5) / grid
                cy = (y + 0.5) / grid
                for _ in range(per_cell):
                    rows.append((cx, cy, 1.0, 1.0))
    return np.asarray(rows, dtype=np.float32)


def _to_hwio(w: np.ndarray) -> np.ndarray:
    # torch OIHW (depthwise: (C,1,k,k)) -> lax HWIO ((k,k,1,C) for depthwise).
    return np.transpose(w, (2, 3, 1, 0))


def _conv(x, w, b, stride: int = 1, groups: int = 1):
    import jax.lax as lax

    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return out + b


def _blaze_block(x, p: Dict[str, object], prefix: str, stride: int):
    import jax.lax as lax
    import jax.nn as jnn
    import jax.numpy as jnp

    cin = x.shape[-1]
    h = _conv(x, p[f"{prefix}.convs.0.weight"], p[f"{prefix}.convs.0.bias"],
              stride=stride, groups=cin)
    h = _conv(h, p[f"{prefix}.convs.1.weight"], p[f"{prefix}.convs.1.bias"])
    skip = x
    if stride == 2:
        skip = lax.reduce_window(
            skip, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    pad = h.shape[-1] - skip.shape[-1]
    if pad > 0:
        skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return jnn.relu(h + skip)


def load_params(state_dict: Dict[str, np.ndarray]) -> Dict[str, object]:
    """torch-layout state dict (numpy arrays) -> jnp params in HWIO."""
    import jax.numpy as jnp

    params: Dict[str, object] = {}
    for key, val in state_dict.items():
        arr = np.asarray(val, dtype=np.float32)
        if arr.ndim == 4:
            arr = _to_hwio(arr)
        params[key] = jnp.asarray(arr)
    return params


def blazeface_forward_logits(params: Dict[str, object], x):
    """x: (N, 128, 128, 3) in [-1, 1] -> (raw_boxes (N,896,16), logits (N,896)).

    The pre-sigmoid head outputs — what SSD training losses consume
    (`data/synthface.py` targets, `tools/train_blazeface_synth.py`)."""
    import jax.nn as jnn
    import jax.numpy as jnp

    h = _conv(x, params["backbone1.0.weight"], params["backbone1.0.bias"], stride=2)
    h = jnn.relu(h)
    for idx, _, _, stride in _B1_BLOCKS:
        h = _blaze_block(h, params, f"backbone1.{idx}", stride)
    f16 = h  # (N, 16, 16, 88)
    for idx, _, _, stride in _B2_BLOCKS:
        h = _blaze_block(h, params, f"backbone2.{idx}", stride)
    f8 = h  # (N, 8, 8, 96)

    n = x.shape[0]
    c1 = _conv(f16, params["classifier_8.weight"], params["classifier_8.bias"])
    c2 = _conv(f8, params["classifier_16.weight"], params["classifier_16.bias"])
    r1 = _conv(f16, params["regressor_8.weight"], params["regressor_8.bias"])
    r2 = _conv(f8, params["regressor_16.weight"], params["regressor_16.bias"])

    scores = jnp.concatenate(
        [c1.reshape(n, -1), c2.reshape(n, -1)], axis=1
    )  # (N, 896) — NHWC reshape matches anchor order (row, col, anchor)
    raw_boxes = jnp.concatenate(
        [r1.reshape(n, -1, 16), r2.reshape(n, -1, 16)], axis=1
    )  # (N, 896, 16)
    return raw_boxes, scores


def blazeface_forward(params: Dict[str, object], x):
    """x: (N, 128, 128, 3) in [-1, 1] -> (raw_boxes (N,896,16), scores (N,896)).

    Scores are already sigmoid(clip(logit, ±100)) per MediaPipe's
    tensors-to-detections calculator.
    """
    import jax.nn as jnn
    import jax.numpy as jnp

    raw_boxes, logits = blazeface_forward_logits(params, x)
    return raw_boxes, jnn.sigmoid(jnp.clip(logits, -100.0, 100.0))


def decode_boxes_np(
    raw_boxes: np.ndarray, anchors: np.ndarray, scale: float = 128.0
) -> np.ndarray:
    """MediaPipe anchor decode: raw (…,896,16) -> (…,896,4) boxes as
    (ymin, xmin, ymax, xmax) in normalized [0,1] coordinates.

    x/y/w/h scales are all 128 for the short-range model; anchors have
    w = h = 1 so the division reduces to /128 plus the anchor center.
    """
    x_c = raw_boxes[..., 0] / scale * anchors[:, 2] + anchors[:, 0]
    y_c = raw_boxes[..., 1] / scale * anchors[:, 3] + anchors[:, 1]
    w = raw_boxes[..., 2] / scale * anchors[:, 2]
    h = raw_boxes[..., 3] / scale * anchors[:, 3]
    return np.stack(
        [y_c - h / 2.0, x_c - w / 2.0, y_c + h / 2.0, x_c + w / 2.0], axis=-1
    )


def _iou_np(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    y0 = np.maximum(box[0], boxes[:, 0])
    x0 = np.maximum(box[1], boxes[:, 1])
    y1 = np.minimum(box[2], boxes[:, 2])
    x1 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(y1 - y0, 0, None) * np.clip(x1 - x0, 0, None)
    area = lambda b: np.clip(b[..., 2] - b[..., 0], 0, None) * np.clip(
        b[..., 3] - b[..., 1], 0, None
    )
    union = area(box) + area(boxes) - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def weighted_nms_np(
    boxes: np.ndarray,
    scores: np.ndarray,
    min_score: float = 0.5,
    iou_threshold: float = 0.3,
) -> Optional[Tuple[np.ndarray, float]]:
    """MediaPipe's blending NMS, reduced to the single best detection (the
    reference only consumes ``detections[0]``): take the highest-scoring
    candidate and average the boxes of all candidates overlapping it with
    IoU >= threshold, weighted by their scores.  Returns (box(y0,x0,y1,x1),
    score) or None when nothing clears ``min_score``.
    """
    keep = scores >= min_score
    if not np.any(keep):
        return None
    b, s = boxes[keep], scores[keep]
    top = int(np.argmax(s))
    sel = _iou_np(b[top], b) >= iou_threshold
    sel[top] = True  # a degenerate top box has IoU 0 even with itself
    w = s[sel][:, None]
    blended = (b[sel] * w).sum(axis=0) / w.sum()
    return blended.astype(np.float32), float(s[top])


def random_blazeface_state_dict(seed: int = 0, kernel_size: int = 3) -> Dict[str, np.ndarray]:
    """Correctly-shaped random torch-layout state dict (tests, smoke runs)."""
    rng = np.random.default_rng(seed)
    return {
        k: rng.normal(0.0, 0.05, size=shape).astype(np.float32)
        for k, shape in _spec(kernel_size).items()
    }
