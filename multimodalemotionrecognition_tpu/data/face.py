"""Face detection and cropping.

The reference uses MediaPipe's C++ BlazeFace behind Python bindings
(`src/utils/face_crop.py:40-148`) with crop semantics: detect a pixel bbox on
the FIRST sampled frame only, reuse it for the rest, crop with 30% symmetric
padding clipped to the image (`crop_with_padding`, `:151-184`), and silently
fall back to the full frame when detection fails.

MediaPipe is not available here; this module provides the same contract with
pluggable detectors:

  * `HeuristicFaceDetector` — dependency-free skin-segmentation detector
    (YCrCb chroma gate + largest connected region via box smoothing). Works
    well on RAVDESS-style frontal studio footage; deterministic.
  * `BlazeFaceDetector` — hook for a learned detector: loads weights from an
    `.npz` (anchor-based single-shot detector head) when provided at deploy
    time. Absent weights -> returns None (full-frame fallback), matching the
    reference's silent-fallback behavior.
  * Injected crops — the parity harness can bypass detection entirely by
    passing explicit bboxes (SURVEY.md §7 hard-part #3).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Optional, Protocol, Tuple
from xml.etree.ElementTree import ParseError as ET_ParseError

import numpy as np

__all__ = [
    "FaceDetector",
    "HeuristicFaceDetector",
    "BlazeFaceDetector",
    "BUNDLED_BLAZEFACE_WEIGHTS",
    "crop_with_padding",
    "padded_crop_rect",
    "get_face_detector",
    "set_face_detector",
]

Bbox = Tuple[int, int, int, int]  # x, y, w, h in pixels

# Synthetically pretrained short-range BlazeFace (tools/train_blazeface_synth.py):
# held-out synthetic scenes -> 100% detection, mean IoU 0.92 (heuristic: 0.77).
BUNDLED_BLAZEFACE_WEIGHTS = (
    Path(__file__).resolve().parent.parent / "assets" / "blazeface_synth.npz"
)


class FaceDetector(Protocol):
    def detect_face_bbox(self, image_rgb: np.ndarray) -> Optional[Bbox]: ...


def padded_crop_rect(
    image_hw: Tuple[int, int], bbox: Bbox, pad_ratio: float = 0.3
) -> Optional[Tuple[int, int, int, int]]:
    """(x, y, w, h) of the padded crop, clipped to the image — the rect form
    of `crop_with_padding` for decoders that crop natively (the C++ libav
    path).  None when the rect degenerates (caller keeps the full frame)."""
    h, w = image_hw
    x, y, bw, bh = bbox
    pad_x = int(bw * pad_ratio)
    pad_y = int(bh * pad_ratio)
    x0 = max(0, x - pad_x)
    y0 = max(0, y - pad_y)
    x1 = min(w, x + bw + pad_x)
    y1 = min(h, y + bh + pad_y)
    if x1 <= x0 or y1 <= y0:
        return None
    return (x0, y0, x1 - x0, y1 - y0)


def crop_with_padding(
    image: np.ndarray, bbox: Bbox, pad_ratio: float = 0.3
) -> np.ndarray:
    """Crop bbox with symmetric padding, clipped to the image
    (reference `src/utils/face_crop.py:151-184`)."""
    rect = padded_crop_rect(image.shape[:2], bbox, pad_ratio)
    if rect is None:
        return image
    x0, y0, rw, rh = rect
    return image[y0 : y0 + rh, x0 : x0 + rw]


class HeuristicFaceDetector:
    """Skin-chroma face localizer (no learned weights required).

    Gate pixels by YCrCb chroma (the classic Cr in [133,173], Cb in [77,127]
    skin band), box-blur the mask to suppress speckle, then take the tight
    bounding box of the dominant mass.  Returns None when too little skin is
    visible — callers fall back to the full frame, like the reference does on
    MediaPipe failure (`src/data/ravdess.py:337-339`).
    """

    def __init__(self, min_coverage: float = 0.005, mask_threshold: float = 0.35):
        self.min_coverage = min_coverage
        self.mask_threshold = mask_threshold

    @staticmethod
    def _rgb_to_crcb(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        r = img[..., 0].astype(np.float32)
        g = img[..., 1].astype(np.float32)
        b = img[..., 2].astype(np.float32)
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        return cr, cb

    @staticmethod
    def _box_blur(mask: np.ndarray, k: int = 15) -> np.ndarray:
        # separable box filter via cumulative sums
        pad = k // 2
        padded = np.pad(mask, ((pad, pad + 1), (0, 0)), mode="edge")
        c = np.cumsum(padded, axis=0)
        out = (c[k:] - c[:-k]) / k
        padded = np.pad(out, ((0, 0), (pad, pad + 1)), mode="edge")
        c = np.cumsum(padded, axis=1)
        return (c[:, k:] - c[:, :-k]) / k

    def detect_face_bbox(self, image_rgb: np.ndarray) -> Optional[Bbox]:
        if image_rgb.ndim != 3 or image_rgb.shape[-1] != 3:
            return None
        img = image_rgb
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(
                np.uint8
            )
        cr, cb = self._rgb_to_crcb(img)
        mask = (
            (cr >= 133) & (cr <= 173) & (cb >= 77) & (cb <= 127)
        ).astype(np.float32)
        if mask.mean() < self.min_coverage:
            return None
        smooth = self._box_blur(mask)
        strong = smooth >= self.mask_threshold
        if not strong.any():
            return None
        ys, xs = np.nonzero(strong)
        # Robust bbox: trim 2% tails so stray skin-toned pixels don't inflate it.
        y0, y1 = np.percentile(ys, [2, 98]).astype(int)
        x0, x1 = np.percentile(xs, [2, 98]).astype(int)
        w, h = int(x1 - x0 + 1), int(y1 - y0 + 1)
        if w < 8 or h < 8:
            return None
        return (int(x0), int(y0), w, h)


class BlazeFaceDetector:
    """Learned BlazeFace detector (the reference's MediaPipe
    `FaceDetection(min_detection_confidence=0.5)`, `src/utils/face_crop.py:85-90`).

    Runs the JAX-native short-range BlazeFace (`models/blazeface.py`) when an
    `.npz` weights file — produced by `convert/blazeface_export.py` from the
    public PyTorch port of the official tflite weights — is supplied at deploy
    time (this image has no egress to fetch them).  Without weights, behaves
    as a disabled detector (returns None -> full-frame fallback), matching the
    reference's silent MediaPipe-failure fallback."""

    def __init__(
        self,
        weights_path: Optional[str | Path] = None,
        min_score: float = 0.5,
        iou_threshold: float = 0.3,
    ):
        self._fn = None
        self._anchors = None
        self.min_score = min_score
        self.iou_threshold = iou_threshold
        if weights_path and Path(weights_path).exists():
            self._load(Path(weights_path))

    def _load(self, path: Path) -> None:
        import jax

        from multimodalemotionrecognition_tpu.models import blazeface as bf

        params = bf.load_params(dict(np.load(path)))
        self._anchors = bf.generate_anchors()

        def run(img):
            raw_boxes, scores = bf.blazeface_forward(params, img)
            return raw_boxes[0], scores[0]

        # Pin to the host CPU backend: face detection is per-clip HOST
        # preprocessing, and on a tunneled-TPU host the default backend
        # would pay a ~170 ms RPC per detect.  The CPU backend coexists
        # with the pinned TPU platform.
        try:
            cpu = jax.devices("cpu")[0]
            self._fn = jax.jit(run, device=cpu)
        except RuntimeError:
            self._fn = jax.jit(run)

    def detect_face_bbox(self, image_rgb: np.ndarray) -> Optional[Bbox]:
        if self._fn is None:
            return None
        from multimodalemotionrecognition_tpu.models import blazeface as bf

        if image_rgb.ndim != 3 or image_rgb.shape[-1] != 3:
            return None
        h, w = image_rgb.shape[:2]
        img = image_rgb
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(
                np.uint8
            )
        import cv2

        size = bf.BLAZEFACE_INPUT_SIZE
        resized = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        x = resized.astype(np.float32) / 127.5 - 1.0
        raw_boxes, scores = self._fn(x[None])
        boxes = bf.decode_boxes_np(np.asarray(raw_boxes), self._anchors)
        best = bf.weighted_nms_np(
            boxes, np.asarray(scores), self.min_score, self.iou_threshold
        )
        if best is None:
            return None
        (y0, x0, y1, x1), _score = best
        # Normalized [0,1] -> pixel coords of the ORIGINAL frame (plain
        # resize, so x and y scale independently), clipped like the
        # reference's legacy branch (`face_crop.py:131-136`).
        px0 = max(0, int(round(x0 * w)))
        py0 = max(0, int(round(y0 * h)))
        px1 = min(w, int(round(x1 * w)))
        py1 = min(h, int(round(y1 * h)))
        if px1 - px0 < 2 or py1 - py0 < 2:
            return None
        return (px0, py0, px1 - px0, py1 - py0)


class HaarFaceDetector:
    """Haar-cascade frontal-face detector (real OpenCV weights).

    An offline-available detector TRAINED ON REAL FACES (unlike the bundled
    BlazeFace's synthetic pretraining) — useful both as a deployable
    detector (EMO_FACE_DETECTOR=haar) and as the independent third oracle in
    the face-crop parity triangulation (tools/face_crop_parity.py), standing
    in for the reference's MediaPipe detector
    (`src/utils/face_crop.py:40-148`) which needs egress to fetch.

    Runs through cv2.CascadeClassifier when the binding exists; OpenCV 5.x
    removed it from Python, so the default engine is the numpy Viola-Jones
    evaluator (`data/haar.py`) reading the same system XML weights."""

    def __init__(
        self, cascade_path: Optional[str] = None, min_neighbors: int = 3
    ):
        from multimodalemotionrecognition_tpu.data.haar import find_cascade_xml

        self.min_neighbors = min_neighbors
        path = Path(cascade_path) if cascade_path else find_cascade_xml()
        self._cv2_cascade = None
        self._np_cascade = None
        if path is None or not Path(path).exists():
            return
        import cv2

        if hasattr(cv2, "CascadeClassifier"):
            cascade = cv2.CascadeClassifier(str(path))
            if not cascade.empty():
                self._cv2_cascade = cascade
                return
        from multimodalemotionrecognition_tpu.data.haar import HaarCascade

        try:
            self._np_cascade = HaarCascade(path)
        except (ValueError, ET_ParseError):
            self._np_cascade = None

    @property
    def available(self) -> bool:
        return self._cv2_cascade is not None or self._np_cascade is not None

    def detect_face_bbox(self, image_rgb: np.ndarray) -> Optional[Bbox]:
        if not self.available:
            return None
        if image_rgb.ndim != 3 or image_rgb.shape[-1] != 3:
            return None
        img = image_rgb
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(
                np.uint8
            )
        # ITU-R BT.601 luma, matching cv2.COLOR_RGB2GRAY.
        gray = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).astype(np.uint8)
        if self._cv2_cascade is not None:
            faces = self._cv2_cascade.detectMultiScale(
                gray, scaleFactor=1.1, minNeighbors=self.min_neighbors,
                minSize=(24, 24),
            )
            faces = [tuple(int(v) for v in f) for f in faces]
        else:
            faces = self._np_cascade.detect_multi_scale(
                gray, scale_factor=1.1, min_neighbors=self.min_neighbors,
                min_size=24,
            )
        if not len(faces):
            return None
        # Largest face, like the reference's top detection.
        x, y, w, h = max(faces, key=lambda f: f[2] * f[3])
        return (int(x), int(y), int(w), int(h))


_detector_lock = threading.Lock()
_detector: Optional[FaceDetector] = None
_detector_initialized = False


def get_face_detector() -> Optional[FaceDetector]:
    """Process-wide detector singleton (reference `src/utils/face_crop.py:187-200`
    has the same benign-race singleton; here it is lock-guarded).

    `EMO_BLAZEFACE_WEIGHTS=<path.npz>` selects the learned detector at deploy
    time; the special value ``bundled`` selects the checked-in synthetically
    pretrained weights (`tools/train_blazeface_synth.py`). Otherwise the
    dependency-free heuristic is used — it is validated on real skin chroma,
    while the bundled net has only synthetic-scene validation.
    `EMO_FACE_DETECTOR={heuristic,haar,blazeface}` forces a family
    explicitly (haar = OpenCV's real-face-trained frontal cascade)."""
    global _detector, _detector_initialized
    with _detector_lock:
        if not _detector_initialized:
            import os

            family = os.environ.get("EMO_FACE_DETECTOR", "")
            weights = os.environ.get("EMO_BLAZEFACE_WEIGHTS", "")
            if weights == "bundled" or family == "blazeface" and not weights:
                weights = str(BUNDLED_BLAZEFACE_WEIGHTS)
            if family == "haar":
                haar = HaarFaceDetector()
                _detector = haar if haar.available else HeuristicFaceDetector()
            elif family == "heuristic":
                _detector = HeuristicFaceDetector()
            elif weights and Path(weights).exists():
                _detector = BlazeFaceDetector(weights)
            else:
                _detector = HeuristicFaceDetector()
            _detector_initialized = True
        return _detector


def set_face_detector(detector: Optional[FaceDetector]) -> None:
    global _detector, _detector_initialized
    with _detector_lock:
        _detector = detector
        _detector_initialized = True
