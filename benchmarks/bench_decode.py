"""Per-clip host decode cost + decode-lever quantification (VERDICT r3 item 4).

Times the FULL serving preprocess path (`EmotionPreprocessService.
preprocess_payload`: temp file -> native libav decode -> face detect ->
crop/resize -> normalize -> audio decode -> mel/waveform) on the same
synthetic 3 s 480x360@30fps clips bench_serving.py uses, across the four
decode-lever combinations:

  legacy : EMO_DECODE_SKIP=0 EMO_SWS_FULL=1  (pre-r3 behavior)
  skip   : NONREF frame skip between sampled indices
  band   : crop-band-only RGB conversion
  both   : production defaults (r3)

The levers are byte-identity-tested (tests/test_data.py::
test_decode_skip_and_band_sws_bit_identical); this bench records what they
BUY, updating the 134 ms/clip round-2 roofline decomposition. Host-only
(no jax import): runs on the single CPU core like production preprocess.

Reference path being matched: /root/reference/backend/app/preprocess.py:354-383.

Usage: python benchmarks/bench_decode.py [--iters 20] [--container mp4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.bench_serving import _make_clip_bytes  # noqa: E402

LEVERS = {
    "legacy": {"EMO_DECODE_SKIP": "0", "EMO_SWS_FULL": "1"},
    "skip": {"EMO_DECODE_SKIP": "1", "EMO_SWS_FULL": "1"},
    "band": {"EMO_DECODE_SKIP": "0", "EMO_SWS_FULL": "0"},
    "both": {"EMO_DECODE_SKIP": "1", "EMO_SWS_FULL": "0"},
    # "2" forces the CFR pre-scan even for codecs the r5 per-codec gate
    # excludes (VP8/VP9) — on webm this re-measures the pre-scan cost the
    # gate recovers; on h264 it is identical to "both".
    "force": {"EMO_DECODE_SKIP": "2", "EMO_SWS_FULL": "0"},
}

# "mp4b" = same synthetic clip re-muxed with a B-frame-heavy x264 config
# (bframes=8, non-adaptive, no b-pyramid -> all B-frames are non-reference
# and droppable), approximating real browser x264 uploads where NONREF skip
# is supposed to pay (VERDICT r4 item 5).
X264_BFRAME_OPTS = "bf=8:b_strategy=0:b-pyramid=none:sc_threshold=0"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--containers",
        default="mp4,webm,mp4b",
        help="comma list of mp4/webm/mp4b (mp4b = B-frame-heavy x264)",
    )
    args = ap.parse_args()

    from multimodalemotionrecognition_tpu.serving.preprocess import (
        EmotionPreprocessService,
    )

    svc = EmotionPreprocessService()
    results: dict = {}
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        for container in args.containers.split(","):
            if container == "mp4b":
                os.environ["EMO_ENCODE_X264OPTS"] = X264_BFRAME_OPTS
                fname, payload = _make_clip_bytes(tmp, "mp4")
                os.environ.pop("EMO_ENCODE_X264OPTS", None)
            else:
                fname, payload = _make_clip_bytes(tmp, container)
            results[container] = {}
            for lever, env in LEVERS.items():
                os.environ.update(env)
                # warm (detector init, caches)
                svc.preprocess_payload(
                    fname, payload, use_face_crop=True, use_wavlm=True
                )
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    svc.preprocess_payload(
                        fname, payload, use_face_crop=True, use_wavlm=True
                    )
                ms = (time.perf_counter() - t0) / args.iters * 1000
                results[container][lever] = round(ms, 1)
                print(f"{container:5s} {lever:6s}: {ms:7.1f} ms/clip")
    for env_k in ("EMO_DECODE_SKIP", "EMO_SWS_FULL"):
        os.environ.pop(env_k, None)

    mp4 = results.get("mp4", {})
    print(
        json.dumps(
            {
                "metric": "host_preprocess_ms_per_clip",
                "value": mp4.get("both"),
                "unit": "ms_per_clip_mp4_levers_on",
                "results": results,
                "lever_saving_ms": (
                    round(mp4["legacy"] - mp4["both"], 1)
                    if {"legacy", "both"} <= mp4.keys()
                    else None
                ),
                "iters": args.iters,
            }
        )
    )


if __name__ == "__main__":
    main()
