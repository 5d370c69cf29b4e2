"""Build the native medialoader shared library.

Usage: python -m multimodalemotionrecognition_tpu.native.build
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def build(verbose: bool = True) -> Path:
    src = HERE / "medialoader.cc"
    out = HERE / "libmedialoader.so"
    cmd = [
        "g++",
        "-O2",
        "-fPIC",
        "-shared",
        "-std=c++17",
        str(src),
        "-o",
        str(out),
        "-lavformat",
        "-lavcodec",
        "-lavutil",
        "-lswresample",
        "-lswscale",
    ]
    if verbose:
        print("[build]", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"[build] wrote {path}")
    sys.exit(0)
