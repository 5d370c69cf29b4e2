#!/usr/bin/env python
"""Thin wrapper: torch BlazeFace state dict -> .npz for data/face.py.

See multimodalemotionrecognition_tpu/convert/blazeface_export.py.
"""
from multimodalemotionrecognition_tpu.convert.blazeface_export import main

if __name__ == "__main__":
    main()
