"""Unified CLI hub: python -m multimodalemotionrecognition_tpu <command> ...

Commands map onto the reference's entry points:
  train          src/train.py
  eval           src/eval.py
  export         src/export_optimized_model.py  (StableHLO instead of ONNX)
  qa-export      src/export_augmented_examples.py
  serve-direct   backend/app/main.py
  serve-queued   src/inference_server.py (+ worker, fused in-process)
  redis-worker   src/inference_worker.py (multi-host scale-out)
  convert-pretrained  raw torchvision/HF state dict -> branch checkpoint (new)
  make-data      synthetic dataset generator (new)
  build-native   build the C++ libav media decoder (new)
"""

from __future__ import annotations

import sys


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in {"-h", "--help"}:
        print(__doc__)
        return
    command, argv = sys.argv[1], sys.argv[2:]

    if command == "train":
        from multimodalemotionrecognition_tpu.train.cli import main as fn
    elif command == "eval":
        from multimodalemotionrecognition_tpu.train.eval import main as fn
    elif command == "export":
        from multimodalemotionrecognition_tpu.runtime.export import main as fn
    elif command == "qa-export":
        from multimodalemotionrecognition_tpu.data.qa_export import main as fn
    elif command == "serve-direct":
        from multimodalemotionrecognition_tpu.serving.server_direct import main as fn
    elif command == "serve-queued":
        from multimodalemotionrecognition_tpu.serving.server_queued import main as fn
    elif command == "redis-worker":
        from multimodalemotionrecognition_tpu.serving.redis_transport import main as fn

        sys.argv = [sys.argv[0]] + argv
        fn()
        return
    elif command == "convert-pretrained":
        from multimodalemotionrecognition_tpu.convert.pretrained import main as fn
    elif command == "convert":
        # torch .pt checkpoint -> orbax directory (or inspect) and back.
        import argparse

        p = argparse.ArgumentParser(prog="convert")
        p.add_argument("--checkpoint", required=True)
        p.add_argument("--inspect", action="store_true")
        args = p.parse_args(argv)
        from multimodalemotionrecognition_tpu.convert import infer_model_signature
        from multimodalemotionrecognition_tpu.convert.torch_import import (
            load_reference_checkpoint,
        )

        sd, config = load_reference_checkpoint(args.checkpoint)
        print(f"keys: {len(sd)}")
        print(f"config: {config or '(none; signature=' + str(infer_model_signature(sd)) + ')'}")
        return
    elif command == "make-data":
        import runpy

        sys.argv = [sys.argv[0]] + argv
        runpy.run_module(
            "multimodalemotionrecognition_tpu.data.synthetic", run_name="__main__"
        )
        return
    elif command == "build-native":
        from multimodalemotionrecognition_tpu.native.build import build

        build()
        return
    else:
        print(f"Unknown command: {command}\n{__doc__}")
        raise SystemExit(2)
    fn(argv)


if __name__ == "__main__":
    main()
