"""Direct in-process inference API (reference `backend/app/main.py:25-180`).

Endpoints: GET /, GET /health, POST /predict, WS /ws/stream — same JSON
contracts (probabilities x100 percent, rich health payload, mock fallback on
init failure).

Run: python -m multimodalemotionrecognition_tpu.serving.server_direct \
       [--checkpoint checkpoints/best.pt] [--mock] [--port 8000]
"""

from __future__ import annotations

import argparse
import os
import tempfile
from pathlib import Path
from typing import Optional

import jax
from aiohttp import web

from multimodalemotionrecognition_tpu.config import ServeConfig
from multimodalemotionrecognition_tpu.serving.batcher import GatewayError
from multimodalemotionrecognition_tpu.serving.http import (
    cors_middleware,
    handle_ws_stream,
    json_response,
)
from multimodalemotionrecognition_tpu.serving.predictor import EmotionPredictor
from multimodalemotionrecognition_tpu.serving.streaming import StreamingSessionManager

__all__ = ["create_app", "main"]


def create_app(
    config: Optional[ServeConfig] = None,
    mock: bool = False,
    checkpoint: Optional[str] = None,
    num_classes: int = 8,
) -> web.Application:
    config = config or ServeConfig.from_env()
    ckpt = checkpoint or config.checkpoint_path
    try:
        predictor = EmotionPredictor(
            mock_mode=mock or config.mock,
            checkpoint_path=ckpt,
            num_classes=num_classes,
            config=config,
        )
    except Exception as e:  # reference falls back to mock on ANY init error
        print(f"[ERROR] Failed to initialize predictor: {e}")
        predictor = EmotionPredictor(mock_mode=True, num_classes=num_classes)
    if predictor.runner is not None:
        # Pre-compile the single-clip executable so the first upload doesn't
        # pay the XLA compile (reference loads the model at startup,
        # `backend/app/main.py:129-136`; the direct backend serves one clip
        # per request so bucket 1 is the hot executable).
        try:
            predictor.runner.warmup(buckets=(1,))
        except Exception as exc:
            print(f"[WARNING] Runner warmup failed (will compile lazily): {exc}")
    streaming = StreamingSessionManager(predictor)

    app = web.Application(middlewares=[cors_middleware], client_max_size=256 * 2**20)
    app["predictor"] = predictor
    app["streaming"] = streaming

    async def root(request):
        return json_response(
            {
                "name": "Emotion Recognition API",
                "version": "0.1.0",
                "endpoints": {
                    "GET /health": "Health check",
                    "POST /predict": "Predict emotion from video",
                    "WS /ws/stream": "Streaming emotion inference with sliding window",
                },
            }
        )

    async def health(request):
        device = jax.devices()[0].platform
        return json_response(
            {
                "status": "ok",
                "mock_mode": predictor.mock_mode,
                "device": device,
                "is_wsl": False,
                "checkpoint_path": str(ckpt),
                "checkpoint_exists": Path(ckpt).exists(),
                "num_emotions": len(predictor.emotion_labels),
                "emotion_labels": list(predictor.emotion_labels),
            }
        )

    async def predict(request):
        data = await request.post()
        item = data.get("file")
        if item is None:
            raise GatewayError(422, [{"loc": ["body", "file"], "msg": "field required"}])
        fd, temp_path = tempfile.mkstemp(suffix=".webm")
        os.close(fd)
        try:
            with open(temp_path, "wb") as f:
                f.write(item.file.read())
            try:
                return json_response(predictor.predict(temp_path))
            except RuntimeError as e:
                raise GatewayError(500, str(e))
            except Exception as e:
                raise GatewayError(500, f"Inference failed: {str(e)}")
        finally:
            try:
                os.remove(temp_path)
            except Exception:
                pass

    async def ws_stream(request):
        return await handle_ws_stream(request, streaming)

    app.router.add_get("/", root)
    app.router.add_get("/health", health)
    app.router.add_post("/predict", predict)
    app.router.add_get("/ws/stream", ws_stream)
    return app


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--mock", action="store_true")
    args = p.parse_args(argv)
    app = create_app(mock=args.mock, checkpoint=args.checkpoint)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
