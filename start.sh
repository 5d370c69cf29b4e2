#!/usr/bin/env bash
# Bring up the full stack (direct API :8000, queued API :8002, frontend :8080).
set -euo pipefail

MODE="${1:-compose}"

if [ "$MODE" = "compose" ]; then
    exec docker compose up --build
fi

# Local (no docker): run both APIs in the background, serve the frontend.
if [ "$MODE" = "local" ]; then
    python -m multimodalemotionrecognition_tpu.native.build || true
    python -m multimodalemotionrecognition_tpu.serving.server_direct --port 8000 &
    python -m multimodalemotionrecognition_tpu.serving.server_queued --port 8002 &
    ( cd frontend && python -m http.server 8080 ) &
    echo "direct API :8000 | queued API :8002 | frontend :8080"
    wait
fi
