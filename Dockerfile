# Serving image: JAX (TPU or CPU) + the framework + native media decoder.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libavformat-dev libavcodec-dev libavutil-dev \
        libswresample-dev libswscale-dev libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# For TPU hosts use: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir jax flax optax orbax-checkpoint einops numpy \
        scipy opencv-python-headless aiohttp websockets

COPY multimodalemotionrecognition_tpu /app/multimodalemotionrecognition_tpu
COPY pyproject.toml /app/

RUN python -m multimodalemotionrecognition_tpu.native.build

ENV PYTHONPATH=/app
EXPOSE 8000

CMD ["python", "-m", "multimodalemotionrecognition_tpu.serving.server_queued", "--port", "8000"]
