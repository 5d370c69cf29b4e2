"""RedisWorker tests against an in-memory fake Redis (the reference never
tests its worker at all — SURVEY.md §4 'what is NOT tested')."""

import json
import sys
import time
import types

import numpy as np
import pytest

from multimodalemotionrecognition_tpu.config import ServeConfig

from tests.test_data import _write_wav


class FakeRedis:
    """Just enough of redis-py for RedisWorker: list ops + hashes + strings."""

    def __init__(self):
        self.lists = {}
        self.hashes = {}
        self.strings = {}
        self.ttls = {}

    # --- list ---
    def rpush(self, key, value):
        self.lists.setdefault(key, []).append(
            value.encode() if isinstance(value, str) else value
        )

    def blpop(self, key, timeout=1):
        lst = self.lists.get(key)
        if lst:
            return (key.encode(), lst.pop(0))
        return None

    def lpop(self, key):
        lst = self.lists.get(key)
        return lst.pop(0) if lst else None

    # --- hash/string ---
    def hset(self, key, mapping):
        self.hashes.setdefault(key, {}).update(
            {k.encode() if isinstance(k, str) else k:
             (v.encode() if isinstance(v, str) else str(v).encode())
             for k, v in mapping.items()}
        )

    def hgetall(self, key):
        return dict(self.hashes.get(key, {}))

    def set(self, key, value, ex=None):
        self.strings[key] = value

    def get(self, key):
        return self.strings.get(key)

    def expire(self, key, ttl):
        self.ttls[key] = ttl

    def delete(self, key):
        self.strings.pop(key, None)
        self.hashes.pop(key, None)

    @classmethod
    def from_url(cls, url, decode_responses=False):
        return cls()


class _StubRunner:
    labels = ["neutral", "calm", "happy", "sad", "angry", "fearful", "disgust", "surprised"]
    use_wavlm = False

    def predict_probs(self, videos, audios):
        probs = np.zeros((len(videos), 8))
        probs[:, 4] = 1.0
        return probs


@pytest.fixture()
def fake_redis_module(monkeypatch):
    mod = types.ModuleType("redis")
    mod.Redis = FakeRedis
    monkeypatch.setitem(sys.modules, "redis", mod)
    return mod


def _submit(r: FakeRedis, cfg: ServeConfig, filename: str, payload: bytes) -> str:
    """Reference gateway submit semantics (src/inference_server.py:69-89)."""
    import uuid

    task_id = str(uuid.uuid4())
    r.hset(
        f"{cfg.task_prefix}{task_id}",
        mapping={"status": "queued", "filename": filename, "submitted_at": str(time.time())},
    )
    r.set(f"{cfg.task_prefix}{task_id}:payload", payload)
    r.rpush(cfg.queue_name, task_id)
    return task_id


def test_redis_worker_batch_contract(fake_redis_module, tmp_path):
    from multimodalemotionrecognition_tpu.serving.redis_transport import RedisWorker

    cfg = ServeConfig(batch_size=4, batch_timeout_ms=5)
    worker = RedisWorker(_StubRunner(), config=cfg)
    r: FakeRedis = worker.redis

    wav_path = tmp_path / "c.wav"
    _write_wav(wav_path, 0.2 * np.sin(np.arange(16000) / 9.0), 16000)
    payload = wav_path.read_bytes()

    ids = [_submit(r, cfg, f"c{i}.wav", payload) for i in range(3)]
    batch = worker._pop_batch()
    assert set(batch) == set(ids)
    worker._process_batch(batch)

    for task_id in ids:
        h = {k.decode(): v.decode() for k, v in r.hgetall(f"{cfg.task_prefix}{task_id}").items()}
        assert h["status"] == "completed"
        result = json.loads(h["result"])
        assert result["top1"]["label"] == "angry"
        assert abs(sum(result["probs"]) - 1.0) < 1e-6
        assert set(result) == {
            "task_id", "worker_name", "labels", "probs", "top1",
            "queue_delay_ms", "processed_at",
        }
        # payload deleted after completion (reference contract)
        assert r.get(f"{cfg.task_prefix}{task_id}:payload") is None


def test_redis_worker_missing_payload_fails_task(fake_redis_module):
    from multimodalemotionrecognition_tpu.serving.redis_transport import RedisWorker

    cfg = ServeConfig()
    worker = RedisWorker(_StubRunner(), config=cfg)
    r: FakeRedis = worker.redis
    # task hash without payload (expired)
    r.hset(f"{cfg.task_prefix}ghost", mapping={"status": "queued", "filename": "x.wav",
                                               "submitted_at": str(time.time())})
    worker._process_batch(["ghost"])
    h = {k.decode(): v.decode() for k, v in r.hgetall(f"{cfg.task_prefix}ghost").items()}
    assert h["status"] == "failed"
    assert "expired" in h["error"]
