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

    def llen(self, key):
        return len(self.lists.get(key, []))

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


def test_redis_gateway_to_worker_roundtrip(fake_redis_module, tmp_path):
    """Full multi-host topology on one fake Redis: RedisGateway (producer,
    reference src/inference_server.py:69-121) submits, RedisWorker (consumer)
    drains and answers — no hand-rolled submit anywhere."""
    import asyncio

    from multimodalemotionrecognition_tpu.serving.redis_transport import (
        RedisGateway,
        RedisWorker,
    )

    cfg = ServeConfig(batch_size=4, batch_timeout_ms=5, poll_interval_ms=1)
    shared = FakeRedis()
    gateway = RedisGateway(cfg, client=shared)
    worker = RedisWorker(_StubRunner(), config=cfg, client=shared)
    assert worker.redis is gateway.redis

    wav_path = tmp_path / "g.wav"
    _write_wav(wav_path, 0.2 * np.sin(np.arange(16000) / 9.0), 16000)
    payload = wav_path.read_bytes()

    async def scenario():
        ids = await gateway.submit_many([(f"g{i}.wav", payload) for i in range(3)])
        # Pre-worker: tasks visible as queued through the gateway itself.
        queued = await gateway.get_result(ids[0])
        assert queued["status"] == "queued"
        assert gateway.queue_stats()["queue_size"] == 3

        # Worker host drains one batch (runs in a thread like a real worker).
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(
            None, lambda: worker._process_batch(worker._pop_batch())
        )

        results = await asyncio.gather(
            *(gateway.wait_for_result(t, timeout_sec=2.0) for t in ids)
        )
        return ids, results

    ids, results = asyncio.run(scenario())
    for task_id, result in zip(ids, results):
        assert result["task_id"] == task_id
        assert result["top1"]["label"] == "angry"
        assert set(result) == {
            "task_id", "worker_name", "labels", "probs", "top1",
            "queue_delay_ms", "processed_at",
        }
        # Payload blob cleared after completion (reference TTL contract).
        assert shared.get(f"{cfg.task_prefix}{task_id}:payload") is None


def test_redis_gateway_error_paths(fake_redis_module):
    import asyncio

    from multimodalemotionrecognition_tpu.serving.batcher import GatewayError
    from multimodalemotionrecognition_tpu.serving.redis_transport import RedisGateway

    cfg = ServeConfig(poll_interval_ms=1)
    gateway = RedisGateway(cfg, client=FakeRedis())

    async def scenario():
        # Empty payload -> 400 (reference rejects empty uploads).
        with pytest.raises(GatewayError) as e:
            await gateway.submit("x.wav", b"")
        assert e.value.status_code == 400
        # Unknown task -> 404.
        with pytest.raises(GatewayError) as e:
            await gateway.get_result("nope")
        assert e.value.status_code == 404
        # Pending task times out -> 202 with task_id (reference :119-120).
        task_id = await gateway.submit("x.wav", b"data")
        with pytest.raises(GatewayError) as e:
            await gateway.wait_for_result(task_id, timeout_sec=0.02)
        assert e.value.status_code == 202
        assert e.value.detail["task_id"] == task_id
        # Failed task -> 500.
        gateway.redis.hset(
            f"{cfg.task_prefix}{task_id}",
            mapping={"status": "failed", "error": "boom"},
        )
        with pytest.raises(GatewayError) as e:
            await gateway.wait_for_result(task_id, timeout_sec=1.0)
        assert e.value.status_code == 500

    asyncio.run(scenario())


def test_server_queued_selects_redis_gateway(fake_redis_module):
    """EMO_REDIS_URL / injected client flips server_queued into gateway mode:
    submits land on Redis, no local batcher is constructed."""
    from multimodalemotionrecognition_tpu.serving.redis_transport import RedisGateway
    from multimodalemotionrecognition_tpu.serving.server_queued import create_app

    cfg = ServeConfig(mock=True)
    shared = FakeRedis()
    app = create_app(config=cfg, redis_client=shared)
    assert isinstance(app["gateway"], RedisGateway)
    assert app["batcher"] is None

    import asyncio

    task_id = asyncio.run(app["gateway"].submit("a.wav", b"payload"))
    assert shared.llen(cfg.queue_name) == 1
    assert shared.get(f"{cfg.task_prefix}{task_id}:payload") == b"payload"
