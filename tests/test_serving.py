"""Serving tests: streaming cadence/windowing, dynamic batcher, and the two
HTTP apps' byte-level contracts (queued worker JSON vs direct percent JSON)."""

import asyncio
import base64
import json

import numpy as np
import pytest

from multimodalemotionrecognition_tpu.config import ServeConfig
from multimodalemotionrecognition_tpu.serving.batcher import (
    DynamicBatcher,
    GatewayError,
    InferenceGateway,
    TaskStore,
)
from multimodalemotionrecognition_tpu.serving.streaming import (
    StreamingEmotionSession,
    decode_frame_b64,
    decode_pcm16_b64,
)

from tests.test_data import _write_wav


class _FakePredictor:
    """Call-recording predictor (reference test style,
    tests/test_backend_services.py:146-178)."""

    def __init__(self):
        self.calls = []

    def predict_stream(self, frames, waveform, waveform_sample_rate, use_face_crop=True):
        self.calls.append((len(frames), waveform.size, waveform_sample_rate))
        return {"labels": ["a"], "probs": [100.0], "top1": {"label": "a", "prob": 100.0}}


class _SpyRunner:
    labels = ["neutral", "calm", "happy", "sad", "angry", "fearful", "disgust", "surprised"]
    use_wavlm = False
    fusion_mode = "xattn"

    def __init__(self):
        self.batch_sizes = []

    def predict_probs(self, videos, audios):
        self.batch_sizes.append(len(videos))
        probs = np.zeros((len(videos), 8))
        probs[:, 2] = 0.7
        probs[:, 0] = 0.3
        return probs


class TestStreamingSession:
    def test_cadence_and_readiness(self):
        pred = _FakePredictor()
        s = StreamingEmotionSession(predictor=pred, waveform_sample_rate=16000)
        frame = np.zeros((10, 10, 3), np.uint8)
        # not ready: no audio
        s.add_frame(frame, timestamp=0.0)
        s.add_frame(frame, timestamp=0.1)
        assert not s.ready_for_inference(now=1.0)
        # 3 s of audio -> ready
        s.add_audio_chunk(np.zeros(48000, np.float32), sample_rate=16000)
        assert s.ready_for_inference(now=1.0)
        s.infer(now=1.0)
        # cadence: 0.5 s hold-off
        assert not s.ready_for_inference(now=1.2)
        assert s.ready_for_inference(now=1.6)

    def test_window_takes_last_3s_audio(self):
        pred = _FakePredictor()
        s = StreamingEmotionSession(predictor=pred, waveform_sample_rate=16000)
        s.add_audio_chunk(np.ones(16000 * 5, np.float32), sample_rate=16000)
        s.add_frame(np.zeros((4, 4, 3), np.uint8), timestamp=10.0)
        frames, wav = s.build_window(now=10.0)
        assert wav.size == 48000

    def test_buffer_pruning(self):
        s = StreamingEmotionSession(predictor=_FakePredictor(), waveform_sample_rate=16000)
        for i in range(10):
            s.add_audio_chunk(np.zeros(16000, np.float32), sample_rate=16000)
        # max buffer 6 s
        assert s.audio_sample_count <= 16000 * 6
        for t in range(10):
            s.add_frame(np.zeros((4, 4, 3), np.uint8), timestamp=float(t))
        assert s.frames[0][0] >= 9 - 6

    def test_result_annotations(self):
        pred = _FakePredictor()
        s = StreamingEmotionSession(predictor=pred, waveform_sample_rate=16000)
        s.add_audio_chunk(np.zeros(48000, np.float32), sample_rate=16000)
        s.add_frame(np.zeros((4, 4, 3), np.uint8), timestamp=0.0)
        out = s.infer(now=1.0)
        assert out["session_id"] == s.session_id
        assert out["window_seconds"] == 3.0
        assert out["num_audio_samples"] == 48000

    def test_audio_window_content_across_chunk_boundaries(self):
        # The last 3 s must be the newest samples in arrival order, regardless
        # of how they were chunked (exercises ring wraparound).
        s = StreamingEmotionSession(predictor=_FakePredictor(), waveform_sample_rate=16000)
        stream = np.arange(16000 * 9, dtype=np.float32)
        for start in range(0, stream.size, 7001):  # odd chunk size -> wraps misaligned
            s.add_audio_chunk(stream[start : start + 7001], sample_rate=16000)
        _, wav = s.build_window(now=100.0)
        np.testing.assert_array_equal(wav, stream[-48000:])

    def test_oversized_single_chunk_keeps_tail(self):
        s = StreamingEmotionSession(predictor=_FakePredictor(), waveform_sample_rate=16000)
        big = np.arange(16000 * 10, dtype=np.float32)  # > 6 s cap in one message
        s.add_audio_chunk(big, sample_rate=16000)
        assert s.audio_sample_count == 16000 * 6
        _, wav = s.build_window(now=0.0)
        np.testing.assert_array_equal(wav, big[-48000:])

    def test_out_of_order_frame_timestamps(self):
        # Client clocks glitch: a frame arriving with an older timestamp
        # must neither corrupt the window selection nor evict in-window
        # frames (frames are kept sorted by timestamp).
        s = StreamingEmotionSession(predictor=_FakePredictor(), waveform_sample_rate=16000)
        for ts in (5.0, 0.5, 6.0, 7.0):
            s.add_frame(np.full((2, 2, 3), int(ts * 10), np.uint8), timestamp=ts)
        assert [t for t, _ in s.frames] == [5.0, 6.0, 7.0]  # 0.5 aged out (7-6 cap)
        frames, _ = s.build_window(now=7.0)
        # window = last 3 s -> ts in [4, 7]
        assert [int(f[0, 0, 0]) for f in frames] == [50, 60, 70]

    def test_sample_rate_change_resets_audio(self):
        s = StreamingEmotionSession(predictor=_FakePredictor(), waveform_sample_rate=16000)
        s.add_audio_chunk(np.zeros(48000, np.float32), sample_rate=16000)
        s.add_audio_chunk(np.ones(8000, np.float32), sample_rate=8000)
        # Old-rate samples are dropped; only the new-rate second remains.
        assert s.waveform_sample_rate == 8000
        assert s.audio_sample_count == 8000


class TestCodecs:
    def test_pcm16_roundtrip(self):
        pcm = (np.sin(np.linspace(0, 10, 100)) * 20000).astype(np.int16)
        out = decode_pcm16_b64(base64.b64encode(pcm.tobytes()).decode())
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)

    def test_frame_b64_with_data_url_prefix(self):
        import cv2

        img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        b64 = "data:image/jpeg;base64," + base64.b64encode(buf.tobytes()).decode()
        out = decode_frame_b64(b64)
        assert out.shape == (16, 16, 3)


def _wav_payload(tmp_path, name="clip.wav", seconds=1):
    p = tmp_path / name
    _write_wav(p, 0.2 * np.sin(np.arange(16000 * seconds) / 10.0), 16000)
    return p.read_bytes()


class TestBatcher:
    def test_batches_concurrent_submissions(self, tmp_path):
        async def scenario():
            cfg = ServeConfig(batch_size=8, batch_timeout_ms=50)
            gateway = InferenceGateway(cfg)
            runner = _SpyRunner()
            batcher = DynamicBatcher(gateway, runner, cfg)
            task = asyncio.create_task(batcher.run())
            payload = _wav_payload(tmp_path)
            ids = await gateway.submit_many([("a.wav", payload), ("b.wav", payload), ("c.wav", payload)])
            results = await asyncio.gather(*(gateway.wait_for_result(i) for i in ids))
            batcher.stop()
            task.cancel()
            return runner.batch_sizes, results

        batch_sizes, results = asyncio.run(scenario())
        assert sum(batch_sizes) == 3
        assert max(batch_sizes) >= 2  # batched together
        for tid, r in zip(range(3), results):
            assert r["top1"]["label"] == "happy"
            assert r["top1"]["prob"] == pytest.approx(0.7)
            assert abs(sum(r["probs"]) - 1.0) < 1e-6  # worker scale: 0..1
            assert "queue_delay_ms" in r and "processed_at" in r
            assert r["worker_name"] == "worker-1"

    def test_failed_task_marks_error(self, tmp_path):
        async def scenario():
            cfg = ServeConfig(batch_size=2, batch_timeout_ms=5)
            gateway = InferenceGateway(cfg)
            runner = _SpyRunner()
            batcher = DynamicBatcher(gateway, runner, cfg)
            task = asyncio.create_task(batcher.run())
            # garbage payload -> preprocess still yields black video + zero
            # audio for wav-suffixed garbage? decode fails -> batch failed
            tid = await gateway.submit("bad.wav", b"not a wav file")
            try:
                await gateway.wait_for_result(tid, timeout_sec=5)
                raise AssertionError("expected failure")
            except GatewayError as e:
                status = e.status_code
            batcher.stop()
            task.cancel()
            return status

        assert asyncio.run(scenario()) == 500

    def test_empty_payload_rejected(self):
        async def scenario():
            gateway = InferenceGateway(ServeConfig())
            try:
                await gateway.submit("x.mp4", b"")
            except GatewayError as e:
                return e.status_code

        assert asyncio.run(scenario()) == 400

    def test_unknown_task_404(self):
        async def scenario():
            gateway = InferenceGateway(ServeConfig())
            try:
                await gateway.get_result("nope")
            except GatewayError as e:
                return e.status_code

        assert asyncio.run(scenario()) == 404


class TestQueuedApp:
    def _client(self, app):
        from aiohttp.test_utils import TestClient, TestServer

        return TestClient(TestServer(app))

    def test_full_api_contract(self, tmp_path):
        from multimodalemotionrecognition_tpu.serving.server_queued import create_app

        async def scenario():
            cfg = ServeConfig(batch_size=4, batch_timeout_ms=10)
            app = create_app(config=cfg, runner=_SpyRunner(), mock=False)
            client = self._client(app)
            await client.start_server()
            try:
                r = await client.get("/health")
                health = await r.json()
                assert r.status == 200

                r = await client.get("/queue/status")
                qs = await r.json()

                payload = _wav_payload(tmp_path)
                import aiohttp

                form = aiohttp.FormData()
                form.add_field("file", payload, filename="clip.wav")
                r = await client.post("/submit", data=form)
                sub = await r.json()
                task_id = sub["task_id"]

                # poll /result
                for _ in range(200):
                    r = await client.get(f"/result/{task_id}")
                    res = await r.json()
                    if res.get("status") == "completed":
                        break
                    await asyncio.sleep(0.02)

                form = aiohttp.FormData()
                form.add_field("file", payload, filename="clip.wav")
                r2 = await client.post("/predict", data=form)
                pred = await r2.json()

                form = aiohttp.FormData()
                form.add_field("files", payload, filename="a.wav")
                form.add_field("files", payload, filename="b.wav")
                r3 = await client.post("/predict_batch", data=form)
                batch = await r3.json()

                r4 = await client.get("/result/doesnotexist")
                missing_status = r4.status
                missing = await r4.json()
                return health, qs, sub, res, pred, batch, missing_status, missing
            finally:
                await client.close()

        health, qs, sub, res, pred, batch, missing_status, missing = asyncio.run(
            scenario()
        )
        # /health contract (reference src/inference_server.py:244-249)
        assert health["status"] == "ok"
        for key in ("streaming_ready", "queue_size", "batch_size", "batch_timeout_ms",
                    "worker_count_hint", "uptime_sec", "redis_url", "queue_key"):
            assert key in health, key
        # /queue/status
        assert qs["queue_key"] == "emo:inference:queue"
        # /submit
        assert sub["status"] == "queued" and sub["task_id"]
        # /result: task hash fields + embedded worker result
        assert res["status"] == "completed"
        assert set(res["result"]) == {
            "task_id", "worker_name", "labels", "probs", "top1",
            "queue_delay_ms", "processed_at",
        }
        # /predict returns the worker result + task_id at top level
        assert pred["top1"]["label"] == "happy"
        assert pred["task_id"]
        assert abs(sum(pred["probs"]) - 1.0) < 1e-6
        # /predict_batch
        assert batch["count"] == 2 and len(batch["results"]) == 2
        # missing task -> FastAPI-style error body
        assert missing_status == 404
        assert missing == {"detail": "Task not found: doesnotexist"}


class TestDirectApp:
    def test_health_root_and_mock_predict(self, tmp_path):
        from multimodalemotionrecognition_tpu.serving.server_direct import create_app

        async def scenario():
            app = create_app(mock=True)
            from aiohttp.test_utils import TestClient, TestServer

            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                r = await client.get("/")
                root = await r.json()
                r = await client.get("/health")
                health = await r.json()

                import aiohttp

                form = aiohttp.FormData()
                form.add_field("file", _wav_payload(tmp_path), filename="u.webm")
                r = await client.post("/predict", data=form)
                pred = await r.json()
                return root, health, pred
            finally:
                await client.close()

        root, health, pred = asyncio.run(scenario())
        assert root["name"] == "Emotion Recognition API"
        for key in ("status", "mock_mode", "device", "is_wsl", "checkpoint_path",
                    "checkpoint_exists", "num_emotions", "emotion_labels"):
            assert key in health, key
        assert health["mock_mode"] is True
        assert health["num_emotions"] == 8
        # Direct backend scale: probabilities x100 (percent)
        assert abs(sum(pred["probs"]) - 100.0) < 1e-6
        assert pred["top1"]["label"] in health["emotion_labels"]

    def test_ws_stream_protocol(self):
        from multimodalemotionrecognition_tpu.serving.server_direct import create_app

        async def scenario():
            import cv2

            app = create_app(mock=True)
            from aiohttp.test_utils import TestClient, TestServer

            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                ws = await client.ws_connect("/ws/stream")
                hello = await ws.receive_json()
                await ws.send_json({"type": "start"})
                ack = await ws.receive_json()

                img = np.zeros((8, 8, 3), np.uint8)
                ok, buf = cv2.imencode(".jpg", img)
                frame_b64 = base64.b64encode(buf.tobytes()).decode()
                await ws.send_json({"type": "frame", "image_b64": frame_b64, "timestamp": 0.0})
                await ws.send_json({"type": "frame", "image_b64": frame_b64, "timestamp": 0.1})

                pcm = np.zeros(48000, np.int16)
                await ws.send_json({
                    "type": "audio",
                    "pcm_b64": base64.b64encode(pcm.tobytes()).decode(),
                    "sample_rate": 16000,
                })
                pred = await ws.receive_json()

                await ws.send_json({"type": "bogus"})
                err = await ws.receive_json()

                await ws.send_json({"type": "stop"})
                stopped = await ws.receive_json()
                await ws.close()
                return hello, ack, pred, err, stopped
            finally:
                await client.close()

        hello, ack, pred, err, stopped = asyncio.run(scenario())
        assert hello["type"] == "session_started" and hello["session_id"]
        assert ack["type"] == "ack"
        assert pred["type"] == "prediction"
        assert "probs" in pred["payload"] and "session_id" in pred["payload"]
        assert err["type"] == "error" and "Unknown message type" in err["detail"]
        assert stopped["type"] == "session_stopped"
