"""Data layer tests: pairing/splits/labels, media decode (incl. the native
libav decoder), noise curriculum, face crop, and the prefetching pipeline.

Mirrors the reference's fixture strategy (fabricated RAVDESS trees,
`tests/test_data_services.py:28-47`) plus real decode coverage the reference
lacks, using synthetic cv2-written videos and scipy-written WAVs."""

import struct
import wave
from pathlib import Path

import numpy as np
import pytest

from multimodalemotionrecognition_tpu.config import DataConfig, VideoConfig
from multimodalemotionrecognition_tpu.data import (
    build_pairs,
    map_emotion_label,
    parse_ravdess_name,
    split_pairs_by_actor,
    split_pairs_stratified,
)
from multimodalemotionrecognition_tpu.data.face import (
    HeuristicFaceDetector,
    crop_with_padding,
)
from multimodalemotionrecognition_tpu.data.media import (
    load_audio_wav,
    load_video_frames,
    mix_bar_noise,
    resample_waveform,
)


# ---------------------------------------------------------------------------
# metadata layer
# ---------------------------------------------------------------------------


def _touch_tree(root: Path, names):
    for name in names:
        p = root / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.touch()


class TestPairing:
    def test_parse_name(self):
        fields = parse_ravdess_name("02-01-06-01-02-01-12.mp4")
        assert fields == {
            "modality": 2,
            "vocal_channel": 1,
            "emotion": 6,
            "intensity": 1,
            "statement": 2,
            "repetition": 1,
            "actor": 12,
        }
        with pytest.raises(ValueError):
            parse_ravdess_name("not-a-ravdess-file.mp4")

    def test_build_pairs_excludes_unpaired(self, tmp_path):
        _touch_tree(
            tmp_path,
            [
                "Actor_01/02-01-03-01-01-01-01.mp4",  # video, has audio twin
                "Actor_01/03-01-03-01-01-01-01.wav",
                "Actor_01/02-01-04-01-01-01-01.mp4",  # video, no audio twin
                "Actor_02/03-01-05-01-01-01-02.wav",  # audio, no video twin
                "Actor_02/02-02-05-01-01-01-02.mp4",  # wrong vocal channel
                "Actor_02/junk.txt",
            ],
        )
        pairs = build_pairs(tmp_path)
        assert len(pairs) == 1
        assert pairs[0].emotion == 3 and pairs[0].actor == 1

    def test_label_maps(self):
        assert [map_emotion_label(e, 8) for e in range(1, 9)] == list(range(8))
        assert [map_emotion_label(e, 4) for e in range(1, 9)] == [
            0, 0, 1, 2, 2, 2, 2, 3,
        ]
        with pytest.raises(ValueError):
            map_emotion_label(1, 5)

    def test_actor_split(self, tmp_path):
        names = [
            f"Actor_{a:02d}/0{m}-01-03-01-01-01-{a:02d}.{e}"
            for a in range(1, 7)
            for m, e in [(2, "mp4"), (3, "wav")]
        ]
        _touch_tree(tmp_path, names)
        pairs = build_pairs(tmp_path)
        train, val, test = split_pairs_by_actor(pairs, [1, 2, 3], [4], [5, 6])
        assert [p.actor for p in train] == [1, 2, 3]
        assert [p.actor for p in val] == [4]
        assert [p.actor for p in test] == [5, 6]

    def test_stratified_split_deterministic(self, tmp_path):
        names = []
        for a in range(1, 11):
            for emo in range(1, 9):
                names += [
                    f"Actor_{a:02d}/02-01-0{emo}-01-01-01-{a:02d}.mp4",
                    f"Actor_{a:02d}/03-01-0{emo}-01-01-01-{a:02d}.wav",
                ]
        _touch_tree(tmp_path, names)
        pairs = build_pairs(tmp_path)
        t1, v1, s1 = split_pairs_stratified(pairs, seed=42)
        t2, v2, s2 = split_pairs_stratified(pairs, seed=42)
        assert [p.video_path for p in t1] == [p.video_path for p in t2]
        assert len(t1) + len(v1) + len(s1) == len(pairs)
        # ratios hold per emotion: 10 per class -> 7/1/2 with floor sizing
        emotions = {e: sum(1 for p in t1 if p.emotion == e) for e in range(1, 9)}
        assert all(v == 7 for v in emotions.values())


# ---------------------------------------------------------------------------
# audio decode + curriculum
# ---------------------------------------------------------------------------


def _write_wav(path: Path, wav: np.ndarray, sr: int):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        pcm = np.clip(wav * 32767, -32768, 32767).astype("<i2")
        f.writeframes(pcm.tobytes())


class TestAudio:
    def test_load_audio_wav_pads_and_crops(self, tmp_path):
        sr = 16000
        short = tmp_path / "short.wav"
        _write_wav(short, 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr), sr)
        out = load_audio_wav(short)
        assert out.shape == (1, 48000)
        assert np.abs(out[0, :sr]).max() > 0.3
        assert np.abs(out[0, sr:]).max() == 0.0  # zero pad tail

        long = tmp_path / "long.wav"
        _write_wav(long, np.ones(5 * sr) * 0.25, sr)
        out = load_audio_wav(long)
        assert out.shape == (1, 48000)  # head crop

    def test_resample_441_to_16k(self, tmp_path):
        sr = 44100
        t = np.arange(sr) / sr
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        out = resample_waveform(tone.astype(np.float32), sr, 16000)
        assert abs(len(out) - 16000) <= 2
        # dominant frequency preserved
        spec = np.abs(np.fft.rfft(out[:16000]))
        assert abs(np.argmax(spec) - 440) <= 2

    def test_mix_bar_noise_snr(self):
        rng = np.random.RandomState(1)
        wav = (0.1 * np.sin(2 * np.pi * 440 * np.arange(48000) / 16000)).astype(
            np.float32
        )
        noise = rng.randn(96000).astype(np.float32)

        class ForceNoisy:
            """RNG stub driving the 10 dB branch deterministically."""

            def uniform(self, a, b):
                return 0.6  # noisy, light band

            def choice(self, opts):
                return 10.0

            def randint(self, a, b):
                return 0

        out = mix_bar_noise(wav, noise, rng=ForceNoisy())
        resid = out - wav
        snr_db = 10 * np.log10(np.mean(wav**2) / np.mean(resid**2))
        assert 8.5 < snr_db < 11.5  # 10 dB target (clamp adds slight error)

    def test_mix_gaussian_fallback(self):
        wav = (0.1 * np.ones(48000)).astype(np.float32)

        class ForceHeavy:
            def uniform(self, a, b):
                return 0.95  # heavy: 5 dB

            def normal(self, mu, sigma, shape):
                return np.random.RandomState(0).normal(mu, sigma, shape)

        out = mix_bar_noise(wav, None, rng=ForceHeavy())
        assert not np.allclose(out, wav)


# ---------------------------------------------------------------------------
# video decode + face crop
# ---------------------------------------------------------------------------


def _write_video(path: Path, frames_rgb: np.ndarray, fps: int = 10):
    import cv2

    h, w = frames_rgb.shape[1:3]
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert writer.isOpened(), "cv2 VideoWriter failed to open"
    for f in frames_rgb:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


def _synthetic_face_video(n=20, h=120, w=160):
    """Dark background with a skin-tone rectangle 'face' moving slightly."""
    frames = np.zeros((n, h, w, 3), dtype=np.uint8)
    frames[:] = (20, 25, 30)
    for i in range(n):
        y0, x0 = 30 + (i % 3), 50 + (i % 3)
        frames[i, y0 : y0 + 50, x0 : x0 + 40] = (200, 140, 110)  # skin tone
    return frames


class TestVideo:
    def test_load_video_frames_shapes_and_norm(self, tmp_path):
        vid = tmp_path / "02-01-03-01-01-01-01.mp4"
        _write_video(vid, _synthetic_face_video())
        out = load_video_frames(vid, num_frames=8, size=112, use_face_crop=False)
        assert out.shape == (8, 3, 112, 112)
        # ImageNet normalization applied: dark pixels go negative
        assert out.min() < -1.0

    def test_face_crop_changes_pixels(self, tmp_path):
        vid = tmp_path / "02-01-03-01-01-01-01.mp4"
        _write_video(vid, _synthetic_face_video())
        full = load_video_frames(vid, num_frames=4, use_face_crop=False)
        cropped = load_video_frames(vid, num_frames=4, use_face_crop=True)
        assert not np.allclose(full, cropped)
        # cropped view has higher mean (face fills the frame)
        assert cropped.mean() > full.mean()

    def test_injected_bbox(self, tmp_path):
        vid = tmp_path / "02-01-03-01-01-01-01.mp4"
        _write_video(vid, _synthetic_face_video())
        a = load_video_frames(vid, num_frames=2, bbox=(50, 30, 40, 50))
        b = load_video_frames(vid, num_frames=2, bbox=(50, 30, 40, 50))
        np.testing.assert_array_equal(a, b)

    def test_short_video_repeats_last_frame(self, tmp_path):
        vid = tmp_path / "02-01-03-01-01-01-01.mp4"
        _write_video(vid, _synthetic_face_video(n=3))
        out = load_video_frames(vid, num_frames=8, use_face_crop=False)
        np.testing.assert_array_equal(out[3], out[7])


class TestFaceCrop:
    def test_crop_with_padding_math(self):
        img = np.arange(100 * 100 * 3, dtype=np.uint8).reshape(100, 100, 3)
        out = crop_with_padding(img, (40, 40, 20, 20), pad_ratio=0.3)
        # pad = 6 -> rows/cols 34..66
        assert out.shape == (32, 32, 3)
        np.testing.assert_array_equal(out, img[34:66, 34:66])

    def test_crop_clips_to_image(self):
        img = np.zeros((50, 50, 3), dtype=np.uint8)
        out = crop_with_padding(img, (0, 0, 45, 45), pad_ratio=0.3)
        assert out.shape == (50, 50, 3)

    def test_heuristic_detector_finds_skin_patch(self):
        img = np.zeros((120, 160, 3), dtype=np.uint8)
        img[30:80, 50:90] = (200, 140, 110)
        bbox = HeuristicFaceDetector().detect_face_bbox(img)
        assert bbox is not None
        x, y, w, h = bbox
        assert 40 <= x <= 60 and 20 <= y <= 40
        assert 25 <= w <= 55 and 35 <= h <= 65

    def test_heuristic_detector_none_on_blank(self):
        img = np.zeros((120, 160, 3), dtype=np.uint8)
        assert HeuristicFaceDetector().detect_face_bbox(img) is None


class TestHaar:
    """Numpy Viola-Jones evaluator over the system OpenCV cascade weights
    (`data/haar.py`) — the real-face-trained offline oracle in the face-crop
    parity triangulation (cv2 5.x dropped the CascadeClassifier binding)."""

    def _cascade(self):
        from multimodalemotionrecognition_tpu.data.haar import (
            HaarCascade,
            find_cascade_xml,
        )

        path = find_cascade_xml()
        if path is None:
            pytest.skip("no system haarcascade XML")
        return HaarCascade(path)

    def test_cascade_parses(self):
        c = self._cascade()
        assert (c.win_w, c.win_h) == (24, 24)
        assert len(c.stages) >= 20  # frontalface_default has 25 stages
        assert c.rect_xywh.shape[0] > 1000  # ~2900 stump features

    def test_detects_synthetic_faces(self):
        """Deterministic scene sweep: the cascade must fire on a majority of
        synthface scenes with sane IoU vs the ground-truth ellipse box (the
        measured triangulation baseline is rate 0.67 / IoU 0.63,
        benchmarks/face_parity.json)."""
        from multimodalemotionrecognition_tpu.data.face import HaarFaceDetector
        from multimodalemotionrecognition_tpu.data.synthface import make_scene

        det = HaarFaceDetector()
        if not det.available:
            pytest.skip("no cascade available")
        rng = np.random.default_rng(42)
        hits, ious = 0, []
        n = 12
        for _ in range(n):
            img, gt = make_scene(rng, size=192, p_face=1.0)
            if gt is None:
                continue
            bbox = det.detect_face_bbox(img)
            if bbox is None:
                continue
            hits += 1
            x0, y0, w, h = bbox
            gx, gy, gw, gh = gt
            ix0, iy0 = max(x0, gx), max(y0, gy)
            ix1 = min(x0 + w, gx + gw)
            iy1 = min(y0 + h, gy + gh)
            inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
            ious.append(inter / (w * h + gw * gh - inter))
        assert hits >= n // 2, f"cascade fired on only {hits}/{n} scenes"
        assert np.mean(ious) > 0.4

    def test_no_detection_on_flat_image(self):
        from multimodalemotionrecognition_tpu.data.face import HaarFaceDetector

        det = HaarFaceDetector()
        if not det.available:
            pytest.skip("no cascade available")
        img = np.full((160, 160, 3), 128, np.uint8)
        assert det.detect_face_bbox(img) is None

    def test_env_selects_haar(self, monkeypatch):
        import multimodalemotionrecognition_tpu.data.face as face_mod

        monkeypatch.setenv("EMO_FACE_DETECTOR", "haar")
        monkeypatch.setattr(face_mod, "_detector", None)
        monkeypatch.setattr(face_mod, "_detector_initialized", False)
        det = face_mod.get_face_detector()
        # falls back to heuristic only when no cascade XML ships
        from multimodalemotionrecognition_tpu.data.haar import find_cascade_xml

        if find_cascade_xml() is not None:
            assert isinstance(det, face_mod.HaarFaceDetector)
        # restore the module-global for other tests
        monkeypatch.setattr(face_mod, "_detector", None)
        monkeypatch.setattr(face_mod, "_detector_initialized", False)


# ---------------------------------------------------------------------------
# native decoder (libav)
# ---------------------------------------------------------------------------


class TestNativeMedialoader:
    def test_available_and_audio_decode(self, tmp_path):
        from multimodalemotionrecognition_tpu.native import medialoader

        if not medialoader.available():
            pytest.skip("native medialoader not built")
        sr = 22050
        tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
        wav_path = tmp_path / "tone.wav"
        _write_wav(wav_path, tone, sr)
        out, rate = medialoader.decode_audio(str(wav_path), target_rate=16000)
        assert rate == 16000
        assert abs(len(out) - 16000) < 200
        spec = np.abs(np.fft.rfft(out[:16000]))
        assert abs(np.argmax(spec) - 440) <= 2

    def test_video_decode_matches_cv2(self, tmp_path):
        from multimodalemotionrecognition_tpu.native import medialoader

        if not medialoader.available():
            pytest.skip("native medialoader not built")
        vid = tmp_path / "clip.mp4"
        frames = _synthetic_face_video(n=10)
        _write_video(vid, frames)
        out = medialoader.decode_video_frames(str(vid), [0, 4, 9], 160, 120)
        assert out.shape == (3, 120, 160, 3)
        # same codec round trip as cv2 — compare against source colors loosely
        assert abs(int(out[0, 50, 60, 0]) - 200) < 30  # skin-tone red channel

    def test_probe(self, tmp_path):
        from multimodalemotionrecognition_tpu.native import medialoader

        if not medialoader.available():
            pytest.skip("native medialoader not built")
        vid = tmp_path / "clip.mp4"
        _write_video(vid, _synthetic_face_video(n=10), fps=10)
        info = medialoader.probe(str(vid))
        assert info["frames"] == 10
        assert abs(info["fps"] - 10.0) < 0.2


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


class TestPipeline:
    def _make_dataset(self, tmp_path, n_actors=2):
        for a in range(1, n_actors + 1):
            for emo in (3, 5):
                vid = tmp_path / f"Actor_{a:02d}" / f"02-01-0{emo}-01-01-01-{a:02d}.mp4"
                wav = tmp_path / f"Actor_{a:02d}" / f"03-01-0{emo}-01-01-01-{a:02d}.wav"
                vid.parent.mkdir(parents=True, exist_ok=True)
                _write_video(vid, _synthetic_face_video(n=6))
                _write_wav(wav, 0.1 * np.random.RandomState(a).randn(16000), 16000)
        return tmp_path

    def test_batched_loader_shapes_and_padding(self, tmp_path):
        from multimodalemotionrecognition_tpu.data.pipeline import (
            BatchedLoader,
            EmotionSampleLoader,
        )

        root = self._make_dataset(tmp_path)
        pairs = build_pairs(root)
        assert len(pairs) == 4
        cfg = DataConfig(
            data_root=str(root),
            video=VideoConfig(num_frames=4, size=64),
            use_face_crop=False,
            train_augment=False,
        )
        loader = BatchedLoader(
            pairs, EmotionSampleLoader(cfg), batch_size=3, num_threads=2
        )
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert b.video.shape == (3, 4, 3, 64, 64)
            assert b.audio.shape == (3, 1, 48000)
            assert b.labels.dtype == np.int32
        assert batches[0].size == 3 and batches[1].size == 1
        assert not batches[1].valid[1]  # padded tail

    def test_uint8_wire_batches(self, tmp_path):
        """wire="uint8" ships post-blur uint8 pixels + per-sample
        (brightness, sigma); padded tail rows carry the identity (1, 0)."""
        from multimodalemotionrecognition_tpu.data.pipeline import (
            BatchedLoader,
            EmotionSampleLoader,
        )

        root = self._make_dataset(tmp_path)
        pairs = build_pairs(root)
        cfg = DataConfig(
            data_root=str(root),
            video=VideoConfig(num_frames=4, size=64),
            use_face_crop=False,
            train_augment=True,
        )
        loader = BatchedLoader(
            pairs,
            EmotionSampleLoader(cfg, augment=True, wire="uint8"),
            batch_size=3,
            num_threads=2,
        )
        batches = list(loader)
        for b in batches:
            assert b.video.dtype == np.uint8
            assert b.video.shape == (3, 4, 3, 64, 64)
            assert b.aug.shape == (3, 2)
        # augmented rows draw factor in U(0.2, 0.6), sigma in U(0, 5e-4)
        valid_aug = batches[0].aug[batches[0].valid]
        assert ((valid_aug[:, 0] >= 0.2) & (valid_aug[:, 0] <= 0.6)).all()
        assert ((valid_aug[:, 1] >= 0.0) & (valid_aug[:, 1] <= 5e-4)).all()
        # padded tail: identity augment params
        np.testing.assert_array_equal(batches[1].aug[~batches[1].valid][0], [1.0, 0.0])

    def test_uint8_wire_eval_matches_float_wire(self, tmp_path):
        """Without augmentation, u8/255 + normalize on device must equal the
        host-normalized float wire exactly (same f32 ops, same order)."""
        from multimodalemotionrecognition_tpu.data.pipeline import (
            EmotionSampleLoader,
        )

        root = self._make_dataset(tmp_path)
        pairs = build_pairs(root)
        cfg = DataConfig(
            data_root=str(root),
            video=VideoConfig(num_frames=4, size=64),
            use_face_crop=False,
            train_augment=False,
        )
        vf, af, lf, _ = EmotionSampleLoader(cfg, wire="float32")(pairs[0])
        (vu, aug), au, lu, _ = EmotionSampleLoader(cfg, wire="uint8")(pairs[0])
        assert lf == lu
        np.testing.assert_array_equal(af, au)
        np.testing.assert_array_equal(aug, [1.0, 0.0])
        mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
        std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
        replay = (vu.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(replay, vf, atol=1e-6)

    def test_shuffle_is_deterministic_per_epoch(self, tmp_path):
        from multimodalemotionrecognition_tpu.data.pipeline import (
            BatchedLoader,
            EmotionSampleLoader,
        )

        root = self._make_dataset(tmp_path)
        pairs = build_pairs(root)
        cfg = DataConfig(
            data_root=str(root),
            video=VideoConfig(num_frames=2, size=32),
            use_face_crop=False,
        )
        mk = lambda: BatchedLoader(
            pairs, EmotionSampleLoader(cfg), batch_size=4, shuffle=True, seed=7,
            num_threads=2,
        )
        l1, l2 = mk(), mk()
        b1, b2 = next(iter(l1)), next(iter(l2))
        np.testing.assert_array_equal(b1.labels, b2.labels)


class TestNativePipelineIntegration:
    """The native decoder wired INTO load_video_frames + container-with-audio
    serving preprocessing (round-1 gap: cv2-written mp4s carry no audio, so
    the mp4/webm serving path was never validated; ml_encode_av fixes the
    asset problem)."""

    @pytest.fixture()
    def av_clip(self, tmp_path):
        from multimodalemotionrecognition_tpu.native import medialoader

        if not medialoader.available():
            pytest.skip("native medialoader not built")
        frames = _synthetic_face_video(n=30)
        tone = (0.3 * np.sin(2 * np.pi * 440 * np.arange(48000) / 16000)).astype(
            np.float32
        )
        path = tmp_path / "clip_av.mp4"
        medialoader.encode_av(str(path), frames, fps=10.0, audio=tone, sample_rate=16000)
        return path, tone

    def test_native_vs_cv2_load_video_frames(self, av_clip, monkeypatch):
        path, _ = av_clip
        monkeypatch.setenv("EMO_NATIVE_DECODE", "1")
        native = load_video_frames(path, num_frames=8, size=112, use_face_crop=True)
        monkeypatch.setenv("EMO_NATIVE_DECODE", "0")
        cv2_path = load_video_frames(path, num_frames=8, size=112, use_face_crop=True)
        assert native.shape == cv2_path.shape == (8, 3, 112, 112)
        # Same decode + same bbox; only the bilinear resize filter differs
        # (swscale vs cv2).  Normalized units: /std ~ x4.5 per pixel value.
        diff = np.abs(native - cv2_path)
        assert diff.mean() < 0.05, diff.mean()
        assert np.percentile(diff, 99) < 0.6, np.percentile(diff, 99)

    @pytest.mark.parametrize("ext", ["mp4", "webm"])
    def test_container_with_audio_preprocess(self, tmp_path, ext):
        """Full serving preprocessing from an audio-carrying container —
        the reference's actual upload path (browser webm/opus,
        backend/app/preprocess.py:354-383)."""
        from multimodalemotionrecognition_tpu.native import medialoader
        from multimodalemotionrecognition_tpu.serving.preprocess import (
            EmotionPreprocessService,
        )

        if not medialoader.available():
            pytest.skip("native medialoader not built")
        frames = _synthetic_face_video(n=30)
        tone = (0.3 * np.sin(2 * np.pi * 440 * np.arange(48000) / 16000)).astype(
            np.float32
        )
        path = tmp_path / f"upload.{ext}"
        medialoader.encode_av(str(path), frames, fps=10.0, audio=tone, sample_rate=16000)

        svc = EmotionPreprocessService()
        video, audio = svc.preprocess_video_audio(path, use_wavlm=True)
        assert video.shape == (1, 8, 3, 112, 112)
        assert audio.shape == (1, 1, 48000)
        # the 440 Hz tone must survive the codec + extraction round trip
        wav = audio[0, 0]
        spec = np.abs(np.fft.rfft(wav[:16000]))
        assert abs(np.argmax(spec) - 440) <= 3
        # uint8 wire-format path too
        video_u8, audio2 = svc.preprocess_video_audio(
            path, use_wavlm=True, raw_uint8=True
        )
        assert video_u8.dtype == np.uint8
        np.testing.assert_allclose(audio2, audio, atol=1e-6)

    def test_decode_skip_and_band_sws_bit_identical(self, av_clip, monkeypatch):
        """The r3 decode levers must be invisible in the pixels:

        * NONREF skip (EMO_DECODE_SKIP, default on): the decoder drops
          non-reference frames BETWEEN sampled indices; reference frames
          are reconstructed either way, so sampled frames are bit-identical.
          (The pts->index map comes from an exact CFR pre-scan; the earlier
          avg_frame_rate-based map aliased indices one frame off —
          regression-guarded here by full byte equality.)
        * Crop-band-only RGB conversion (EMO_SWS_FULL=1 forces the old
          whole-frame conversion): interior rows of the +-4-row band are
          bit-identical to full-frame conversion.
        """
        from multimodalemotionrecognition_tpu.native import medialoader

        path, _ = av_clip
        info = medialoader.probe_video(str(path))
        idx = np.linspace(0, info["frames"] - 1, 8).astype(int).tolist()
        crop = (30, 20, 60, 70)

        outs = {}
        for name, env in (
            ("legacy", {"EMO_DECODE_SKIP": "0", "EMO_SWS_FULL": "1"}),
            ("skip", {"EMO_DECODE_SKIP": "1", "EMO_SWS_FULL": "1"}),
            ("band", {"EMO_DECODE_SKIP": "0", "EMO_SWS_FULL": "0"}),
            ("both", {"EMO_DECODE_SKIP": "1", "EMO_SWS_FULL": "0"}),
            ("force", {"EMO_DECODE_SKIP": "2", "EMO_SWS_FULL": "0"}),
        ):
            for k, v in env.items():
                monkeypatch.setenv(k, v)
            outs[name] = {
                "full": medialoader.decode_video_frames(
                    str(path), idx, info["width"], info["height"]
                ),
                "crop": medialoader.decode_video_frames(
                    str(path), idx, 112, 112, crop=crop
                ),
            }
        for name in ("skip", "band", "both", "force"):
            for kind in ("full", "crop"):
                np.testing.assert_array_equal(
                    outs[name][kind], outs["legacy"][kind],
                    err_msg=f"{name}/{kind} differs from legacy decode",
                )

    def test_decode_skip_bit_identical_bframes_and_webm(self, tmp_path, monkeypatch):
        """The r5 per-codec gate + B-frame skip must stay pixel-invisible:

        * webm/VP8: EMO_DECODE_SKIP=1 now auto-disables the CFR pre-scan
          (no droppable frames), =2 forces it — all three byte-identical.
        * B-frame-heavy x264 (bframes=8, no b-pyramid -> every B is
          non-reference): skip mode drops them between samples; sampled
          frames decode from reference frames only, so bytes match.
        """
        from multimodalemotionrecognition_tpu.native import medialoader

        if not medialoader.available():
            pytest.skip("native medialoader not built")
        frames = _synthetic_face_video(n=30)
        clips = {}
        clips["webm"] = tmp_path / "clip.webm"
        medialoader.encode_av(str(clips["webm"]), frames, fps=10.0)
        monkeypatch.setenv("EMO_ENCODE_X264OPTS", "bf=8:b_strategy=0:b-pyramid=none:sc_threshold=0")
        clips["mp4b"] = tmp_path / "clip_b.mp4"
        medialoader.encode_av(str(clips["mp4b"]), frames, fps=10.0)
        monkeypatch.delenv("EMO_ENCODE_X264OPTS")

        for kind, path in clips.items():
            info = medialoader.probe_video(str(path))
            idx = np.linspace(0, info["frames"] - 1, 8).astype(int).tolist()
            decoded = {}
            for mode in ("0", "1", "2"):
                monkeypatch.setenv("EMO_DECODE_SKIP", mode)
                decoded[mode] = medialoader.decode_video_frames(
                    str(path), idx, info["width"], info["height"]
                )
            for mode in ("1", "2"):
                np.testing.assert_array_equal(
                    decoded[mode], decoded["0"],
                    err_msg=f"{kind} skip mode {mode} differs from legacy",
                )

    def test_native_injected_bbox_crop(self, av_clip, monkeypatch):
        """Injected bbox (parity hook) must route through the native crop."""
        path, _ = av_clip
        monkeypatch.setenv("EMO_NATIVE_DECODE", "1")
        full = load_video_frames(path, num_frames=4, use_face_crop=False)
        cropped = load_video_frames(path, num_frames=4, bbox=(50, 30, 40, 50))
        assert not np.allclose(full, cropped)
        assert cropped.mean() > full.mean()  # face fills the cropped view
