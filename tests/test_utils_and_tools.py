"""Metrics parity vs sklearn, seeding, QA exporter, synthetic data."""

import numpy as np

from multimodalemotionrecognition_tpu.utils.metrics import (
    accuracy,
    confusion_matrix,
    macro_f1,
)


class TestMetrics:
    def test_macro_f1_matches_sklearn(self):
        from sklearn.metrics import f1_score

        rng = np.random.RandomState(0)
        for _ in range(5):
            y_true = rng.randint(0, 8, 100)
            y_pred = rng.randint(0, 8, 100)
            assert macro_f1(y_pred, y_true) == pytest_approx(
                f1_score(y_true, y_pred, average="macro")
            )
        # degenerate: single class predicted
        y_true = np.array([0, 1, 2, 3])
        y_pred = np.zeros(4, dtype=int)
        assert macro_f1(y_pred, y_true) == pytest_approx(
            f1_score(y_true, y_pred, average="macro")
        )

    def test_accuracy(self):
        assert accuracy([1, 2, 3], [1, 2, 4]) == pytest_approx(2 / 3)
        assert accuracy([], []) == 0.0

    def test_confusion_matrix(self):
        cm = confusion_matrix([0, 1, 1], [0, 1, 0], num_classes=2)
        assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 1


def pytest_approx(x, rel=1e-9):
    import pytest

    return pytest.approx(x, rel=rel, abs=1e-12)


class TestQAExport:
    def test_export_augmented_example(self, tmp_path):
        from multimodalemotionrecognition_tpu.data.qa_export import (
            export_augmented_example,
        )
        from multimodalemotionrecognition_tpu.data.synthetic import (
            generate_synthetic_ravdess,
        )

        root = tmp_path / "data"
        generate_synthetic_ravdess(root, actors=(1,), emotions=(3,), seconds=0.5)
        out = export_augmented_example(str(root), str(tmp_path / "qa"), seed=1)
        assert (out / "meta.json").exists()
        assert (out / "audio_augmented.wav").exists()
        assert len(list(out.glob("frame_*.png"))) == 8

    def test_visual_mode(self, tmp_path):
        from multimodalemotionrecognition_tpu.data.qa_export import (
            export_augmented_example,
        )
        from multimodalemotionrecognition_tpu.data.synthetic import (
            generate_synthetic_ravdess,
        )

        root = tmp_path / "data"
        generate_synthetic_ravdess(root, actors=(1,), emotions=(5,), seconds=0.5)
        out = export_augmented_example(
            str(root), str(tmp_path / "qa_visual"), visual=True
        )
        import json

        meta = json.loads((out / "meta.json").read_text())
        assert meta["visual_mode"] is True


class TestSynthetic:
    def test_signal_strength_knob(self, tmp_path):
        """s=1.0 reproduces the legacy strong-signal corpus byte-for-byte
        (the RNG draw sequence is unchanged); s<1 produces a different,
        harder corpus; out-of-range raises (gate-resolution knob, r5)."""
        import pytest

        from multimodalemotionrecognition_tpu.data.synthetic import (
            generate_synthetic_ravdess,
        )

        def corpus_bytes(root, **kw):
            generate_synthetic_ravdess(
                root, actors=(1,), emotions=(2, 6), seconds=0.5, seed=3,
                strong_signal=True, **kw,
            )
            return {
                p.name: p.read_bytes() for p in sorted(root.rglob("03-*.wav"))
            }

        base = corpus_bytes(tmp_path / "a")
        explicit = corpus_bytes(tmp_path / "b", signal_strength=1.0)
        assert base == explicit
        weak = corpus_bytes(tmp_path / "c", signal_strength=0.4)
        assert set(weak) == set(base)
        assert any(weak[k] != base[k] for k in base)
        with pytest.raises(ValueError, match="signal_strength"):
            generate_synthetic_ravdess(
                tmp_path / "d", strong_signal=True, signal_strength=1.5
            )

    def test_pairs_parse_and_decode(self, tmp_path):
        from multimodalemotionrecognition_tpu.data.media import (
            load_audio_wav,
            load_video_frames,
        )
        from multimodalemotionrecognition_tpu.data.ravdess import build_pairs
        from multimodalemotionrecognition_tpu.data.synthetic import (
            generate_synthetic_ravdess,
        )

        n = generate_synthetic_ravdess(
            tmp_path, actors=(1, 2), emotions=(1, 8), seconds=0.5
        )
        pairs = build_pairs(tmp_path)
        assert len(pairs) == n == 4
        v = load_video_frames(pairs[0].video_path, num_frames=3, use_face_crop=False)
        assert v.shape == (3, 3, 112, 112)
        a = load_audio_wav(pairs[0].audio_path)
        assert a.shape == (1, 48000)
