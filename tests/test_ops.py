"""Unit tests for device-side ops: mel front-end, pooling, stochastic regularizers."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodalemotionrecognition_tpu.ops import (
    adaptive_avg_pool_2d,
    amplitude_to_db,
    drop_path,
    log_mel_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    mix_noise_snr,
    modality_dropout_mask,
    spec_augment,
)


class TestMel:
    def test_output_shape_matches_reference(self):
        # 3 s at 16 kHz with win 400 / hop 160 -> [64, 301]
        # (reference src/data/ravdess.py:478-485, export dummy [1,1,64,301]).
        wav = jnp.asarray(np.random.randn(2, 48000).astype(np.float32))
        mel = log_mel_spectrogram(wav)
        assert mel.shape == (2, 64, 301)

    def test_matmul_dft_matches_fft(self):
        """The MXU-friendly matmul DFT must equal an rfft-based spectrogram."""
        rng = np.random.RandomState(0)
        wav = rng.randn(4800).astype(np.float32)
        mel_mine = mel_spectrogram(jnp.asarray(wav)[None])[0]

        # Independent oracle: numpy rfft with identical conventions.
        n_fft, hop = 400, 160
        window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(400) / 400))
        padded = np.pad(wav, (200, 200), mode="reflect")
        frames = np.stack(
            [
                padded[i * hop : i * hop + n_fft] * window
                for i in range(1 + (len(padded) - n_fft) // hop)
            ]
        )
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [F, 201]
        fb = np.asarray(mel_filterbank())
        mel_ref = (spec @ fb).T  # [64, F]
        np.testing.assert_allclose(np.asarray(mel_mine), mel_ref, rtol=1e-3, atol=1e-4)

    def test_filterbank_properties(self):
        fb = np.asarray(mel_filterbank())
        assert fb.shape == (201, 64)
        assert (fb >= 0).all()
        # Triangles partition mel space: every filter has positive mass.
        assert (fb.sum(axis=0) > 0).all()

    def test_filterbank_matches_transformers_oracle(self):
        """Third-party oracle: HF transformers.audio_utils.mel_filter_bank
        implements torchaudio-compatible HTK triangular banks (norm=None,
        triangles in Hz space) completely independently of this repo.
        Checkpoint parity of AudioCNN/AudioResNet rides on this filterbank
        matching torchaudio `melscale_fbanks` (reference mel front-end
        `src/data/ravdess.py:478-485`)."""
        from transformers.audio_utils import mel_filter_bank

        oracle = mel_filter_bank(
            num_frequency_bins=201,
            num_mel_filters=64,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=16000,
            norm=None,
            mel_scale="htk",
        )
        fb = np.asarray(mel_filterbank(), np.float64)
        np.testing.assert_allclose(fb, oracle, atol=1e-6, rtol=0)

    def test_filterbank_matches_explicit_triangle_oracle(self):
        """Independent transcription of torchaudio melscale_fbanks semantics:
        HTK mel scale m = 2595*log10(1 + f/700), n_mels+2 points equally
        spaced in mel between f_min and f_max, mapped back to Hz, and for
        each filter an explicit per-triangle ramp in Hz space — a different
        code shape (scalar loop) than the vectorized slopes in ops/mel.py,
        so a typo in either is caught."""
        n_freqs, n_mels, sr, f_min, f_max = 201, 64, 16000, 0.0, 8000.0
        freqs = np.linspace(0.0, sr / 2.0, n_freqs)
        mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
        inv = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
        pts = inv(np.linspace(mel(f_min), mel(f_max), n_mels + 2))
        oracle = np.zeros((n_freqs, n_mels))
        for m in range(n_mels):
            lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
            for i, f in enumerate(freqs):
                up = (f - lo) / (ctr - lo)
                down = (hi - f) / (hi - ctr)
                oracle[i, m] = max(0.0, min(up, down))
        fb = np.asarray(mel_filterbank(), np.float64)
        np.testing.assert_allclose(fb, oracle, atol=1e-6, rtol=0)

    def test_amplitude_to_db_matches_torch_formula(self):
        x = np.abs(np.random.RandomState(1).randn(8, 16)).astype(np.float32)
        db = amplitude_to_db(jnp.asarray(x))
        expected = 10.0 * np.log10(np.maximum(x, 1e-10))
        np.testing.assert_allclose(np.asarray(db), expected, rtol=1e-5, atol=1e-5)


class TestAdaptivePool:
    def test_matches_torch_adaptive_avg_pool(self):
        for in_shape, out in [((64, 301), (1, 16)), ((7, 10), (3, 4)), ((5, 5), (5, 5))]:
            x = np.random.RandomState(0).randn(2, 3, *in_shape).astype(np.float32)
            mine = adaptive_avg_pool_2d(jnp.asarray(x), out)
            ref = torch.nn.AdaptiveAvgPool2d(out)(torch.from_numpy(x)).numpy()
            np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-5, atol=1e-6)


class TestStochastic:
    def test_drop_path_eval_is_identity(self):
        x = jnp.ones((4, 3))
        y = drop_path(jax.random.PRNGKey(0), x, 0.5, train=False)
        assert (np.asarray(y) == 1.0).all()

    def test_drop_path_scales_survivors(self):
        x = jnp.ones((512, 2))
        y = np.asarray(drop_path(jax.random.PRNGKey(0), x, 0.5, train=True))
        # Rows are either 0 or 1/keep_prob = 2.
        assert set(np.unique(y)).issubset({0.0, 2.0})
        assert abs(y.mean() - 1.0) < 0.15  # unbiased in expectation

    def test_modality_dropout_rates(self):
        drops_a = drops_v = 0
        n = 400
        for i in range(n):
            ka, kv = modality_dropout_mask(jax.random.PRNGKey(i), 0.2, 0.2)
            drops_a += int(ka == 0)
            drops_v += int(kv == 0)
        assert 0.1 < drops_a / n < 0.3
        assert 0.1 < drops_v / n < 0.3

    def test_spec_augment_masks_and_preserves_shape(self):
        x = jnp.ones((2, 1, 64, 301))
        out = np.asarray(spec_augment(jax.random.PRNGKey(3), x, p=1.0))
        assert out.shape == x.shape
        assert (out == 0).any()  # some mask landed
        # masks are batch-shared: zero pattern identical across batch
        np.testing.assert_array_equal(out[0], out[1])

    def test_spec_augment_skip_probability(self):
        x = jnp.ones((1, 1, 64, 301))
        out = np.asarray(spec_augment(jax.random.PRNGKey(0), x, p=0.0))
        np.testing.assert_array_equal(out, np.asarray(x))

    def test_mix_noise_snr_power_ratio(self):
        rng = np.random.RandomState(0)
        wav = jnp.asarray(0.1 * rng.randn(48000).astype(np.float32))
        noise = jnp.asarray(rng.randn(96000).astype(np.float32))
        # Force the noisy branch by sampling keys until level >= 0.5 is chosen;
        # just statistically check the mixture differs and is clamped.
        changed = 0
        for i in range(20):
            out = np.asarray(mix_noise_snr(jax.random.PRNGKey(i), wav, noise))
            assert out.min() >= -1.0 and out.max() <= 1.0
            if not np.allclose(out, np.asarray(wav)):
                changed += 1
        assert 4 <= changed <= 16  # ~50% clean probability


class TestNumpyMelTwin:
    def test_numpy_mel_matches_jax_mel(self):
        from multimodalemotionrecognition_tpu.ops.mel import (
            log_mel_spectrogram,
            log_mel_spectrogram_np,
        )

        wav = np.random.RandomState(3).randn(2, 48000).astype(np.float32) * 0.1
        a = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
        b = log_mel_spectrogram_np(wav)
        assert b.shape == (2, 64, 301)
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)


class TestGeluErf:
    """Rational-erf exact GELU (`ops/activations.py`) — value + custom-JVP grad."""

    def test_value_matches_exact_gelu(self):
        from multimodalemotionrecognition_tpu.ops.activations import gelu_erf

        x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
        got = gelu_erf(x)
        want = jax.nn.gelu(x, approximate=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_custom_jvp_grad_matches_analytic(self):
        from multimodalemotionrecognition_tpu.ops.activations import gelu_erf

        x = jnp.linspace(-5.0, 5.0, 1025, dtype=jnp.float32)
        got = jax.vmap(jax.grad(gelu_erf))(x)
        want = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_grad_finite_at_zero_and_bf16_roundtrip(self):
        from multimodalemotionrecognition_tpu.ops.activations import gelu_erf

        g0 = jax.grad(gelu_erf)(jnp.float32(0.0))
        assert np.isfinite(float(g0)) and abs(float(g0) - 0.5) < 1e-6
        xb = jnp.linspace(-3, 3, 257, dtype=jnp.bfloat16)
        out = gelu_erf(xb)
        assert out.dtype == jnp.bfloat16
