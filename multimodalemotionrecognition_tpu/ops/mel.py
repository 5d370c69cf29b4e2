"""Mel-spectrogram front-end, numerically matching torchaudio.

The reference computes `MelSpectrogram(sr=16k, n_mels=64, win=400, hop=160)`
followed by `AmplitudeToDB()` on the host per-sample inside DataLoader workers
(`src/data/ravdess.py:478-485`).  Here the whole front-end is a jittable,
batchable XLA computation so it fuses into the model forward on TPU.

torchaudio semantics reproduced exactly:
  * Spectrogram: n_fft=400 (torchaudio default), win_length=400, hop=160,
    periodic Hann window, center=True with reflect padding, power=2,
    no normalization, onesided.
  * MelScale: HTK mel, f_min=0, f_max=sr/2, norm=None, triangular banks.
  * AmplitudeToDB(stype="power", top_db=None): 10*log10(clamp(x, 1e-10)).

The DFT is evaluated as a real matmul (frames @ [cos | -sin] basis) rather than
an FFT: for n_fft=400 the two (400, 201) matrices map straight onto the TPU MXU
and XLA fuses window + DFT + |.|^2 + mel-projection into a couple of matmuls.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "mel_filterbank",
    "mel_spectrogram",
    "amplitude_to_db",
    "log_mel_spectrogram",
]


def _hz_to_mel_htk(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def _mel_filterbank_np(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """Triangular mel filterbank, torchaudio `melscale_fbanks` semantics
    (HTK scale, norm=None). Shape [n_freqs, n_mels]."""
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_htk(np.array(f_min))
    m_max = _hz_to_mel_htk(np.array(f_max))
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def mel_filterbank(
    n_freqs: int = 201,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    n_mels: int = 64,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    return jnp.asarray(_mel_filterbank_np(n_freqs, f_min, f_max, n_mels, sample_rate))


@functools.lru_cache(maxsize=None)
def _dft_basis_np(n_fft: int, win_length: int) -> np.ndarray:
    """Real-DFT basis pre-multiplied by the periodic Hann window.

    Returns [win_length, 2 * (n_fft // 2 + 1)]: columns are cos then -sin, so
    `frames @ basis` yields [real | imag] of the onesided DFT of the windowed
    frame.  Window is centered in the n_fft buffer like torch.stft when
    win_length == n_fft (identity here; kept general for smaller windows).
    """
    n_bins = n_fft // 2 + 1
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    # torch.stft centers a shorter window inside the n_fft frame.
    pad_left = (n_fft - win_length) // 2
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # [n_fft, n_bins]
    cos_b = np.cos(ang)
    sin_b = -np.sin(ang)
    full = np.concatenate([cos_b, sin_b], axis=1)  # [n_fft, 2*n_bins]
    # Fold the window into the basis rows it touches.
    w_full = np.zeros(n_fft, dtype=np.float64)
    w_full[pad_left : pad_left + win_length] = window
    full = full * w_full[:, None]
    return full.astype(np.float32)


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Extract overlapping frames along the last axis: [..., T] ->
    [..., num_frames, frame_length]. Static-shape gather (XLA-friendly)."""
    t = x.shape[-1]
    num_frames = 1 + (t - frame_length) // hop
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


def mel_spectrogram(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 400,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 64,
    f_min: float = 0.0,
    f_max: float | None = None,
    power: float = 2.0,
) -> jnp.ndarray:
    """Mel power spectrogram of `wav` [..., T] -> [..., n_mels, frames].

    Matches `torchaudio.transforms.MelSpectrogram` with the reference's
    parameters (`src/data/ravdess.py:478-483`).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    orig_dtype = wav.dtype
    x = wav.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop_length)  # [..., F, n_fft]
    basis = jnp.asarray(_dft_basis_np(n_fft, win_length))  # [n_fft, 2*n_bins]
    spec_ri = jnp.matmul(frames, basis)  # [..., F, 2*n_bins]
    n_bins = n_fft // 2 + 1
    re, im = spec_ri[..., :n_bins], spec_ri[..., n_bins:]
    mag2 = re * re + im * im
    if power != 2.0:
        mag2 = jnp.power(jnp.maximum(mag2, 0.0), power / 2.0)
    fb = mel_filterbank(n_bins, f_min, f_max, n_mels, sample_rate)  # [n_bins, n_mels]
    mel = jnp.matmul(mag2, fb)  # [..., F, n_mels]
    return jnp.swapaxes(mel, -1, -2).astype(orig_dtype)  # [..., n_mels, F]


def amplitude_to_db(
    x: jnp.ndarray,
    stype: str = "power",
    top_db: float | None = None,
    amin: float = 1e-10,
    ref: float = 1.0,
) -> jnp.ndarray:
    """`torchaudio.transforms.AmplitudeToDB` (reference uses defaults:
    power, top_db=None — `src/data/ravdess.py:484`)."""
    multiplier = 10.0 if stype == "power" else 20.0
    db = multiplier * jnp.log10(jnp.maximum(x, amin))
    db = db - multiplier * math.log10(max(amin, ref))
    if top_db is not None:
        # torch clamps relative to the per-tensor max.
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def log_mel_spectrogram(
    wav: jnp.ndarray,
    sample_rate: int = 16000,
    n_fft: int = 400,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 64,
) -> jnp.ndarray:
    """The reference's full audio front-end: MelSpectrogram + AmplitudeToDB.

    [..., T] waveform -> [..., n_mels, frames] log-mel (dB).
    """
    mel = mel_spectrogram(
        wav,
        sample_rate=sample_rate,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        n_mels=n_mels,
    )
    return amplitude_to_db(mel)


def log_mel_spectrogram_np(
    wav,
    sample_rate: int = 16000,
    n_fft: int = 400,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 64,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Pure-numpy twin of `log_mel_spectrogram` for HOST-side preprocessing.

    Identical math (same DFT basis / filterbank constants); exists so serving
    preprocess never dispatches eager ops to an accelerator — on a TPU host
    each eager jnp op is a device RPC, which made the serving path orders of
    magnitude slower than this one matmul.  The on-device version is for
    fusing mel into a jitted model forward.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    x = np.asarray(wav, dtype=np.float32)
    pad = n_fft // 2
    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = x.shape[-1]
    num_frames = 1 + (t - n_fft) // hop_length
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = x[..., idx]
    basis = _dft_basis_np(n_fft, win_length)
    spec_ri = frames @ basis
    n_bins = n_fft // 2 + 1
    re, im = spec_ri[..., :n_bins], spec_ri[..., n_bins:]
    mag2 = re * re + im * im
    fb = _mel_filterbank_np(n_bins, f_min, f_max, n_mels, sample_rate)
    mel = np.swapaxes(mag2 @ fb, -1, -2)
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).astype(np.float32)
