"""Stochastic train-time regularizers with explicit JAX RNG.

Behavioral (not bitwise) equivalents of the reference's torch-RNG augmentations:
  * drop_path        — StochasticDepth (`src/models/fusion.py:11-26`)
  * modality dropout — batch-level modality zeroing (`src/models/fusion.py:29-55`)
  * spec_augment     — SpecAugment masks (`src/models/audio.py:10-52`)
  * mix_noise_snr    — SNR-matched noise curriculum (`src/data/ravdess.py:413-476`)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["drop_path", "modality_dropout_mask", "spec_augment", "mix_noise_snr"]


def drop_path(
    rng: jax.Array, x: jnp.ndarray, drop_prob: float, train: bool
) -> jnp.ndarray:
    """Per-sample stochastic depth on a residual branch.

    Matches reference StochasticDepth (`src/models/fusion.py:18-26`):
    bernoulli(keep) per batch element, scaled by 1/keep, train-only.
    """
    drop_prob = float(min(max(drop_prob, 0.0), 1.0))
    if drop_prob <= 0.0 or not train:
        return x
    keep_prob = 1.0 - drop_prob
    if keep_prob <= 0.0:
        return jnp.zeros_like(x)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep_prob, shape).astype(x.dtype)
    return x * mask / keep_prob


def modality_dropout_mask(
    rng: jax.Array, audio_p: float, video_p: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-level modality dropout gates.

    The reference draws ONE uniform per batch per modality and zeroes the whole
    batch's embedding (`src/models/fusion.py:48-53` — deliberately batch-level,
    not per-sample). Returns scalar {0,1} keep-gates for (audio, video).
    """
    ra, rv = jax.random.split(rng)
    keep_a = (jax.random.uniform(ra) >= audio_p).astype(jnp.float32)
    keep_v = (jax.random.uniform(rv) >= video_p).astype(jnp.float32)
    return keep_a, keep_v


def spec_augment(
    rng: jax.Array,
    x: jnp.ndarray,
    freq_mask_param: int = 20,
    time_mask_param: int = 40,
    num_masks: int = 2,
    p: float = 0.5,
) -> jnp.ndarray:
    """SpecAugment on [..., n_mels, T] (batch-shared masks, zero fill).

    Matches reference semantics (`src/models/audio.py:26-52`): with prob p,
    apply `num_masks` rounds of one freq mask (len ~ U{0..F_param}) and one
    time mask (len ~ U{0..T_param}); masks are shared across the batch.
    """
    n_mels, t = x.shape[-2], x.shape[-1]
    apply_rng, rng = jax.random.split(rng)
    apply = jax.random.uniform(apply_rng) <= p

    mel_ids = jax.lax.broadcasted_iota(jnp.int32, (n_mels, 1), 0)
    time_ids = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)

    mask = jnp.ones((n_mels, t), dtype=x.dtype)
    for _ in range(num_masks):
        rng, rf_len, rf_start, rt_len, rt_start = jax.random.split(rng, 5)
        if freq_mask_param > 0:
            f_len = jax.random.randint(rf_len, (), 0, freq_mask_param + 1)
            f_start = jax.random.randint(
                rf_start, (), 0, jnp.maximum(n_mels - f_len, 1)
            )
            fmask = (mel_ids >= f_start) & (mel_ids < f_start + f_len)
            mask = jnp.where(fmask, jnp.zeros_like(mask), mask)
        if time_mask_param > 0:
            t_len = jax.random.randint(rt_len, (), 0, time_mask_param + 1)
            t_start = jax.random.randint(rt_start, (), 0, jnp.maximum(t - t_len, 1))
            tmask = (time_ids >= t_start) & (time_ids < t_start + t_len)
            mask = jnp.where(tmask, jnp.zeros_like(mask), mask)

    masked = x * mask
    return jnp.where(apply, masked, x)


def mix_noise_snr(
    rng: jax.Array,
    wav: jnp.ndarray,
    noise_bank: jnp.ndarray,
    clean_prob: float = 0.5,
    heavy_prob: float = 0.1,
    light_snrs: Tuple[float, ...] = (20.0, 15.0, 10.0),
    heavy_snr: float = 5.0,
) -> jnp.ndarray:
    """Noise-curriculum mixing for one waveform [T] with a noise bank [N >= T].

    Reference semantics (`src/data/ravdess.py:417-476`): 50% clean; 40% light
    noise at SNR in {20, 15, 10} dB; 10% heavy at 5 dB. Noise segment starts at
    a random offset, is power-scaled so SNR = 10*log10(P_sig/P_noise), mixed in
    the time domain, and the result clamped to [-1, 1].
    """
    t = wav.shape[-1]
    r_level, r_snr, r_start = jax.random.split(rng, 3)
    level = jax.random.uniform(r_level)

    snr_light = jnp.asarray(light_snrs)[
        jax.random.randint(r_snr, (), 0, len(light_snrs))
    ]
    snr_db = jnp.where(level < 1.0 - heavy_prob, snr_light, heavy_snr)

    max_start = max(noise_bank.shape[-1] - t, 0)
    start = jax.random.randint(r_start, (), 0, max_start + 1)
    seg = jax.lax.dynamic_slice_in_dim(noise_bank, start, t, axis=-1)

    power_sig = jnp.mean(wav**2)
    snr_linear = 10.0 ** (snr_db / 10.0)
    power_target = power_sig / jnp.maximum(snr_linear, 1e-8)
    power_seg = jnp.mean(seg**2)
    scale = jnp.sqrt(power_target / jnp.maximum(power_seg, 1e-8))
    scale = jnp.where(power_seg > 1e-8, scale, 0.0)

    noisy = jnp.clip(wav + seg * scale, -1.0, 1.0)
    return jnp.where(level < clean_prob, wav, noisy)
