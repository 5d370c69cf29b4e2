"""MXU strided-conv decomposition vs lax.conv (ops/audio_conv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalemotionrecognition_tpu.ops.audio_conv import strided_conv1d_valid


@pytest.mark.parametrize(
    "k,s,cin,cout,t",
    [
        (10, 5, 1, 8, 1003),  # WavLM conv0 geometry
        (3, 2, 8, 16, 501),  # convs 1-4
        (2, 2, 16, 8, 250),  # convs 5-6
        (7, 2, 4, 4, 100),  # k > 2s fallback (tap loop)
        (5, 5, 4, 4, 100),  # k == s (single term)
    ],
)
def test_matches_lax_conv(k, s, cin, cout, t):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, t, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * 0.1)
    mine = strided_conv1d_valid(x, w, s)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(s,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    assert mine.shape == ref.shape
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_channel_mismatch_raises():
    x = jnp.zeros((1, 100, 4))
    w = jnp.zeros((3, 8, 16))
    with pytest.raises(ValueError):
        strided_conv1d_valid(x, w, 2)
