"""WavLM encoder LayerDrop (training-mode parity with HF WavLMEncoder).

The reference's training regime runs `transformers.WavLMModel` with
module.training=True even while frozen (`src/models/wavlm_audio.py:165-183`
only wraps in no_grad), so HF's LayerDrop — skip each encoder layer i>0 for
the whole batch with p=config.layerdrop, one scalar draw per layer — is
active during its training.  models/wavlm.py reproduces it behaviorally
(where-select; layer still computed under XLA's static graph)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalemotionrecognition_tpu.models.wavlm import WavLMConfig, WavLMModel

SMALL = dict(
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_stride=(5, 2, 2),
    conv_kernel=(10, 3, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    # isolate LayerDrop from the other stochastic sites
    hidden_dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    apply_spec_augment=False,
    fused_attention=False,
    fused_conv=False,
)


def _setup(layerdrop):
    cfg = WavLMConfig(**SMALL, layerdrop=layerdrop)
    model = WavLMModel(config=cfg)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 4000).astype(np.float32) * 0.1
    )
    variables = WavLMModel(config=WavLMConfig(**SMALL)).init(
        jax.random.PRNGKey(0), wav
    )
    return model, variables, wav


class TestLayerDrop:
    def test_off_without_stream(self):
        """No "layerdrop" RNG stream -> identical to layerdrop=0 (back-compat
        for every existing train-mode caller that doesn't pass the stream)."""
        model, variables, wav = _setup(layerdrop=0.5)
        base_model, _, _ = _setup(layerdrop=0.0)
        out = model.apply(
            variables, wav, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        ref = base_model.apply(
            variables, wav, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_eval_unaffected(self):
        model, variables, wav = _setup(layerdrop=1.0)
        base_model, _, _ = _setup(layerdrop=0.0)
        rngs = {"layerdrop": jax.random.PRNGKey(1)}
        out = model.apply(variables, wav, train=False, rngs=rngs)
        ref = base_model.apply(variables, wav, train=False, rngs=rngs)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_p1_reduces_to_first_layer(self):
        """layerdrop=1.0 skips every layer i>0: the 3-layer encoder output
        equals a 1-layer encoder run with the same (superset) params."""
        model, variables, wav = _setup(layerdrop=1.0)
        rngs = {
            "dropout": jax.random.PRNGKey(1),
            "layerdrop": jax.random.PRNGKey(2),
        }
        out = model.apply(variables, wav, train=True, rngs=rngs)

        one_layer = WavLMModel(
            config=dataclasses.replace(
                WavLMConfig(**SMALL), num_hidden_layers=1
            )
        )
        ref = one_layer.apply(variables, wav, train=True, rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-6
        )

    def test_p0_runs_all_layers(self):
        model, variables, wav = _setup(layerdrop=0.0)
        full = model.apply(
            variables, wav, train=True,
            rngs={"layerdrop": jax.random.PRNGKey(2)},
        )
        one_layer = WavLMModel(
            config=dataclasses.replace(
                WavLMConfig(**SMALL), num_hidden_layers=1
            )
        )
        ref = one_layer.apply(variables, wav, train=True, rngs={})
        assert not np.allclose(np.asarray(full), np.asarray(ref), atol=1e-3)

    def test_deterministic_per_key_and_varies_across_keys(self):
        model, variables, wav = _setup(layerdrop=0.5)

        def run(seed):
            return np.asarray(
                model.apply(
                    variables, wav, train=True,
                    rngs={"layerdrop": jax.random.PRNGKey(seed)},
                )
            )

        a1, a2 = run(3), run(3)
        np.testing.assert_array_equal(a1, a2)
        outs = [run(s) for s in range(8)]
        distinct = {o.tobytes() for o in outs}
        assert len(distinct) > 1, "p=0.5 never varied across 8 keys"

    def test_trainer_stream_wired(self):
        from multimodalemotionrecognition_tpu.train.trainer import _RNG_STREAMS

        assert "layerdrop" in _RNG_STREAMS
