"""Fused kernels in the TRAIN step.

The attention sublayer kernel (ops/pallas_wavlm_attn.py) carries a custom
VJP, so every encoder layer runs fused during training — trainable layers
differentiate through the backward kernel, frozen layers are
stop-gradient'd end-to-end by the trainer's static AD scope and never
request it.  The conv chain (ops/pallas_conv_fe.py) has no VJP and fuses
only while frozen in every stage of the run.  The attention kernel applies
the modular sublayer's two dropout sites in-kernel via a stateless hash RNG
(bit-identical between Mosaic and the CPU interpreter).  These tests cover
the hash RNG, the kernel's dropout semantics, the model-level gating
(WavLMConfig.fused_train_layers / fused_train_conv), the freeze-policy
derivation, and full trainer steps against the modular path (frozen-prefix
regime AND everything-trainable regime)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from multimodalemotionrecognition_tpu.config import ModelConfig, TrainConfig
from multimodalemotionrecognition_tpu.models.wavlm import WavLMConfig, WavLMModel
from multimodalemotionrecognition_tpu.ops.pallas_wavlm_attn import (
    _hash_keep,
    wavlm_fused_attention_sublayer,
)
from multimodalemotionrecognition_tpu.train.freeze import wavlm_frozen_prefix
from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

SMALL = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_stride=(5, 2, 2),
    conv_kernel=(10, 3, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)
NO_DROPOUT = dict(
    attention_dropout=0.0,
    hidden_dropout=0.0,
    activation_dropout=0.0,
    feat_proj_dropout=0.0,
    apply_spec_augment=False,
)


def _small_wav(seed=2, b=2, t=4000):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1)


class TestHashRng:
    def test_keep_fraction_matches_rate(self):
        for p in (0.1, 0.3, 0.5):
            keep = _hash_keep(jnp.uint32(12345), (256, 256), int(p * 2**32))
            frac = float(np.asarray(keep).mean())
            assert abs(frac - (1.0 - p)) < 0.01, (p, frac)

    def test_deterministic_and_decorrelated(self):
        a = np.asarray(_hash_keep(jnp.uint32(7), (128, 128), int(0.5 * 2**32)))
        b = np.asarray(_hash_keep(jnp.uint32(7), (128, 128), int(0.5 * 2**32)))
        c = np.asarray(_hash_keep(jnp.uint32(8), (128, 128), int(0.5 * 2**32)))
        assert (a == b).all()
        # independent masks disagree on ~2*p*(1-p) = 50% of elements
        disagree = float((a != c).mean())
        assert 0.45 < disagree < 0.55, disagree


class TestKernelDropout:
    def _inputs(self, b=2, h=4, tp=16, dh=8):
        rng = np.random.RandomState(0)
        e = h * dh
        return (
            jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.5),
            jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3),
            jnp.asarray(rng.randn(b, tp, e).astype(np.float32) * 0.3),
            jnp.asarray(1.0 + rng.rand(b, h * tp, 1).astype(np.float32)),
            jnp.asarray(rng.randn(h * tp, tp).astype(np.float32)),
            jnp.asarray(rng.randn(e, e).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(1, e).astype(np.float32) * 0.1),
            jnp.asarray(1.0 + 0.1 * rng.randn(1, e).astype(np.float32)),
            jnp.asarray(0.1 * rng.randn(1, e).astype(np.float32)),
        )

    def test_zero_rates_match_no_dropout_path(self):
        args = self._inputs()
        base = wavlm_fused_attention_sublayer(
            *args, num_heads=4, seq_len=16, interpret=True
        )
        zeroed = wavlm_fused_attention_sublayer(
            *args, num_heads=4, seq_len=16, attn_dropout=0.0,
            hidden_dropout=0.0, dropout_seed=jnp.asarray([3], jnp.int32),
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(base), np.asarray(zeroed))

    def test_dropout_changes_output_per_seed(self):
        args = self._inputs()
        outs = [
            np.asarray(
                wavlm_fused_attention_sublayer(
                    *args, num_heads=4, seq_len=16, attn_dropout=0.1,
                    hidden_dropout=0.1,
                    dropout_seed=jnp.asarray([s], jnp.int32), interpret=True,
                )
            )
            for s in (1, 1, 2)
        ]
        np.testing.assert_array_equal(outs[0], outs[1])  # same seed
        assert np.abs(outs[0] - outs[2]).max() > 1e-3  # different seed

    def test_requires_seed_when_rates_positive(self):
        args = self._inputs()
        with pytest.raises(ValueError, match="dropout_seed"):
            wavlm_fused_attention_sublayer(
                *args, num_heads=4, seq_len=16, attn_dropout=0.1,
                interpret=True,
            )


class TestModelTrainPrefix:
    def _variables(self, wav):
        cfg = WavLMConfig(**SMALL, fused_attention=False, fused_conv=False)
        return WavLMModel(config=cfg).init(jax.random.PRNGKey(0), wav[:1])

    def test_prefix_matches_modular_when_dropout_off(self):
        wav = _small_wav()
        variables = self._variables(wav)
        cfg_mod = WavLMConfig(
            **SMALL, **NO_DROPOUT, fused_attention=False, fused_conv=False
        )
        rngs = {"dropout": jax.random.PRNGKey(1)}
        want = WavLMModel(config=cfg_mod).apply(
            variables, wav, train=True, rngs=rngs
        )
        for n_prefix in (1, 2):
            cfg = WavLMConfig(
                **SMALL, **NO_DROPOUT, fused_attention="interpret",
                fused_conv="interpret", fused_train_layers=n_prefix,
                fused_train_conv=True,
            )
            got = WavLMModel(config=cfg).apply(
                variables, wav, train=True, rngs=rngs
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5,
                err_msg=f"prefix={n_prefix}",
            )

    def test_prefix_dropout_is_stochastic_and_seed_deterministic(self):
        wav = _small_wav()
        variables = self._variables(wav)
        cfg = WavLMConfig(
            **SMALL, fused_attention="interpret", fused_conv="interpret",
            fused_train_layers=2, fused_train_conv=True,
            apply_spec_augment=False,
        )
        m = WavLMModel(config=cfg)
        o1 = m.apply(variables, wav, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = m.apply(variables, wav, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        o3 = m.apply(variables, wav, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-3
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o3))
        # eval stays deterministic and dropout-free
        e1 = m.apply(variables, wav)
        e2 = m.apply(variables, wav)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_grads_flow_through_modular_suffix(self):
        """Fused frozen prefix (layer 0) + trainable modular suffix (layer 1):
        grad works without a kernel VJP and is nonzero on the suffix."""
        wav = _small_wav()
        variables = self._variables(wav)
        flat = flatten_dict(variables["params"])
        cfg = WavLMConfig(
            **SMALL, fused_attention="interpret", fused_conv="interpret",
            fused_train_layers=1, fused_train_conv=True,
            apply_spec_augment=False,
        )

        def loss(p_train):
            from flax.traverse_util import unflatten_dict

            merged = {}
            for k, v in flat.items():
                key = ".".join(map(str, k))
                merged[k] = (
                    p_train[key]
                    if key.startswith("encoder.layers.1.")
                    else jax.lax.stop_gradient(v)
                )
            params = unflatten_dict(merged)
            out = WavLMModel(config=cfg).apply(
                {"params": params}, wav, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out**2)

        p_train = {
            ".".join(map(str, k)): v
            for k, v in flat.items()
            if ".".join(map(str, k)).startswith("encoder.layers.1.")
        }
        grads = jax.grad(loss)(p_train)
        assert max(float(jnp.abs(g).max()) for g in grads.values()) > 0.0


class TestFrozenPrefixPolicy:
    def test_two_stage_fusion(self):
        mc = ModelConfig(fusion="xattn", use_wavlm=True)
        tc = TrainConfig(two_stage_training=True, fusion_unfreeze_wavlm_layers=2)
        assert wavlm_frozen_prefix(mc, tc) == (10, True)

    def test_single_stage_fusion_trains_everything(self):
        mc = ModelConfig(fusion="xattn", use_wavlm=True)
        tc = TrainConfig(two_stage_training=False)
        assert wavlm_frozen_prefix(mc, tc) == (0, False)

    def test_single_modality_stages(self):
        mc = ModelConfig(fusion="audio", use_wavlm=True)
        assert wavlm_frozen_prefix(mc, TrainConfig(wavlm_stage=1)) == (12, True)
        assert wavlm_frozen_prefix(mc, TrainConfig(wavlm_stage=2)) == (10, True)

    def test_small_geometry_clips_to_num_layers(self):
        mc = ModelConfig(
            fusion="audio", use_wavlm=True,
            wavlm_geometry=dict(num_hidden_layers=2),
        )
        # absolute-index rule (reference hardcodes 12): layers 0..1 < 10 stay
        # frozen even in stage 2, so the whole 2-layer stack is prefix.
        assert wavlm_frozen_prefix(mc, TrainConfig(wavlm_stage=2)) == (2, True)

    def test_non_wavlm(self):
        mc = ModelConfig(fusion="xattn", use_wavlm=False)
        assert wavlm_frozen_prefix(mc, TrainConfig(two_stage_training=True)) == (
            0,
            False,
        )

    def test_trainer_auto_wires_prefix(self):
        mc = ModelConfig(
            fusion="audio", use_wavlm=True, spec_augment=False,
            wavlm_geometry=dict(SMALL),
        )
        trainer = EmotionTrainer(mc, TrainConfig(wavlm_stage=1))
        assert trainer.mc.wavlm_fused_train_layers == 2
        assert trainer.mc.wavlm_fused_train_conv is True
        # checkpoint config stays free of training-run fields
        assert "wavlm_fused_train_layers" not in trainer.mc.to_checkpoint_dict()

    def test_trainer_fuses_all_layers_even_when_trainable(self):
        """The attention kernel has a custom VJP, so the trainer fuses every
        encoder layer regardless of the freeze policy; only the conv chain
        (no VJP) stays gated on it."""
        mc = ModelConfig(
            fusion="xattn", use_wavlm=True, spec_augment=False,
            wavlm_geometry=dict(SMALL),
        )
        trainer = EmotionTrainer(mc, TrainConfig(two_stage_training=False))
        assert trainer.mc.wavlm_fused_train_layers == 2  # all layers
        assert trainer.mc.wavlm_fused_train_conv is False  # conv trainable


class TestTrainerStepWithFusedPrefix:
    """Full jitted train step: fused frozen prefix (interpret kernels) must
    reproduce the modular step exactly (dropout rates zeroed so both paths
    are deterministic and consume identical rng streams)."""

    def test_step_matches_modular(self):
        geometry = dict(SMALL, **NO_DROPOUT)
        tc = TrainConfig(
            lr=1e-3, wavlm_stage=1, donate_buffers=False, weight_decay=1e-4
        )
        rng = np.random.RandomState(0)
        video = jnp.zeros((4, 2, 3, 32, 32), jnp.float32)
        audio = jnp.asarray(rng.randn(4, 1, 48000).astype(np.float32) * 0.05)
        labels = jnp.asarray(rng.randint(0, 4, 4).astype(np.int32))
        valid = jnp.ones(4, bool)

        results = []
        for fused in (False, True):
            geo = dict(
                geometry,
                fused_attention="interpret" if fused else False,
                fused_conv="interpret" if fused else False,
            )
            mc = ModelConfig(
                fusion="audio", use_wavlm=True, num_classes=4,
                spec_augment=False, wavlm_geometry=geo,
            )
            trainer = EmotionTrainer(mc, tc)
            if fused:
                assert trainer.mc.wavlm_fused_train_layers == 2
            state = trainer.init_state()
            from multimodalemotionrecognition_tpu.train.freeze import (
                lr_tree,
                trainable_mask,
            )

            mask = trainable_mask(state.params, trainer.mc, tc, stage=0)
            lrs = lr_tree(state.params, trainer.mc, tc, stage=0, scale={})
            for _ in range(2):
                state, *_ = trainer._train_step(
                    state, video, audio, labels, valid, mask, lrs
                )
            results.append(flatten_dict(jax.device_get(state.params)))
        a, b = results
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-5, err_msg=str(k)
            )


class TestTrainerStepWithTrainableFusedLayers:
    """Single-stage xattn fusion (stage 0: EVERYTHING trainable): the fused
    attention sublayers differentiate through the custom-VJP backward
    kernel.  Two jitted optimizer steps must reproduce the modular path's
    params — this checks dq/dk/dv/dgate/dbias/dwo/dLN grads end-to-end (the
    conv chain stays modular here because it is trainable and has no VJP)."""

    def test_grads_match_modular_with_trainable_fused(self):
        # Gradients are compared directly (NOT params after Adam steps:
        # Adam's g/(sqrt(nu)+eps) normalization amplifies f32
        # accumulation-order noise around zero-gradient coordinates into
        # O(lr) param differences, which says nothing about grad quality).
        geometry = dict(SMALL, **NO_DROPOUT)
        tc = TrainConfig(
            lr=1e-3, two_stage_training=False, donate_buffers=False,
        )
        rng = np.random.RandomState(0)
        video = jnp.asarray(rng.randn(2, 2, 3, 32, 32).astype(np.float32))
        audio = jnp.asarray(rng.randn(2, 1, 12000).astype(np.float32) * 0.05)
        labels = jnp.asarray(rng.randint(0, 4, 2).astype(np.int32))
        valid = jnp.ones(2, bool)

        from multimodalemotionrecognition_tpu.train.trainer import _RNG_STREAMS

        grads_by_mode = []
        for fused in (False, True):
            geo = dict(
                geometry,
                fused_attention="interpret" if fused else False,
                fused_conv=False,
            )
            mc = ModelConfig(
                fusion="xattn", use_wavlm=True, num_classes=4,
                spec_augment=False, wavlm_geometry=geo,
                xattn_attn_dropout=0.0, xattn_stochastic_depth=0.0,
            )
            trainer = EmotionTrainer(mc, tc)
            if fused:
                assert trainer.mc.wavlm_fused_train_layers == 2  # all layers
                assert trainer.mc.wavlm_fused_train_conv is False
            state = trainer.init_state()
            from multimodalemotionrecognition_tpu.train.freeze import (
                trainable_mask,
            )

            mask = trainable_mask(state.params, trainer.mc, tc, stage=0)
            assert all(
                v == 1.0 for v in flatten_dict(mask).values()
            )  # stage 0 fusion: everything trainable -> VJP exercised

            rngs = {
                name: jax.random.PRNGKey(100 + i)
                for i, name in enumerate(_RNG_STREAMS)
            }

            def loss_fn(params, trainer=trainer, state=state, rngs=rngs):
                variables = {
                    "params": params,
                    "batch_stats": state.batch_stats,
                }
                outputs, aux, _ = trainer._apply(
                    variables, video, audio, True, rngs, mutable=True
                )
                total, _, _ = trainer._losses(outputs, aux, labels, valid)
                return total

            grads = jax.jit(jax.grad(loss_fn))(state.params)
            grads_by_mode.append(flatten_dict(jax.device_get(grads)))

        a, b = grads_by_mode
        nonzero_encoder = [
            k for k in a
            if "encoder.layers" in ".".join(map(str, k))
            and np.abs(np.asarray(b[k])).max() > 0
        ]
        assert nonzero_encoder, "fused path produced no encoder grads"
        for k in a:
            ref = np.asarray(a[k])
            got = np.asarray(b[k])
            scale = max(np.abs(ref).max(), 1e-8)
            np.testing.assert_allclose(
                got, ref, atol=max(3e-6, 1e-4 * scale), err_msg=str(k)
            )
