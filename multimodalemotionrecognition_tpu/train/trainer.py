"""Training harness: optax two-stage finetuning under jit over a device mesh.

Functional re-implementation of the reference EmotionTrainer
(`src/train.py:675-1201`) with the same training semantics:

  * torch-Adam-equivalent optimizer (L2 added to grads pre-Adam) with
    per-group learning rates (fusion / audio / video);
  * two-stage fusion training with the stage flip at epoch stage1_epochs+1
    rebuilding optimizer state (`:1071-1082`);
  * per-group cosine LambdaLR with eta_min = 0.1 * base, stepped per epoch,
    optional --cosine_stage2_only (`:736-768,1047-1052`);
  * NLL-on-log-probs for late fusion, CE + label smoothing otherwise
    (`:1030-1033`), plus the optional CLIP alignment aux loss (`:221-225`);
  * branch warm-start from audio/video checkpoints (`:913-947`);
  * best-val-macro-F1 checkpointing to outputs/best_{fusion}.pt in the
    reference's .pt format (`:1138-1144`) and early stopping (`:1145-1150`).

TPU-native differences: one jitted train step for all stages (stage policy
enters as data — float trainable masks and per-leaf LRs), batch sharded over
the mesh "data" axis with replicated params (XLA all-reduces grads over ICI),
BatchNorm stats updated per-step under `mutable`, and buffer donation on the
step.  Adds what the reference lacks: full resume checkpoints (orbax) and a
JSONL metrics log with reference-named keys (W&B optional).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
import optax
from flax import struct

from multimodalemotionrecognition_tpu.config import DataConfig, ModelConfig, TrainConfig
from multimodalemotionrecognition_tpu.models.factory import build_model
from multimodalemotionrecognition_tpu.parallel.mesh import make_mesh, shard_batch
from multimodalemotionrecognition_tpu.train.freeze import (
    cosine_factor,
    lr_tree,
    trainable_mask,
)
from multimodalemotionrecognition_tpu.utils.metrics import accuracy, macro_f1
from multimodalemotionrecognition_tpu.utils.seed import set_seed

__all__ = ["TrainState", "EmotionTrainer"]

_RNG_STREAMS = (
    "dropout", "droppath", "modality", "specaugment", "wavlm_mask",
    "layerdrop", "videoaug",
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def _smoothed_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float
) -> jnp.ndarray:
    """torch CrossEntropyLoss(label_smoothing=s) per-sample losses."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    targets = onehot * (1.0 - smoothing) + smoothing / num_classes
    return -jnp.sum(targets * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def _nll_on_probs(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Late fusion: NLLLoss over log(p + 1e-8) (reference `:212-214`)."""
    log_probs = jnp.log(probs + 1e-8)
    return -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]


# Single source of truth for Adam hyperparameters — both optimizer layouts
# (per-leaf optax and the flat concatenated path) read these, so they cannot
# silently desynchronize.  Values match torch.optim.Adam defaults used by the
# reference (`src/train.py:855-872`).
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def masked_adam_update(
    opt_state: optax.ScaleByAdamState,
    params,
    grads,
    mask,
    lrs,
    reset_opt,
    weight_decay: float,
    *,
    flat: bool,
):
    """Masked Adam + L2 weight-decay update over one (sub-)tree.

    torch Adam semantics (reference `src/train.py:227-228` + param groups):
    L2 decay is added to grads pre-Adam, only on trainable params (`mask`
    is a per-leaf 0/1 scalar tree); frozen params get exactly zero update.
    `reset_opt` (0.0/1.0 traced data) first multiplies (count, mu, nu) by
    (1 - reset_opt) — numerically identical to a fresh scale_by_adam init,
    which keeps the reference's stage-flip optimizer rebuild (`:1080`)
    inside ONE compiled executable.

    Two layouts computing the same scalar ops in the same order:

    * ``flat=False`` — optax.scale_by_adam per leaf.
    * ``flat=True`` — all leaves concatenated into one f32 buffer so XLA
      emits a handful of large fused kernels instead of O(100 leaves) tiny
      ones (see TrainConfig.flat_optimizer).  Given IDENTICAL gradient
      inputs the layouts agree to a few ulps (asserted by
      TestFlatOptimizer::test_layout_equivalence_isolated).  Inside a full
      train step, however, the layout also changes how XLA fuses the
      BACKWARD pass, and Adam's mu/(sqrt(nu)+eps) amplifies that
      codegen-dependent grad rounding wherever nu ~ eps^2 (near-zero
      gradients): a ~1e-9 absolute grad difference can move the unit-scale
      Adam delta by ~1e-2, i.e. ~lr*1e-2 per step on a handful of params.
      The end-to-end bound is therefore machine-dependent — see the
      TestFlatOptimizer docstring for the justified tolerance.

    Returns ``(new_params, new_opt_state)``; opt_state keeps the per-leaf
    layout either way (orbax resume format unchanged).
    """
    keep_count = jnp.asarray(1.0 - reset_opt, opt_state.count.dtype)
    count = opt_state.count * keep_count
    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    if not flat or not leaves_p:
        keep = jnp.asarray(1.0 - reset_opt, jnp.float32)
        opt_in = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(
                lambda x: x * keep.astype(x.dtype), opt_state.mu
            ),
            nu=jax.tree_util.tree_map(
                lambda x: x * keep.astype(x.dtype), opt_state.nu
            ),
        )
        grads_wd = jax.tree_util.tree_map(
            lambda g, p, m: (g + weight_decay * p) * m, grads, params, mask
        )
        adam = optax.scale_by_adam(b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS)
        deltas, opt_out = adam.update(grads_wd, opt_in, params)
        deltas = jax.tree_util.tree_map(
            lambda d, lr, m: -lr * d * m, deltas, lrs, mask
        )
        return optax.apply_updates(params, deltas), opt_out

    # Lane-aligned 2D flat layout (round 5).  A single 106M-element 1-D
    # buffer is NOT safe on this backend: XLA's vectorizer rewrites big 1-D
    # elementwise chains to [N/8, 8] and then assigns layout T(8,128) — only
    # 8 of 128 lanes used, a measured 16x HBM expansion (six 6.3 GiB temps;
    # the b64 all-trainable step planned 39.6G and failed to COMPILE).  A
    # post-hoc reshape to [N/128, 128] gets canonicalized away.  So the flat
    # buffers are built 2D from the start: each leaf is padded to a multiple
    # of 128 and viewed as [rows, 128], leaves concatenate along rows, and
    # every elementwise op runs on a genuinely-2D [R, 128] tensor whose
    # (8,128) tiles pack fully.  Per-leaf pad waste is <=127 elements/leaf.
    sizes = [int(np.prod(p.shape)) for p in leaves_p]
    rows = [(n + 127) // 128 for n in sizes]
    row_offsets = np.concatenate([[0], np.cumsum(rows)])

    def _leaf2d(x, n, r):
        flat = x.reshape(-1).astype(jnp.float32)
        if r * 128 != n:
            flat = jnp.concatenate(
                [flat, jnp.zeros((r * 128 - n,), jnp.float32)]
            )
        return flat.reshape(r, 128)

    def _cat(tree):
        return jnp.concatenate(
            [
                _leaf2d(x, n, r)
                for x, n, r in zip(treedef.flatten_up_to(tree), sizes, rows)
            ]
        )

    def _cat_scalars(tree):
        # Per-leaf runtime scalars (mask / lr) broadcast into
        # segment-constant flat blocks.  Pad rows replicate the scalar —
        # harmless: _split drops pad lanes, and pad positions contribute
        # only to other pad positions.
        return jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.asarray(x, jnp.float32).reshape(1, 1), (r, 128)
                )
                for x, r in zip(treedef.flatten_up_to(tree), rows)
            ]
        )

    def _split(flat_2d):
        leaves = [
            jax.lax.slice(flat_2d, (int(ro), 0), (int(ro) + r, 128))
            .reshape(-1)[:n]
            .reshape(p.shape)
            .astype(p.dtype)
            for p, ro, r, n in zip(leaves_p, row_offsets[:-1], rows, sizes)
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    keep = jnp.asarray(1.0 - reset_opt, jnp.float32)
    p_f = _cat(params)
    mask_f = _cat_scalars(mask)
    g_f = (_cat(grads) + weight_decay * p_f) * mask_f
    mu_f = _cat(opt_state.mu) * keep
    nu_f = _cat(opt_state.nu) * keep
    # Same expressions as optax.scale_by_adam's update_fn.
    mu_f = (1 - ADAM_B1) * g_f + ADAM_B1 * mu_f
    nu_f = (1 - ADAM_B2) * g_f**2 + ADAM_B2 * nu_f
    count_inc = optax.safe_increment(count)
    mu_hat = mu_f / (1 - ADAM_B1**count_inc).astype(mu_f.dtype)
    nu_hat = nu_f / (1 - ADAM_B2**count_inc).astype(nu_f.dtype)
    delta_f = mu_hat / (jnp.sqrt(nu_hat + 0.0) + ADAM_EPS)
    p_new_f = p_f + -_cat_scalars(lrs) * delta_f * mask_f
    opt_out = optax.ScaleByAdamState(
        count=count_inc, mu=_split(mu_f), nu=_split(nu_f)
    )
    return _split(p_new_f), opt_out


class EmotionTrainer:
    def __init__(
        self,
        model_config: ModelConfig,
        train_config: TrainConfig,
        data_config: Optional[DataConfig] = None,
        mesh=None,
    ):
        if model_config.use_wavlm:
            # Train-path fused kernels.  The attention sublayer kernel has a
            # custom VJP (flash-style recompute backward,
            # ops/pallas_wavlm_attn.py), so EVERY encoder layer runs fused in
            # the train step — trainable layers differentiate through the
            # backward kernel, frozen layers are stop-gradient'd (static AD
            # scope below) and never request it.  The conv-FE chain has no
            # VJP, so it fuses only when the freeze policy keeps it frozen in
            # every stage of the run.  wavlm_geometry keys of the same name
            # win (tests).
            import dataclasses as _dc

            from multimodalemotionrecognition_tpu.train.freeze import (
                wavlm_frozen_prefix,
            )

            _, conv_frozen = wavlm_frozen_prefix(model_config, train_config)
            geometry = model_config.wavlm_geometry or {}
            n_layers = int(geometry.get("num_hidden_layers", 12))
            model_config = _dc.replace(
                model_config,
                wavlm_fused_train_layers=n_layers,
                wavlm_fused_train_conv=conv_frozen,
            )
        self.mc = model_config
        self.tc = train_config
        self.dc = data_config
        self.model = build_model(model_config)
        self._validate_train_config()
        self.mesh = mesh if mesh is not None else make_mesh(train_config.mesh_shape)
        self.is_single_modality = model_config.fusion in {"audio", "video"}
        self._train_step = None
        self._eval_step = None
        self.metrics_log: list = []

    # ------------------------------------------------------------------
    # model application
    # ------------------------------------------------------------------

    def _apply(self, variables, batch_video, batch_audio, train, rngs, mutable):
        fusion = self.mc.fusion
        kwargs = dict(train=train, rngs=rngs)
        if mutable:
            kwargs["mutable"] = ["batch_stats"]
        if fusion == "audio":
            out = self.model.apply(variables, batch_audio, **kwargs)
        elif fusion == "video":
            out = self.model.apply(variables, batch_video, **kwargs)
        else:
            out = self.model.apply(variables, batch_video, batch_audio, **kwargs)
        if mutable:
            out, updates = out
        else:
            updates = {}
        if isinstance(out, tuple):  # FusionModel returns (output, aux)
            out, aux = out
        else:
            aux = {"alignment_loss": None}
        return out, aux, updates

    def _device_video(self, video, aug, rngs):
        """uint8-wire device replay of the reference's float augmentation
        tail (`src/data/ravdess.py:366-387`): /255, brightness x factor,
        + Gaussian noise, clip [0,1], ImageNet normalize.  The host already
        applied the uint8-domain Gaussian blur (media.load_video_frames_u8);
        `aug` is [B,2] = (factor, sigma), (1,0) on eval batches so the same
        trace covers both.  float32-wire batches pass through untouched
        (host-normalized)."""
        if video.dtype != jnp.uint8:
            return video
        from multimodalemotionrecognition_tpu.config import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        v = video.astype(jnp.float32) / 255.0
        if aug is not None:
            factor = aug[:, 0].reshape(-1, 1, 1, 1, 1)
            sigma = aug[:, 1].reshape(-1, 1, 1, 1, 1)
            v = v * factor
            if rngs is not None:
                noise = jax.random.normal(rngs["videoaug"], v.shape, jnp.float32)
                v = v + sigma * noise
            v = jnp.clip(v, 0.0, 1.0)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 1, 3, 1, 1)
        return (v - mean) / std

    def _audio_features(self, audio_wav: jnp.ndarray) -> jnp.ndarray:
        """Waveform [B,1,T] -> model audio input; mel front-end runs on-device
        inside the step for non-WavLM models."""
        if self.mc.use_wavlm:
            return audio_wav
        from multimodalemotionrecognition_tpu.ops.mel import log_mel_spectrogram

        mel = log_mel_spectrogram(audio_wav[:, 0, :])
        return mel[:, None, :, :]

    def _losses(self, outputs, aux, labels, valid, denom=None):
        """`denom` overrides the valid-count normalizer — the grad-accum
        path passes the FULL batch's count so per-microbatch contributions
        sum to exactly the full-batch classification loss/gradient."""
        if self.mc.fusion == "late":
            per_sample = _nll_on_probs(outputs, labels)
        else:
            per_sample = _smoothed_cross_entropy(
                outputs, labels, max(0.0, self.tc.label_smoothing)
            )
        weight = valid.astype(per_sample.dtype)
        if denom is None:
            denom = jnp.maximum(weight.sum(), 1.0)
        cls_loss = (per_sample * weight).sum() / denom
        align = aux.get("alignment_loss")
        align_weight = (
            self.mc.fusion_align_weight if self.mc.fusion_align_mode != "none" else 0.0
        )
        contrastive = align if align is not None else jnp.zeros_like(cls_loss)
        total = cls_loss + align_weight * contrastive
        return total, cls_loss, contrastive

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _validate_train_config(self):
        """Fail fast on mode-string typos (advisor r4: a bad `remat` string
        used to silently enable FULL rematerialization)."""
        if self.tc.flat_optimizer not in ("auto", "on", "off"):
            raise ValueError(
                f"TrainConfig.flat_optimizer must be 'auto', 'on' or 'off'; "
                f"got {self.tc.flat_optimizer!r}"
            )
        if self.tc.rng_impl not in ("auto", "rbg", "threefry"):
            raise ValueError(
                f"TrainConfig.rng_impl must be 'auto', 'rbg' or 'threefry'; "
                f"got {self.tc.rng_impl!r}"
            )
        if self.tc.remat not in (False, True, "full", "dots", "off"):
            raise ValueError(
                f"TrainConfig.remat must be False, True, 'full', 'dots' or "
                f"'off'; got {self.tc.remat!r}"
            )
        if not isinstance(self.tc.grad_accum, int) or self.tc.grad_accum < 1:
            raise ValueError(
                f"TrainConfig.grad_accum must be an int >= 1; "
                f"got {self.tc.grad_accum!r}"
            )

    def _build_steps(self):
        self._adam_core = optax.scale_by_adam(b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS)
        self._validate_train_config()
        rng_impl = self.tc.rng_impl
        if rng_impl == "auto":
            rng_impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
        mesh_devices = (
            int(np.prod(self.mesh.devices.shape)) if self.mesh is not None else 1
        )
        use_flat_opt = self.tc.flat_optimizer == "on" or (
            self.tc.flat_optimizer == "auto" and mesh_devices == 1
        )

        def train_step(
            state: TrainState,
            video,
            audio_wav,
            labels,
            valid,
            mask,
            lrs,
            reset_opt=np.float32(0.0),
            aug=None,
        ):
            rng = jax.random.fold_in(state.rng, state.step)
            if rng_impl == "rbg":
                # TrainState.rng stays a legacy threefry key (stable orbax
                # resume format); the per-step stream keys are re-wrapped as
                # "rbg" keys so mask BITS come from XLA's hardware
                # RngBitGenerator instead of ~470M threefry evaluations per
                # step (see TrainConfig.rng_impl).  rbg keys still use
                # threefry for fold_in, so flax's per-module folding is
                # unchanged.
                rng = jax.random.wrap_key_data(
                    jnp.tile(rng.reshape(-1), 2)[:4], impl="rbg"
                )
            rngs = {
                name: jax.random.fold_in(rng, i)
                for i, name in enumerate(_RNG_STREAMS)
            }
            video = self._device_video(video, aug, rngs)
            audio = self._audio_features(audio_wav)

            # Static AD scope: leaves frozen in EVERY stage this run can use
            # (e.g. two-stage flagship: WavLM conv FE + encoder layers 0..9 +
            # video conv1/layer1-3) never need gradients — `stop_gradient`
            # turns their cotangents into symbolic zeros at trace time, so
            # the whole frozen backward is never emitted.  Numerically
            # identical to the runtime `mask` multiply (exact zeros either
            # way); the mask stays as data so the stage flip still runs in
            # one executable.
            stages = (
                (1, 2)
                if (self.tc.two_stage_training and not self.is_single_modality)
                else (0,)
            )
            ever_trainable = None
            for s in stages:
                m = trainable_mask(state.params, self.mc, self.tc, s)
                ever_trainable = (
                    m
                    if ever_trainable is None
                    else jax.tree_util.tree_map(max, ever_trainable, m)
                )

            def forward(params, video, audio):
                params = jax.tree_util.tree_map(
                    lambda p, t: p if t > 0 else jax.lax.stop_gradient(p),
                    params,
                    ever_trainable,
                )
                variables = {"params": params, "batch_stats": state.batch_stats}
                return self._apply(variables, video, audio, True, rngs, mutable=True)

            if self.tc.remat not in (False, "off"):
                # Rematerialize activations during backprop (jax.checkpoint):
                # "full"/True re-runs the whole forward (~1.3x FLOPs, max HBM
                # cut); "dots" keeps matmul/conv outputs and recomputes only
                # the elementwise/norm glue between them (policy
                # checkpoint_dots) — near-zero extra MXU work for a smaller
                # cut.  Peak-HBM numbers: benchmarks/bench_remat.py.
                if self.tc.remat == "dots":
                    forward = jax.checkpoint(
                        forward,
                        policy=jax.checkpoint_policies.checkpoint_dots,
                    )
                else:
                    forward = jax.checkpoint(forward)

            accum = int(self.tc.grad_accum)
            if accum == 1:

                def loss_fn(params):
                    outputs, aux, updates = forward(params, video, audio)
                    total, cls_loss, contrastive = self._losses(
                        outputs, aux, labels, valid
                    )
                    preds = jnp.argmax(outputs, axis=1)
                    return total, (cls_loss, contrastive, preds, updates)

                (total, (cls_loss, contrastive, preds, updates)), grads = (
                    jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                )
            else:
                # Gradient accumulation (TrainConfig.grad_accum): scan over
                # `accum` equal microbatches so only one microbatch's
                # activations are ever live.  Exactness contract: each
                # microbatch's classification loss is normalized by the FULL
                # batch's valid count (denom_g), so summed contributions
                # reproduce the full-batch cls loss and gradient bit-for-
                # the-math (float reassociation aside); the batch-level
                # alignment term combines as the mean over microbatches.
                # BN stats chain through the scan carry (per-microbatch —
                # the standard grad-accum semantics).  Dropout streams fold
                # the microbatch index so masks decorrelate.
                bsz = video.shape[0]
                if bsz % accum:
                    raise ValueError(
                        f"batch size {bsz} not divisible by grad_accum {accum}"
                    )
                mb = bsz // accum
                denom_g = jnp.maximum(
                    jnp.sum(valid.astype(jnp.float32)), 1.0
                )
                a_w = (
                    self.mc.fusion_align_weight
                    if self.mc.fusion_align_mode != "none"
                    else 0.0
                )

                def forward_m(params, bstats, mv, ma, mrngs):
                    params = jax.tree_util.tree_map(
                        lambda p, t: p if t > 0 else jax.lax.stop_gradient(p),
                        params,
                        ever_trainable,
                    )
                    variables = {"params": params, "batch_stats": bstats}
                    return self._apply(
                        variables, mv, ma, True, mrngs, mutable=True
                    )

                if self.tc.remat not in (False, "off"):
                    if self.tc.remat == "dots":
                        forward_m = jax.checkpoint(
                            forward_m,
                            policy=jax.checkpoint_policies.checkpoint_dots,
                        )
                    else:
                        forward_m = jax.checkpoint(forward_m)

                def micro(carry, xs):
                    bstats, g_acc, cls_acc, ctr_acc = carry
                    mv, ma, ml, mvld, midx = xs
                    mrngs = {
                        k: jax.random.fold_in(v, midx) for k, v in rngs.items()
                    }

                    def lf(params):
                        out, aux, upd = forward_m(params, bstats, mv, ma, mrngs)
                        _, cls_i, ctr_i = self._losses(
                            out, aux, ml, mvld, denom=denom_g
                        )
                        gobj = cls_i + a_w * ctr_i / accum
                        return gobj, (cls_i, ctr_i, jnp.argmax(out, axis=1), upd)

                    (_, (cls_i, ctr_i, preds_i, upd)), g_i = (
                        jax.value_and_grad(lf, has_aux=True)(state.params)
                    )
                    new_carry = (
                        upd.get("batch_stats", bstats),
                        jax.tree_util.tree_map(jnp.add, g_acc, g_i),
                        cls_acc + cls_i,
                        ctr_acc + ctr_i / accum,
                    )
                    return new_carry, preds_i

                def _mb(x):
                    return x.reshape(accum, mb, *x.shape[1:])

                init = (
                    state.batch_stats,
                    jax.tree_util.tree_map(jnp.zeros_like, state.params),
                    jnp.float32(0.0),
                    jnp.float32(0.0),
                )
                (bs_final, grads, cls_loss, contrastive), preds_mb = lax.scan(
                    micro,
                    init,
                    (
                        _mb(video),
                        _mb(audio),
                        _mb(labels),
                        _mb(valid),
                        jnp.arange(accum, dtype=jnp.uint32),
                    ),
                )
                total = cls_loss + a_w * contrastive
                preds = preds_mb.reshape(bsz)
                updates = {"batch_stats": bs_final}
            # Static optimizer scope (companion of the static AD scope):
            # Adam runs ONLY on leaves trainable in SOME stage of this run.
            # `ever_trainable` is trace-time static, never-trainable leaves
            # have symbolic-zero grads (stop_gradient above), exactly-zero
            # mu/nu forever (init zero; decay of zero is zero; the reset
            # flag multiplies by zero), and a runtime `mask` of 0 in every
            # stage — so skipping them is numerically identical to the
            # full-tree update while avoiding ~5 full-tree HBM passes over
            # the frozen majority (e.g. ~80% of the flagship's 95M params in
            # the two-stage finetune regime).  The flat sub-dicts are valid
            # pytrees for optax; results merge back into the original nested
            # structure, so TrainState/opt_state layout (and orbax resume
            # format) are unchanged.
            from flax.traverse_util import flatten_dict, unflatten_dict

            live = {
                k for k, v in flatten_dict(ever_trainable).items() if v > 0
            }

            def _sub(tree):
                flat = flatten_dict(tree)
                return {k: flat[k] for k in live}

            def _merge(full, sub):
                flat = dict(flatten_dict(full))
                flat.update(sub)
                return unflatten_dict(flat)

            # Optimizer update on the live sub-tree only (static optimizer
            # scope above).  Stage-flip reset rides in as DATA (reset_opt) so
            # the flip reuses the stage-1 executable — eagerly re-initializing
            # opt_state outside jit produced buffers whose layouts mismatched
            # the donated outputs and forced a full tunnel recompile (487 s
            # measured in round 1).  Layout (flat vs per-leaf) is chosen by
            # TrainConfig.flat_optimizer; see masked_adam_update for the
            # equivalence contract.
            params_sub, opt_sub = masked_adam_update(
                optax.ScaleByAdamState(
                    count=state.opt_state.count,
                    mu=_sub(state.opt_state.mu),
                    nu=_sub(state.opt_state.nu),
                ),
                _sub(state.params),
                _sub(grads),
                _sub(mask),
                _sub(lrs),
                reset_opt,
                self.tc.weight_decay,
                flat=use_flat_opt,
            )
            opt_state = optax.ScaleByAdamState(
                count=opt_sub.count,
                mu=_merge(state.opt_state.mu, opt_sub.mu),
                nu=_merge(state.opt_state.nu, opt_sub.nu),
            )
            params = _merge(state.params, params_sub)
            new_state = state.replace(
                params=params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=opt_state,
                step=state.step + 1,
            )
            return new_state, total, cls_loss, contrastive, preds

        def eval_step(params, batch_stats, video, audio_wav, labels, valid, aug=None):
            video = self._device_video(video, aug, None)
            audio = self._audio_features(audio_wav)
            variables = {"params": params, "batch_stats": batch_stats}
            outputs, aux, _ = self._apply(
                variables, video, audio, False, None, mutable=False
            )
            total, cls_loss, contrastive = self._losses(outputs, aux, labels, valid)
            preds = jnp.argmax(outputs, axis=1)
            return total, cls_loss, contrastive, preds

        donate = (0,) if self.tc.donate_buffers else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.tc.seed)
        init_rng, state_rng = jax.random.split(rng)
        video = jnp.zeros((1, 8, 3, 112, 112), jnp.float32)
        if self.mc.use_wavlm:
            audio = jnp.zeros((1, 1, 48000), jnp.float32)
        else:
            audio = jnp.zeros((1, 1, self.mc.audio_n_mels, 301), jnp.float32)
        if self.mc.fusion == "audio":
            variables = self.model.init(init_rng, audio)
        elif self.mc.fusion == "video":
            variables = self.model.init(init_rng, video)
        else:
            variables = self.model.init(init_rng, video, audio)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        params, batch_stats = self._warm_start(params, batch_stats)
        if self._train_step is None:
            self._build_steps()
        opt_state = self._adam_core.init(params)
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=state_rng,
            step=jnp.asarray(0, jnp.int32),
        )
        # Commit the state replicated over the mesh BEFORE the first step:
        # otherwise step 1 compiles against uncommitted single-device inputs
        # and step 2 recompiles against the mesh-sharded step outputs (two
        # executables for one shape — measured as a second tunnel compile).
        from multimodalemotionrecognition_tpu.parallel.mesh import replicate

        return jax.device_put(state, replicate(self.mesh))

    def _warm_start(self, params, batch_stats):
        """Branch checkpoint warm-start (reference `:913-947`): load standalone
        audio/video checkpoints into the fusion branches, tolerating missing
        and extra keys like load_state_dict(strict=False)."""
        if self.is_single_modality:
            return params, batch_stats
        from multimodalemotionrecognition_tpu.convert.torch_import import (
            load_reference_checkpoint,
            torch_state_dict_to_flax,
        )

        for attr, branch in (("audio_ckpt", "audio_model"), ("video_ckpt", "video_model")):
            path = getattr(self.tc, attr)
            if not path:
                continue
            sd, _ = load_reference_checkpoint(path)
            template = {
                "params": params[branch],
                "batch_stats": batch_stats.get(branch, {}),
            }
            filled, report = torch_state_dict_to_flax(sd, template, strict=False)
            print(
                f"[INFO] Loaded {branch} checkpoint: {path} "
                f"(missing={len(report.missing_flax_paths)}, "
                f"unused={len(report.unused_torch_keys)})"
            )
            params = dict(params)
            params[branch] = filled["params"]
            if filled["batch_stats"]:
                batch_stats = dict(batch_stats)
                batch_stats[branch] = filled["batch_stats"]
        return params, batch_stats

    # ------------------------------------------------------------------
    # epochs
    # ------------------------------------------------------------------

    def _stage_plan(self) -> Tuple[bool, int, int]:
        two_stage = self.tc.two_stage_training and not self.is_single_modality
        if not two_stage:
            return False, 0, self.tc.epochs
        if self.tc.epochs <= 1:
            stage1 = self.tc.epochs
        else:
            stage1 = min(max(1, self.tc.stage1_epochs), self.tc.epochs - 1)
        return True, stage1, self.tc.epochs - stage1

    def _epoch_lr_scale(
        self, stage: int, epoch_in_stage: int, epochs_in_stage: int
    ) -> Dict[str, float]:
        if not self.tc.use_cosine_annealing:
            return {}
        if self.tc.cosine_stage2_only and stage == 1:
            return {}
        f = cosine_factor(epoch_in_stage, epochs_in_stage)
        return {"fusion": f, "audio": f, "video": f}

    def run_epoch(
        self,
        state: TrainState,
        loader: Iterable,
        train: bool,
        mask=None,
        lrs=None,
        reset_opt_first: bool = False,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """One pass over `loader`, pipelined like serving (r2 VERDICT #2).

        The reference hot loop (`src/train.py:185-244`) copies each batch
        H2D synchronously and reads losses per step.  Here batch N+1's
        host->device transfer STARTS right after step N is dispatched (JAX
        device_put / step dispatch are async, so the transfer rides under
        step N's compute), and per-step scalars/preds stay on device until
        ONE fetch at epoch end — the loop never blocks on the device
        between steps, so epoch time ~ n_steps * max(step_ms, transfer_ms)
        + decode tail instead of n_steps * (step + transfer + fetch).
        In-flight steps are capped at 3 (block on step N-3's loss scalar)
        so queued input buffers can't exhaust device memory when host
        decode outruns the device.

        Staging runs on a PRODUCER THREAD (bounded queue, depth 2): on
        transports where `jax.device_put` blocks its caller until the bytes
        land (the tunneled-chip runtime does; some PJRT plugins do for large
        buffers), same-thread staging would serialize transfer behind the
        loop — measured 1.7 s/step vs the 96 ms chained step at b64.  The
        blocking put releases the GIL during network/DMA I/O, so a separate
        thread genuinely overlaps it with step dispatch — the exact pattern
        that doubled serving throughput (`runtime/runner.py::stage` called
        from the batcher's preprocess stage).
        """
        import queue as _queue
        import threading as _threading

        step_outs: list = []  # (total, cls_l, ctr_l, preds) device arrays
        sizes: list = []
        valids: list = []
        labels_list: list = []
        first = True

        def _stage(batch):
            arrays = {
                "video": batch.video,
                "audio": batch.audio,
                "labels": batch.labels,
                "valid": batch.valid,
            }
            if batch.aug is not None:
                arrays["aug"] = batch.aug
            return batch, shard_batch(self.mesh, arrays)

        q: _queue.Queue = _queue.Queue(maxsize=2)
        err: list = []
        stop = _threading.Event()  # set if the consumer dies mid-epoch

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except _queue.Full:
                    continue
            return False

        def _producer():
            try:
                for b in loader:
                    if not _put(_stage(b)):  # decode + (possibly blocking) H2D
                        return
            except BaseException as e:  # surface loader errors in the main thread
                err.append(e)
            finally:
                _put(None)

        prod = _threading.Thread(target=_producer, daemon=True)
        prod.start()
        try:
            while True:
                staged = q.get()
                if staged is None:
                    break
                batch, sb = staged
                aug = sb.get("aug")
                if train:
                    reset = np.float32(1.0 if (reset_opt_first and first) else 0.0)
                    first = False
                    state, total, cls_l, ctr_l, preds = self._train_step(
                        state, sb["video"], sb["audio"], sb["labels"],
                        sb["valid"], mask, lrs, reset, aug
                    )
                else:
                    total, cls_l, ctr_l, preds = self._eval_step(
                        state.params,
                        state.batch_stats,
                        sb["video"],
                        sb["audio"],
                        sb["labels"],
                        sb["valid"],
                        aug,
                    )
                step_outs.append((total, cls_l, ctr_l, preds))
                sizes.append(batch.size)
                valids.append(np.asarray(batch.valid))
                labels_list.append(batch.labels)
                if len(step_outs) >= 3:
                    step_outs[-3][0].block_until_ready()
        finally:
            stop.set()  # unblock the producer if we die mid-epoch
            # Join inside finally so a consumer exception can't leave a zombie
            # producer mid-device_put on a loader the caller may retry with.
            prod.join()

        if err:
            raise err[0]
        fetched = jax.device_get(step_outs)  # the ONE device sync per epoch
        totals = np.zeros(3)
        n = 0
        all_preds, all_labels = [], []
        for (total, cls_l, ctr_l, preds), bs, valid_np, labels in zip(
            fetched, sizes, valids, labels_list
        ):
            totals += np.array([total, cls_l, ctr_l], dtype=np.float64) * bs
            n += bs
            all_preds.append(np.asarray(preds)[valid_np])
            all_labels.append(labels[valid_np])
        preds = np.concatenate(all_preds) if all_preds else np.zeros(0)
        labels = np.concatenate(all_labels) if all_labels else np.zeros(0)
        metrics = {
            "loss": totals[0] / max(n, 1),
            "cls_loss": totals[1] / max(n, 1),
            "contrastive_loss": totals[2] / max(n, 1),
            "acc": accuracy(preds, labels),
            "f1": macro_f1(preds, labels),
        }
        return state, metrics

    def fit(
        self,
        train_loader,
        val_loader,
        test_loader=None,
        state: Optional[TrainState] = None,
        log_fn=None,
    ) -> Tuple[TrainState, Dict[str, Any]]:
        set_seed(self.tc.seed)
        if state is None:
            state = self.init_state()
        two_stage, stage1_epochs, stage2_epochs = self._stage_plan()
        current_stage = 1 if two_stage else 0

        mask = trainable_mask(state.params, self.mc, self.tc, current_stage)
        best_f1, best_payload = -1.0, None
        patience = 0
        out_dir = Path(self.tc.output_dir)
        history = []

        for epoch in range(1, self.tc.epochs + 1):
            reset_opt = False
            if (
                two_stage
                and current_stage == 1
                and stage1_epochs < self.tc.epochs
                and epoch == stage1_epochs + 1
            ):
                current_stage = 2
                mask = trainable_mask(state.params, self.mc, self.tc, 2)
                # Stage flip rebuilds the optimizer exactly like the
                # reference's fresh torch.optim.Adam (`:1080`) — done INSIDE
                # the jitted step via the reset_opt flag so the flip reuses
                # the stage-1 executable (round-1 eager re-init cost a 487 s
                # tunnel recompile from donated-layout mismatch).
                reset_opt = True
                print(f"[INFO] Switched to stage-2 at epoch {epoch}.")

            epoch_in_stage = (
                epoch - 1 if current_stage != 2 else epoch - 1 - stage1_epochs
            )
            epochs_in_stage = (
                self.tc.epochs
                if not two_stage
                else (stage1_epochs if current_stage == 1 else stage2_epochs)
            )
            scale = self._epoch_lr_scale(current_stage, epoch_in_stage, epochs_in_stage)
            lrs = lr_tree(state.params, self.mc, self.tc, current_stage, scale)

            t0 = time.time()
            state, train_m = self.run_epoch(
                state, train_loader, True, mask, lrs, reset_opt_first=reset_opt
            )
            state, val_m = self.run_epoch(state, val_loader, False)
            dt = time.time() - t0

            row = {
                "epoch": epoch,
                "stage": current_stage,
                "epoch_time_sec": round(dt, 2),
                **{f"train/{k}": v for k, v in train_m.items()},
                **{f"val/{k}": v for k, v in val_m.items()},
            }
            history.append(row)
            print(
                f"Epoch {epoch:02d} | stage {current_stage or '-'} | "
                f"train loss {train_m['loss']:.4f} acc {train_m['acc']:.4f} "
                f"f1 {train_m['f1']:.4f} | val loss {val_m['loss']:.4f} "
                f"acc {val_m['acc']:.4f} f1 {val_m['f1']:.4f} | {dt:.1f}s"
            )
            if log_fn:
                log_fn(row)
            self.metrics_log.append(row)

            if val_m["f1"] > best_f1:
                best_f1 = val_m["f1"]
                patience = 0
                best_payload = {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                    "val_f1": best_f1,
                }
                self.save_checkpoint(out_dir / f"best_{self.mc.fusion}.pt", state, best_f1)
            else:
                patience += 1
                if (
                    self.tc.early_stopping_patience > 0
                    and patience >= self.tc.early_stopping_patience
                ):
                    print(
                        f"\nEarly stopping triggered! No improvement for "
                        f"{self.tc.early_stopping_patience} epochs."
                    )
                    break

        result: Dict[str, Any] = {"best_val_f1": best_f1, "history": history}
        if test_loader is not None and test_loader.num_samples > 0:
            _, test_m = self.run_epoch(state, test_loader, False)
            result["test"] = test_m
            print(
                f"Test | loss {test_m['loss']:.4f} acc {test_m['acc']:.4f} "
                f"f1 {test_m['f1']:.4f}"
            )
            # Test confusion matrix (reference plots it to W&B,
            # `src/train.py:304-326,1186-1197`): saved as PNG + CSV.
            try:
                cm = self._test_confusion_matrix(state, test_loader)
                self._save_confusion_matrix(cm, out_dir)
                result["confusion_matrix"] = cm.tolist()
            except Exception as exc:  # plotting must never kill a run
                print(f"[WARNING] confusion matrix failed: {exc}")
        (out_dir / "metrics.jsonl").parent.mkdir(parents=True, exist_ok=True)
        with (out_dir / "metrics.jsonl").open("w") as f:
            for row in history:
                f.write(json.dumps(row) + "\n")
        return state, result

    def _test_confusion_matrix(self, state, loader) -> np.ndarray:
        from multimodalemotionrecognition_tpu.utils.metrics import confusion_matrix

        preds, labels = [], []
        for batch in loader:
            sb = shard_batch(
                self.mesh,
                {
                    "video": batch.video,
                    "audio": batch.audio,
                    "labels": batch.labels,
                    "valid": batch.valid,
                },
            )
            *_, p = self._eval_step(
                state.params, state.batch_stats,
                sb["video"], sb["audio"], sb["labels"], sb["valid"],
            )
            valid_np = np.asarray(batch.valid)
            preds.append(np.asarray(p)[valid_np])
            labels.append(batch.labels[valid_np])
        return confusion_matrix(
            np.concatenate(preds), np.concatenate(labels), self.mc.num_classes
        )

    def _save_confusion_matrix(self, cm: np.ndarray, out_dir: Path) -> None:
        out_dir.mkdir(parents=True, exist_ok=True)
        np.savetxt(out_dir / "confusion_matrix.csv", cm, fmt="%d", delimiter=",")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from multimodalemotionrecognition_tpu.config import labels_for

            labels = list(labels_for(self.mc.num_classes))
            fig, ax = plt.subplots(figsize=(8, 8))
            im = ax.imshow(cm, cmap="Blues")
            ax.set_xlabel("Predicted")
            ax.set_ylabel("True")
            ax.set_xticks(range(len(labels)), labels, rotation=45, ha="right")
            ax.set_yticks(range(len(labels)), labels)
            for i in range(cm.shape[0]):
                for j in range(cm.shape[1]):
                    ax.text(
                        j, i, int(cm[i, j]), ha="center", va="center",
                        color="w" if cm[i, j] > cm.max() / 2 else "black",
                    )
            fig.colorbar(im, ax=ax)
            fig.tight_layout()
            fig.savefig(out_dir / "confusion_matrix.png", dpi=120)
            plt.close(fig)
        except ImportError:
            pass

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------

    def save_resume_state(
        self, directory: Path | str, state: TrainState, epoch: int, best_f1: float
    ) -> None:
        """Full-state orbax checkpoint (params + optimizer + RNG + epoch) —
        mid-run resume support the reference lacks (SURVEY.md §5
        checkpoint/resume)."""
        import orbax.checkpoint as ocp

        directory = Path(directory).resolve()
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "rng": jax.device_get(state.rng),
            "step": int(state.step),
            "epoch": epoch,
            "best_f1": float(best_f1),
        }
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(directory / "resume", payload, force=True)

    def restore_resume_state(self, directory: Path | str):
        """-> (TrainState, epoch, best_f1) from `save_resume_state` output."""
        import orbax.checkpoint as ocp

        directory = Path(directory).resolve()
        with ocp.PyTreeCheckpointer() as ckptr:
            payload = ckptr.restore(directory / "resume")
        if self._train_step is None:
            self._build_steps()
        state = TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            rng=jnp.asarray(payload["rng"]),
            step=jnp.asarray(payload["step"], jnp.int32),
        )
        return state, int(payload["epoch"]), float(payload["best_f1"])

    def save_checkpoint(self, path: Path, state: TrainState, val_f1: float) -> None:
        """Reference-format .pt: {"model": state_dict, "val_f1", "config"}
        (`src/train.py:1138-1144`) — loadable by the reference framework."""
        from multimodalemotionrecognition_tpu.convert.torch_import import (
            save_torch_checkpoint,
        )

        variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        save_torch_checkpoint(
            path, variables, config=self.mc.to_checkpoint_dict(), val_f1=val_f1
        )
