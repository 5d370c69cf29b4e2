"""Decompose the training-step time on real hardware.

The stage-2 two-stage step (the reference's actual finetune regime,
`/root/reference/src/train.py:798-829`) measured 84.6 ms at b64 bf16 while
the eval forward alone is ~33 ms — this script localizes the difference by
timing controlled variants of the jitted step:

  fwd_eval      eval-mode forward only (no dropout, no grad)
  fwd_train     training-mode forward only (dropout RNG + masks, no grad)
  grad          value_and_grad, no optimizer update
  full          the real train step (grad + Adam + apply)

Each variant is state/input-chained and closed with a host fetch (the only
sync that actually waits on the tunneled axon backend).

Usage: python benchmarks/bench_step_decomp.py --batch 64 --dtype bfloat16 \
           [--two-stage] [--no-dropout] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--two-stage", action="store_true")
    p.add_argument(
        "--no-dropout", action="store_true",
        help="zero every dropout rate (isolates RNG/mask-generation cost)",
    )
    p.add_argument(
        "--variants", default="fwd_eval,fwd_train,grad,full",
        help="comma list from {fwd_eval,fwd_train,grad,full}",
    )
    args = p.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from multimodalemotionrecognition_tpu.config import ModelConfig, TrainConfig
    from multimodalemotionrecognition_tpu.train.freeze import lr_tree, trainable_mask
    from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer

    mc = ModelConfig(
        fusion="xattn", use_wavlm=True, num_classes=8, compute_dtype=args.dtype
    )
    tc = TrainConfig(
        lr=1e-3,
        two_stage_training=args.two_stage,
        epochs=10,
        stage1_epochs=3,
        donate_buffers=False,  # variants reuse the same state
    )
    stage = 2 if args.two_stage else 0
    trainer = EmotionTrainer(mc, tc)
    if args.no_dropout:
        import dataclasses

        wl = trainer.model.audio_model
        zeroed = dataclasses.replace(
            wl.wavlm_config,
            hidden_dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            feat_proj_dropout=0.0,
        )
        trainer.model = dataclasses.replace(
            trainer.model,
            audio_model=dataclasses.replace(wl, wavlm_config=zeroed),
        )
        trainer._build_steps()

    state = trainer.init_state()
    mask = trainable_mask(state.params, mc, tc, stage=stage)
    lrs = lr_tree(state.params, mc, tc, stage=stage, scale={})

    rng = np.random.RandomState(0)
    b = args.batch
    video = jnp.asarray(rng.randn(b, 8, 3, 112, 112).astype(np.float32))
    audio = jnp.asarray(rng.randn(b, 1, 48000).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, 8, b).astype(np.int32))
    valid = jnp.ones(b, bool)

    def make_grad_only():
        """value_and_grad of the step's loss (same static AD scope), but no
        optimizer update — isolates fwd+bwd from Adam/apply."""
        def grad_step(state, video, audio_wav, labels, valid, step_i):
            rngk = jax.random.fold_in(state.rng, step_i)
            rngs = {
                name: jax.random.fold_in(rngk, i)
                for i, name in enumerate(
                    ("dropout", "droppath", "modality", "specaugment", "wavlm_mask")
                )
            }
            audio_f = trainer._audio_features(audio_wav)
            stages = (1, 2) if tc.two_stage_training else (0,)
            ever = None
            for s in stages:
                m = trainable_mask(state.params, mc, tc, s)
                ever = m if ever is None else jax.tree_util.tree_map(max, ever, m)

            def loss_fn(params):
                params = jax.tree_util.tree_map(
                    lambda p, t: p if t > 0 else jax.lax.stop_gradient(p),
                    params,
                    ever,
                )
                variables = {"params": params, "batch_stats": state.batch_stats}
                outputs, aux, _ = trainer._apply(
                    variables, video, audio_f, True, rngs, mutable=True
                )
                total, *_ = trainer._losses(outputs, aux, labels, valid)
                return total

            total, grads = jax.value_and_grad(loss_fn)(state.params)
            # fold the grads into a scalar so nothing is dead-code-eliminated
            gsum = sum(
                jnp.sum(jnp.abs(g).astype(jnp.float32))
                for g in jax.tree_util.tree_leaves(grads)
            )
            return total + 0.0 * gsum

        return jax.jit(grad_step)

    def make_fwd(train: bool):
        def fwd_step(params, batch_stats, video, audio_wav, labels, valid, step_i):
            rngk = jax.random.fold_in(state.rng, step_i)
            rngs = (
                {
                    name: jax.random.fold_in(rngk, i)
                    for i, name in enumerate(
                        ("dropout", "droppath", "modality", "specaugment",
                         "wavlm_mask")
                    )
                }
                if train
                else None
            )
            audio_f = trainer._audio_features(audio_wav)
            variables = {"params": params, "batch_stats": batch_stats}
            outputs, aux, _ = trainer._apply(
                variables, video, audio_f, train, rngs, mutable=train
            )
            total, *_ = trainer._losses(outputs, aux, labels, valid)
            return total

        return jax.jit(fwd_step)

    results = {}
    variants = args.variants.split(",")
    for name in variants:
        if name == "full":
            # warm
            st, total, *_ = trainer._train_step(
                state, video, audio, labels, valid, mask, lrs, np.float32(0.0)
            )
            np.asarray(total)
            t0 = time.perf_counter()
            st = state
            for _ in range(args.iters):
                st, total, *_ = trainer._train_step(
                    st, video, audio, labels, valid, mask, lrs, np.float32(0.0)
                )
            np.asarray(total)
            dt = (time.perf_counter() - t0) / args.iters
        elif name == "grad":
            fn = make_grad_only()
            out = fn(state, video, audio, labels, valid, jnp.int32(0))
            np.asarray(out)
            t0 = time.perf_counter()
            carry = audio
            for i in range(args.iters):
                # chain through the audio input so steps serialize
                out = fn(state, video, carry, labels, valid, jnp.int32(i))
                carry = audio + 0.0 * out
            np.asarray(out)
            dt = (time.perf_counter() - t0) / args.iters
        else:
            train = name == "fwd_train"
            fn = make_fwd(train)
            out = fn(
                state.params, state.batch_stats, video, audio, labels, valid,
                jnp.int32(0),
            )
            np.asarray(out)
            t0 = time.perf_counter()
            carry = audio
            for i in range(args.iters):
                out = fn(
                    state.params, state.batch_stats, video, carry, labels,
                    valid, jnp.int32(i),
                )
                carry = audio + 0.0 * out
            np.asarray(out)
            dt = (time.perf_counter() - t0) / args.iters
        results[name] = round(dt * 1000, 1)
        print(f"[decomp] {name}: {dt * 1000:.1f} ms", flush=True)

    print(
        json.dumps(
            {
                "metric": f"step_decomp_b{b}_{args.dtype}"
                + ("_stage2" if args.two_stage else "")
                + ("_nodrop" if args.no_dropout else ""),
                "value": results.get("full", 0.0),
                "unit": "ms_per_step",
                "parts": results,
            }
        )
    )


if __name__ == "__main__":
    main()
