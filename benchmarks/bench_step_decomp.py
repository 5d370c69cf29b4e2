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
        "--variants", default="fwd_eval,fwd_train,grad",
        help="comma list from {fwd_eval,fwd_train,grad,full}; 'full' costs "
        "two extra scan-of-train-step compiles — the chained bench_train.py "
        "number is usually what you want for it",
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

    # Scan-slope methodology (benchmarks/RESULTS.md): run K iterations of
    # each variant INSIDE one jit via lax.scan with a carry-perturbed input
    # (defeats CSE/LICM), time at two scan lengths, and take the slope — the
    # fixed per-call tunnel dispatch cost (~170 ms/RPC, which swamped a
    # per-call chained loop at these sizes) cancels exactly.
    from jax import lax

    base_rng = jax.random.PRNGKey(123)
    streams = (
        "dropout", "droppath", "modality", "specaugment", "wavlm_mask",
        "layerdrop",
    )
    rng_impl = tc.rng_impl
    if rng_impl == "auto":
        rng_impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    print(f"[decomp] rng_impl={rng_impl}", flush=True)

    def _rngs_for(it):
        rngk = jax.random.fold_in(base_rng, it)
        if rng_impl == "rbg":  # mirror trainer._build_steps
            rngk = jax.random.wrap_key_data(
                jnp.tile(rngk.reshape(-1), 2)[:4], impl="rbg"
            )
        return {
            name: jax.random.fold_in(rngk, i)
            for i, name in enumerate(streams)
        }

    def _loss(params, batch_stats, audio_wav, train, rngs, static_scope):
        audio_f = trainer._audio_features(audio_wav)
        if static_scope:
            stages = (1, 2) if tc.two_stage_training else (0,)
            ever = None
            for s in stages:
                m = trainable_mask(params, mc, tc, s)
                ever = m if ever is None else jax.tree_util.tree_map(max, ever, m)
            params = jax.tree_util.tree_map(
                lambda p, t: p if t > 0 else jax.lax.stop_gradient(p),
                params,
                ever,
            )
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, aux, _ = trainer._apply(
            variables, video, audio_f, train, rngs, mutable=train
        )
        total, *_ = trainer._losses(outputs, aux, labels, valid)
        return total

    def make_loop(name, n):
        if name == "full":
            @jax.jit
            def loop(state):
                def body(st, _):
                    st, total, *_ = trainer._train_step(
                        st, video, audio, labels, valid, mask, lrs,
                        np.float32(0.0),
                    )
                    return st, total

                st, totals = lax.scan(body, state, None, length=n)
                return totals[-1]

            return lambda: loop(state)

        train = name != "fwd_eval"

        @jax.jit
        def loop(params, batch_stats, audio):
            def body(carry, _):
                acc, it = carry
                a = audio + acc * 1e-24
                rngs = _rngs_for(it) if train else None
                if name == "grad":
                    total, grads = jax.value_and_grad(
                        lambda p: _loss(p, batch_stats, a, True, rngs, True)
                    )(params)
                    gsum = sum(
                        jnp.sum(jnp.abs(g).astype(jnp.float32))
                        for g in jax.tree_util.tree_leaves(grads)
                    )
                    total = total + 0.0 * gsum
                else:
                    total = _loss(params, batch_stats, a, train, rngs, False)
                return (acc + total, it + 1), None

            (acc, _), _ = lax.scan(
                body, (jnp.float32(0.0), jnp.int32(0)), None, length=n
            )
            return acc

        return lambda: loop(state.params, state.batch_stats, audio)

    def timed(name, n, repeats=3):
        loop = make_loop(name, n)
        np.asarray(loop())  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(loop())
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    variants = args.variants.split(",")
    n_lo, n_hi = max(2, args.iters // 4), args.iters
    for name in variants:
        t_lo = timed(name, n_lo)
        t_hi = timed(name, n_hi)
        dt = (t_hi - t_lo) / (n_hi - n_lo)
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
