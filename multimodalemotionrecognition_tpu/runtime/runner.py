"""Inference runner: checkpoint -> jitted, bucketed predict_probs.

TPU-native counterpart of the reference's TorchModelRunner / OnnxModelRunner
(`src/optimized_runtime.py:44-143`):

  * model reconstructed from the checkpoint's embedded config, falling back to
    state-dict signature inference (`:51-57`), with the same guard rails
    (reject any unexpected-key pile-up, >32 missing keys -> error, `:87-94`);
  * `predict_probs(videos, audios)` dispatches by fusion mode and softmaxes
    UNLESS late fusion already returned probabilities (`:99-108`);
  * XLA static shapes handled by padding each request batch up to the nearest
    bucket in (1, 2, 4, 8, ...) — one compiled executable per bucket, compiled
    lazily and cached;
  * optional int8 weight-only quantization of Dense kernels mirrors the
    reference's CPU dynamic quantization switch (`:95-96`);
  * optional bfloat16 compute for TPU serving speed;
  * optional multi-chip inference: pass a `jax.sharding.Mesh` (data, model)
    and the runner shards each request batch over the "data" axis (and the
    WavLM trunk over "model" when that axis is >1) — XLA inserts the ICI
    collectives.  This is the intra-slice half of inference scale-out; the
    Redis gateway/worker pair (serving/redis_transport.py) is the cross-host
    (DCN) half, mirroring the reference's only distributed mechanism
    (`src/inference_server.py:53-151`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodalemotionrecognition_tpu.config import ModelConfig, labels_for

__all__ = ["JaxModelRunner"]


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return max(
        buckets[-1] * (-(-n // buckets[-1])), buckets[-1]
    )  # multiples of the largest bucket


class JaxModelRunner:
    def __init__(
        self,
        checkpoint_path: str | Path,
        fallback_fusion: str = "xattn",
        num_classes: Optional[int] = None,
        batch_buckets: Sequence[int] = (1, 2, 4, 8),
        compute_dtype: str = "float32",
        quantize_int8: bool = False,
        fused: bool = False,
        device_normalize: bool = False,
        donate: bool = False,
        mesh: Optional[Any] = None,
        fused_wavlm: Any = "auto",
    ):
        from multimodalemotionrecognition_tpu.convert import (
            checkpoint_uses_wavlm,
            infer_model_signature,
        )
        from multimodalemotionrecognition_tpu.convert.torch_import import (
            load_reference_checkpoint,
            torch_state_dict_to_flax,
        )
        from multimodalemotionrecognition_tpu.models.factory import build_model

        import os

        sd, config = load_reference_checkpoint(checkpoint_path)
        self.config = config
        if "fusion" in config:
            fusion = str(config.get("fusion", fallback_fusion))
            xattn_head = str(config.get("xattn_head", "concat"))
        else:
            fusion, xattn_head = infer_model_signature(sd)
            # Env overrides for config-less checkpoints (reference
            # backend/app/model_loader.py:198-205).
            fusion = os.environ.get("MODEL_FUSION", fusion)
            xattn_head = os.environ.get("MODEL_XATTN_HEAD", xattn_head)
        self.fusion_mode = fusion
        self.num_classes = int(
            num_classes if num_classes is not None else config.get("num_classes", 8)
        )
        self.use_wavlm = bool(config.get("use_wavlm", checkpoint_uses_wavlm(sd)))
        self.labels = list(labels_for(self.num_classes))
        # Multi-chip: batches shard over mesh "data"; every bucket must be a
        # multiple of the data-axis size so each chip gets equal rows.
        self.mesh = mesh
        self._dp = int(mesh.shape["data"]) if mesh is not None else 1
        self._tp = int(mesh.shape["model"]) if mesh is not None else 1
        buckets = sorted(batch_buckets)
        if self._dp > 1:
            buckets = sorted({-(-b // self._dp) * self._dp for b in buckets})
        self.batch_buckets = tuple(buckets)
        # device_normalize: accept uint8 video and run /255 + ImageNet
        # normalization inside the jitted forward (4x less host->device
        # transfer than pre-normalized float32 frames).
        self.device_normalize = device_normalize

        self.model_config = ModelConfig.from_checkpoint_dict(
            {**config, "fusion": fusion, "xattn_head": xattn_head},
            num_classes=self.num_classes,
            use_wavlm=self.use_wavlm,
            compute_dtype=compute_dtype,
            spec_augment=False,
        )
        # Model-level fused WavLM kernels under a mesh: the in-model "auto"
        # gate requires device_count()==1 (a pallas_call inside a plain
        # sharded jit is not automatically partitioned), so the runner
        # resolves the gate itself and, when on, runs the whole forward under
        # shard_map — each chip executes the fused kernels on its batch
        # shard.  tp>1 keeps the modular auto-sharded graph (the kernels
        # need the full hidden width).
        self._fused_wavlm = self._resolve_fused_wavlm(fused_wavlm)
        if self._fused_wavlm is not None:
            import dataclasses as _dc

            mode: Any = (
                "interpret" if self._fused_wavlm == "interpret"
                else bool(self._fused_wavlm)
            )
            geometry = dict(self.model_config.wavlm_geometry or {})
            geometry["fused_attention"] = mode
            geometry["fused_conv"] = mode
            self.model_config = _dc.replace(
                self.model_config, wavlm_geometry=geometry
            )
        self.model = build_model(self.model_config)

        template = jax.eval_shape(self._init_fn())
        variables, report = torch_state_dict_to_flax(sd, template, strict=False)
        if len(report.missing_flax_paths) > 32:
            raise RuntimeError(
                f"Too many missing keys when loading checkpoint "
                f"({len(report.missing_flax_paths)}). Checkpoint architecture "
                "does not match the runtime model."
            )
        # Missing-but-tolerated leaves keep ShapeDtypeStruct placeholders from
        # eval_shape; materialize them as zeros.
        variables = jax.tree_util.tree_map(
            lambda leaf: np.zeros(leaf.shape, np.float32)
            if isinstance(leaf, jax.ShapeDtypeStruct)
            else leaf,
            variables,
        )
        self._dequant_scales: Dict[Tuple[str, ...], np.ndarray] = {}
        if quantize_int8:
            variables = self._quantize_dense_int8(variables)
        if mesh is not None:
            from multimodalemotionrecognition_tpu.parallel.mesh import shard_params

            self.variables = shard_params(mesh, variables)
        else:
            self.variables = jax.device_put(variables)
        if fused and self.mesh is not None and self._tp > 1:
            # The full-block kernel needs the full model width per device;
            # under tensor parallelism the modular auto-sharded graph is the
            # only correct path (and the measured-faster one at throughput
            # batch anyway — RESULTS.md).
            print(
                "[WARNING] fused=True ignored under a tensor-parallel mesh; "
                "using the modular (auto-sharded) path."
            )
            fused = False
        # shard_map wraps the forward whenever Pallas kernels may be present
        # under a mesh: each device runs the kernels on its batch shard (the
        # idiomatic multi-chip Pallas pattern — a pallas_call inside a plain
        # sharded jit is NOT automatically partitioned).
        self._use_shard_map = self.mesh is not None and (
            bool(self._fused_wavlm) or fused
        )
        # One jit wrapper; XLA's own shape cache keys the per-bucket
        # executables (a per-bucket dict of jax.jit objects would be redundant).
        self._jitted_forward = jax.jit(self._wrap_sharded(self._forward, 2))
        self._blank_video_forward = None
        self._fused_forward = None
        if fused:
            from multimodalemotionrecognition_tpu.runtime.fused import (
                build_fused_xattn_forward,
                supports_fused,
            )

            if supports_fused(self.model_config):
                # Pallas compiles on TPU backends; anywhere else (CPU tests)
                # fall back to the interpreter.  int8 weights stay int8 —
                # dequantization happens inside the kernel.
                interpret = jax.default_backend() not in ("tpu", "axon")
                self._fused_forward = build_fused_xattn_forward(
                    self.model,
                    self.variables,
                    self.model_config,
                    interpret=interpret,
                    dequant_scales=self._dequant_scales,
                    dequant_fn=self._dequantize,
                )
            else:
                print(
                    "[WARNING] fused=True but checkpoint is not an xattn "
                    "model with mean/attn pooling; using the modular path."
                )

    # ------------------------------------------------------------------

    def _resolve_fused_wavlm(self, flag: Any):
        """Resolve the runner-level fused-WavLM-kernel gate.

        Returns None to leave the model's own "auto" gate in charge (the
        single-device case), or True/False/"interpret" to force the kernels
        via `wavlm_geometry` overrides.  Under a dp-only mesh, "auto"
        mirrors the in-model gate (TPU backend on, EMO_FUSED_WAVLM=0/1
        overrides) because the in-model gate would see device_count()>1 and
        stay off; the runner compensates by running the forward under
        shard_map."""
        if not self.use_wavlm:
            return None
        if flag == "auto":
            if self.mesh is None or self._tp != 1:
                return None
            import os

            env = os.environ.get("EMO_FUSED_WAVLM")
            if env is not None:
                return env == "1"
            return True if jax.default_backend() == "tpu" else None
        if flag and self.mesh is not None and self._tp != 1:
            print(
                "[WARNING] fused_wavlm ignored under a tensor-parallel mesh "
                "(the kernels need the full hidden width per device)."
            )
            return None
        return flag

    def _wrap_sharded(self, fn, n_batch_args: int):
        """shard_map wrapper: params replicated, batch args sharded over
        "data".  Identity when the modular auto-sharded jit suffices."""
        if not getattr(self, "_use_shard_map", False):
            return fn
        from jax.sharding import PartitionSpec as P

        return jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(),) + (P("data"),) * n_batch_args,
            out_specs=P("data"),
            check_vma=False,
        )

    def _example_inputs(
        self, batch: int = 1, for_init: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # init always traces with float video; the serving wire format may be
        # uint8 (device_normalize) — warmup must match it to pre-compile the
        # right executable.
        video_dtype = (
            np.uint8 if (self.device_normalize and not for_init) else np.float32
        )
        video = np.zeros((batch, 8, 3, 112, 112), video_dtype)
        if self.use_wavlm:
            audio = np.zeros((batch, 1, 48000), np.float32)
        else:
            audio = np.zeros(
                (batch, 1, self.model_config.audio_n_mels, 301), np.float32
            )
        return video, audio

    def _init_fn(self):
        video, audio = self._example_inputs(for_init=True)
        if self.fusion_mode == "audio":
            return lambda: self.model.init(jax.random.PRNGKey(0), audio)
        if self.fusion_mode == "video":
            return lambda: self.model.init(jax.random.PRNGKey(0), video)
        return lambda: self.model.init(jax.random.PRNGKey(0), video, audio)

    def _quantize_dense_int8(self, variables):
        """Weight-only int8 for 2D kernels (per-column scales).  Kernels are
        STORED as int8 (4x less HBM footprint/bandwidth) and dequantized
        inside the jitted forward, where XLA fuses convert+scale into the
        matmul — the XLA analog of ONNX/torch dynamic quantization
        (`src/export_optimized_model.py:89-104`)."""
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(variables)
        out = {}
        for path, leaf in flat.items():
            arr = np.asarray(leaf)
            if path[-1] == "kernel" and arr.ndim == 2 and min(arr.shape) >= 8:
                scale = np.maximum(np.abs(arr).max(axis=0, keepdims=True), 1e-8) / 127.0
                q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
                out[path] = q
                self._dequant_scales[path] = scale.astype(np.float32)
            else:
                out[path] = leaf
        return unflatten_dict(out)

    def _dequantize(self, variables):
        """Trace-time dequantization of int8 kernels (no-op when unquantized)."""
        if not self._dequant_scales:
            return variables
        from flax.traverse_util import flatten_dict, unflatten_dict

        flat = flatten_dict(variables)
        out = {}
        for path, leaf in flat.items():
            scale = self._dequant_scales.get(path)
            if scale is not None:
                out[path] = leaf.astype(jnp.float32) * scale
            else:
                out[path] = leaf
        return unflatten_dict(out)

    def _forward(self, variables, video, audio):
        if audio.dtype == jnp.int16:
            # int16 PCM wire format (lossless for 16-bit uploads): half the
            # host->device audio bytes, dequantized on-device.
            audio = audio.astype(jnp.float32) / 32768.0
        if video.dtype == jnp.uint8:
            from multimodalemotionrecognition_tpu.config import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 1, 3, 1, 1)
            std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 1, 3, 1, 1)
            video = (video.astype(jnp.float32) / 255.0 - mean) / std
        # NB: variables are an explicit argument, NOT a closure capture —
        # closed-over arrays get embedded as constants in the HLO, which
        # bloats (re)compiles by the full parameter size (observed: remote
        # compile payloads >100 MB, HTTP 413 on the tunneled compiler).
        if self._fused_forward is not None:
            return self._fused_forward(variables, video, audio)
        variables = self._dequantize(variables)
        if self.fusion_mode == "audio":
            out = self.model.apply(variables, audio)
        elif self.fusion_mode == "video":
            out = self.model.apply(variables, video)
        else:
            out = self.model.apply(variables, video, audio)
        if isinstance(out, tuple):
            out = out[0]
        # Late fusion already returns probabilities (`src/optimized_runtime.py:107`).
        if self.fusion_mode == "late":
            return out
        return jax.nn.softmax(out, axis=1)

    # ------------------------------------------------------------------

    def _put_batch(self, arr) -> jnp.ndarray:
        """Host array -> device, batch dim sharded over the mesh "data" axis
        when a mesh is set (each chip receives only its rows); pre-staged
        device arrays pass through untouched."""
        if isinstance(arr, jax.Array):
            return arr
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(arr, NamedSharding(self.mesh, P("data")))

    def _pad_to_bucket(self, videos, audios):
        """Bucket-pad host arrays; -> (videos, audios, n)."""
        videos = np.asarray(videos)
        if not (self.device_normalize and videos.dtype == np.uint8):
            videos = videos.astype(np.float32)
        audios = np.asarray(audios)
        if audios.dtype != np.int16:
            audios = audios.astype(np.float32)
        n = videos.shape[0] if self.fusion_mode != "audio" else audios.shape[0]
        bucket = _bucket_for(n, self.batch_buckets)
        if n != bucket:
            videos = np.concatenate(
                [videos, np.zeros((bucket - n,) + videos.shape[1:], videos.dtype)]
            )
            audios = np.concatenate(
                [audios, np.zeros((bucket - n,) + audios.shape[1:], audios.dtype)]
            )
        return videos, audios, n

    def stage(self, videos, audios) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        """Bucket-pad and START the host->device transfer without waiting.

        The transfer through the link (95 ms for a b32 int16-audio batch on
        the tunneled chip — ~86% of the serving infer stage, measured) then
        overlaps whatever runs next; pass the result to `predict_probs`.
        Serving's pipelined batcher stages batch N+1 in the preprocess stage
        so its transfer rides under batch N's device compute."""
        videos, audios, n = self._pad_to_bucket(videos, audios)
        return self._put_batch(videos), self._put_batch(audios), n

    def stage_audio(self, audios) -> Tuple[jnp.ndarray, int]:
        """`stage` for blank-video (audio-only) batches."""
        audios = np.asarray(audios)
        if audios.dtype != np.int16:
            audios = audios.astype(np.float32)
        n = audios.shape[0]
        bucket = _bucket_for(n, self.batch_buckets)
        if n != bucket:
            audios = np.concatenate(
                [audios, np.zeros((bucket - n,) + audios.shape[1:], audios.dtype)]
            )
        return self._put_batch(audios), n

    def predict_probs(
        self, videos, audios, n: Optional[int] = None
    ) -> np.ndarray:
        """[B,...] inputs -> [B, num_classes] probabilities (host numpy).

        Audio may arrive as int16 PCM (dequantized on-device).  Inputs may be
        pre-staged device arrays from `stage` (pass its `n`); host arrays are
        padded and transferred here."""
        if n is None:
            videos, audios, n = self._pad_to_bucket(videos, audios)
        probs = self._jitted_forward(
            self.variables, self._put_batch(videos), self._put_batch(audios)
        )
        return np.asarray(probs)[:n]

    def predict_probs_blank_video(
        self, audios, n: Optional[int] = None
    ) -> np.ndarray:
        """Audio-only batches (e.g. bare .wav uploads): the all-zeros video
        tensor is materialized ON DEVICE instead of shipping ~300 KB/clip of
        zeros through the host->device link.  `audios` may be pre-staged by
        `stage_audio` (pass its `n`)."""
        if n is None:
            audios, n = self.stage_audio(audios)
        if self._blank_video_forward is None:
            video_dtype = jnp.uint8 if self.device_normalize else jnp.float32

            def forward_blank(variables, audio):
                video = jnp.zeros(
                    (audio.shape[0], 8, 3, 112, 112), video_dtype
                )
                if video_dtype == jnp.float32:
                    from multimodalemotionrecognition_tpu.config import (
                        IMAGENET_MEAN,
                        IMAGENET_STD,
                    )

                    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 1, 3, 1, 1)
                    std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 1, 3, 1, 1)
                    video = jnp.broadcast_to(-mean / std, video.shape)
                return self._forward(variables, video, audio)

            self._blank_video_forward = jax.jit(
                self._wrap_sharded(forward_blank, 1)
            )
        probs = self._blank_video_forward(self.variables, self._put_batch(audios))
        return np.asarray(probs)[:n]

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile the bucket executables (first TPU compile is slow)."""
        for b in buckets or self.batch_buckets:
            video, audio = self._example_inputs(b)
            np.asarray(
                self._jitted_forward(
                    self.variables, self._put_batch(video), self._put_batch(audio)
                )
            )
