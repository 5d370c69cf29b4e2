"""Unified configuration schema.

One dataclass family serves the three roles the reference spreads over argparse
flags (`src/train.py:473-672`), env-var dataclasses
(`src/inference_server.py:39-50`, `src/inference_worker.py:23-43`,
`backend/app/config.py`), and the checkpoint-embedded config dict
(`src/train.py:697-720`).  `ModelConfig.to_checkpoint_dict()` emits exactly the
reference's checkpoint config keys so checkpoints interoperate.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

# 8-class RAVDESS labels (reference backend/app/config.py:35-44).
EMOTION_LABELS_8 = [
    "neutral",
    "calm",
    "happy",
    "sad",
    "angry",
    "fearful",
    "disgust",
    "surprised",
]
# 4-class grouping (reference src/data/ravdess.py:189-202, src/optimized_runtime.py:13-14).
EMOTION_LABELS_4 = ["neutral_calm", "positive", "negative", "surprise"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def labels_for(num_classes: int) -> Sequence[str]:
    if num_classes == 8:
        return EMOTION_LABELS_8
    if num_classes == 4:
        return EMOTION_LABELS_4
    raise ValueError("num_classes must be 8 or 4")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters.

    Field names/defaults mirror the reference checkpoint config
    (`src/train.py:697-720`) plus a few structural constants the reference
    hardcodes (common_dim=256 at `src/models/fusion.py:194`, audio
    embedding_dim=128 at `src/models/audio.py:161`).
    """

    num_classes: int = 8
    fusion: str = "xattn"
    use_wavlm: bool = False
    xattn_head: str = "concat"
    xattn_d_model: int = 128
    xattn_heads: int = 4
    xattn_attn_dropout: float = 0.1
    xattn_stochastic_depth: float = 0.1
    xattn_use_emotion_prior: bool = False
    xattn_emotion_prior_dim: int = 8
    xattn_emotion_prior_hidden_dim: int = 64
    xattn_emotion_prior_dropout: float = 0.1
    temporal_pooling: str = "mean"
    temporal_num_heads: int = 4
    temporal_num_layers: int = 1
    temporal_dropout: float = 0.1
    audio_n_mels: int = 64
    use_resnet_audio: bool = True
    fusion_align_mode: str = "none"
    fusion_align_dim: int = 256
    fusion_align_temperature: float = 0.07
    fusion_align_weight: float = 0.1
    # Structural constants (hardcoded in the reference model code).
    common_dim: int = 256
    audio_embedding_dim: int = 128
    wavlm_hidden_size: int = 768
    # Optional WavLMConfig field overrides (hidden_size, num_hidden_layers,
    # conv_dim, ...).  None = microsoft/wavlm-base geometry (the reference's,
    # `src/models/wavlm_audio.py:30-41`).  Saved additively in the checkpoint
    # config so non-base WavLM checkpoints reconstruct without flags.
    wavlm_geometry: Optional[Dict[str, Any]] = None
    # Train-path fused kernels for the frozen WavLM prefix (set by the
    # trainer from the freeze policy — see train/freeze.py::
    # wavlm_frozen_prefix; NOT part of the checkpoint config: it describes a
    # training run, not the architecture).  wavlm_geometry keys of the same
    # name take precedence (explicit test/user control).
    wavlm_fused_train_layers: int = 0
    wavlm_fused_train_conv: bool = False
    spec_augment: bool = True
    # Compute dtype for the forward pass ("float32" | "bfloat16"). Params stay fp32.
    compute_dtype: str = "float32"

    # --- checkpoint config interop (reference src/train.py:697-720) ---

    _CHECKPOINT_KEYS = (
        "fusion",
        "use_wavlm",
        "xattn_head",
        "xattn_d_model",
        "xattn_heads",
        "xattn_attn_dropout",
        "xattn_stochastic_depth",
        "xattn_use_emotion_prior",
        "xattn_emotion_prior_dim",
        "xattn_emotion_prior_hidden_dim",
        "xattn_emotion_prior_dropout",
        "temporal_pooling",
        "temporal_num_heads",
        "temporal_num_layers",
        "temporal_dropout",
        "audio_n_mels",
        "use_resnet_audio",
        "fusion_align_mode",
        "fusion_align_dim",
        "fusion_align_temperature",
        "fusion_align_weight",
    )

    def to_checkpoint_dict(self) -> Dict[str, Any]:
        """Serialize to the reference's checkpoint `config` dict format."""
        out = {k: getattr(self, k) for k in self._CHECKPOINT_KEYS}
        if self.wavlm_geometry is not None:  # additive, absent in reference
            out["wavlm_geometry"] = dict(self.wavlm_geometry)
        return out

    @classmethod
    def from_checkpoint_dict(
        cls, config: Mapping[str, Any], num_classes: int = 8, **overrides: Any
    ) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in dict(config).items() if k in known}
        kwargs["num_classes"] = num_classes
        kwargs.update(overrides)
        return cls(**kwargs)

    @property
    def canonical_fusion(self) -> str:
        """Resolve the `xattn_concat` / `xattn_gated` aliases (src/train.py:449-453)."""
        if self.fusion in {"xattn_concat", "xattn_gated"}:
            return "xattn"
        return self.fusion

    @property
    def resolved_xattn_head(self) -> str:
        if self.fusion == "xattn_concat":
            return "concat"
        if self.fusion == "xattn_gated":
            return "gated"
        return self.xattn_head

    @property
    def effective_audio_n_mels(self) -> int:
        """WavLM replaces n_mels with its hidden size (src/train.py:462)."""
        if self.use_wavlm:
            return int(
                (self.wavlm_geometry or {}).get("hidden_size", self.wavlm_hidden_size)
            )
        return self.audio_n_mels


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Audio preprocessing constants (reference backend/app/config.py:9-15)."""

    sample_rate: int = 16000
    duration_sec: float = 3.0
    n_mels: int = 64
    win_length: int = 400
    hop_length: int = 160
    n_fft: int = 400

    @property
    def target_len(self) -> int:
        return int(self.sample_rate * self.duration_sec)

    @property
    def num_frames(self) -> int:
        # center=True STFT framing (torchaudio semantics).
        return 1 + self.target_len // self.hop_length


@dataclasses.dataclass(frozen=True)
class VideoConfig:
    """Video preprocessing constants (reference backend/app/config.py:9-12)."""

    num_frames: int = 8
    size: int = 112
    face_crop: bool = True
    face_pad_ratio: float = 0.3


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_root: str = "data"
    num_classes: int = 8
    split_mode: str = "stratified"  # "actor" | "stratified"
    train_actors: Tuple[int, ...] = tuple(range(1, 19))
    val_actors: Tuple[int, ...] = (19, 20, 21)
    test_actors: Tuple[int, ...] = (22, 23, 24)
    train_ratio: float = 0.7
    val_ratio: float = 0.15
    seed: int = 42
    vocal_channel: int = 1
    use_wavlm: bool = False
    train_augment: bool = True
    use_face_crop: bool = True
    noise_wav: str = "data/Noise/noise.wav"
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    video: VideoConfig = dataclasses.field(default_factory=VideoConfig)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference src/train.py:473-672 defaults)."""

    epochs: int = 20
    batch_size: int = 16
    lr: float = 1e-3
    seed: int = 42
    weight_decay: float = 1e-4
    label_smoothing: float = 0.0
    early_stopping_patience: int = 10
    use_cosine_annealing: bool = False
    cosine_stage2_only: bool = False
    two_stage_training: bool = False
    stage1_epochs: int = 5
    audio_backbone_lr: float = 1e-5
    video_backbone_lr: float = 1e-5
    backbone_lr: float = 3e-5  # WavLM single-modality stage-2 backbone LR
    wavlm_stage: int = 1
    fusion_unfreeze_wavlm_layers: int = 2
    fusion_unfreeze_video_blocks: int = 1
    fusion_unfreeze_audio: bool = True
    audio_ckpt: str = ""
    video_ckpt: str = ""
    output_dir: str = "outputs"
    wandb: bool = False
    # TPU-specific
    donate_buffers: bool = True
    # Video wire format between the host loader and the jitted step.
    # "uint8" ships post-blur uint8 pixels + per-sample (brightness, noise
    # sigma) scalars and replays the reference's float augmentation tail on
    # device (4x less H2D traffic, exact semantics — see
    # data.media.load_video_frames_u8); "float32" ships host-augmented
    # normalized frames.  "auto" = uint8 on TPU, float32 elsewhere.
    video_wire: str = "auto"
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = all devices on "data"
    # Rematerialize the forward during backprop (jax.checkpoint): trades
    # extra FLOPs for an activation-memory cut — lets batch sizes grow past
    # HBM limits.  False/"off" = disabled; True/"full" = checkpoint the whole forward
    # (max cut, ~1.3x FLOPs); "dots" = policy
    # jax.checkpoint_policies.checkpoint_dots — keep matmul/conv outputs,
    # recompute only elementwise/norm glue (small cut, ~zero extra MXU
    # work; the XLA-idiomatic middle ground).  Measured: bench_remat.py.
    remat: object = False
    # Gradient accumulation: split each batch into `grad_accum` equal
    # microbatches, run them sequentially under lax.scan (only ONE
    # microbatch's activations live at a time), combine gradients exactly
    # (valid-count weighting reproduces the full-batch classification
    # gradient), and apply ONE optimizer step.  Extends effective batch
    # beyond HBM: the b256 all-trainable step plans >16 G in every remat
    # mode (bench_remat r5), but 2x128 accumulation fits.  Standard
    # grad-accum caveats apply: BatchNorm statistics are per-microbatch,
    # and batch-level losses (CLIP alignment InfoNCE) see microbatch
    # negatives (combined as the mean over microbatches).
    grad_accum: int = 1
    # PRNG implementation for the per-step stochastic streams (dropout,
    # drop-path, modality dropout, SpecAugment, span masking, layerdrop).
    # "threefry" is JAX's default counter-based PRNG: identical bits on any
    # backend/topology, but ~470M mask draws per flagship step cost real VPU
    # time.  "rbg" keeps threefry for key split/fold_in and generates the
    # mask BITS with XLA's hardware RngBitGenerator — measured ~2x cheaper
    # training-mode forward overhead on TPU.  Bits then differ across
    # backends/shardings (dropout DISTRIBUTION is unchanged — the same
    # tradeoff MaxText ships with unsafe_rbg); anything asserting
    # cross-topology step equivalence should pin "threefry".
    # "auto" = rbg on TPU, threefry elsewhere.
    rng_impl: str = "auto"
    # Optimizer-update layout.  The live (ever-trainable) sub-tree holds
    # O(100) leaves; running Adam per leaf emits hundreds of tiny elementwise
    # kernels whose launch/fusion-boundary overhead dwarfs the actual HBM
    # traffic (measured 11.6 ms vs ~1 ms roofline at flagship stage-2 b64).
    # "flat" concatenates the live leaves into ONE f32 buffer, runs the whole
    # Adam + weight-decay + LR/mask chain as a single fused pass, and slices
    # the results back — same scalar ops in the same order.  Given identical
    # gradients the layouts agree to a few ulps; end-to-end the layout also
    # changes how XLA fuses the BACKWARD, and Adam amplifies that rounding on
    # near-zero-grad elements to ~lr*1e-2-scale param drift per step on a
    # handful of params (machine-dependent; see trainer.masked_adam_update
    # and TestFlatOptimizer for the quantified bound).
    # TrainState/opt_state layout is unchanged.
    # "auto" = flat on a single-device mesh, per-leaf otherwise (flat concat
    # would force all-gathers on TP-sharded params); "on"/"off" force it.
    flat_optimizer: str = "auto"


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Serving knobs; env var names kept from the reference
    (`src/inference_server.py:39-50`, `src/inference_worker.py:23-43`)."""

    host: str = "0.0.0.0"
    port: int = 8000
    batch_size: int = 8
    batch_timeout_ms: float = 20.0
    poll_interval_ms: float = 50.0
    predict_timeout_sec: float = 60.0
    result_ttl_sec: int = 3600
    payload_ttl_sec: int = 600
    queue_name: str = "emo:inference:queue"
    task_prefix: str = "emo:task:"
    worker_name: str = "worker-1"
    # When set, the queued API becomes a multi-host *gateway*: tasks go over
    # Redis (RPUSH/HSET, reference `src/inference_server.py:69-89`) to remote
    # RedisWorker hosts instead of the in-process batcher.
    redis_url: Optional[str] = None
    checkpoint_path: str = "checkpoints/best.pt"
    mock: bool = False
    # "float32" preserves reference logit parity; "bfloat16" for TPU speed.
    compute_dtype: str = "float32"
    # Fused Pallas cross-attention inference path for xattn checkpoints.
    fused_xattn: bool = False
    # uint8 video wire format with on-device normalization.
    device_normalize: bool = True
    # int16 PCM audio wire format for WavLM (lossless for 16-bit uploads).
    audio_int16_wire: bool = True
    # XLA static-shape batch buckets for the dynamic batcher.
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8)
    # Multi-chip inference: (data, model) mesh shape, e.g. (8, 1) to shard
    # request batches over 8 chips.  None = single device (the default;
    # matches the reference's single-device worker).
    mesh_shape: Optional[Tuple[int, int]] = None
    # Streaming (backend/app/config.py:16-19)
    stream_window_sec: float = 3.0
    stream_step_sec: float = 0.5
    stream_max_buffer_sec: float = 6.0

    @classmethod
    def from_env(cls) -> "ServeConfig":
        return cls(
            host=_env("EMO_API_HOST", "0.0.0.0"),
            port=int(_env("EMO_API_PORT", "8000")),
            batch_size=int(_env("EMO_BATCH_SIZE", "8")),
            batch_timeout_ms=float(_env("EMO_BATCH_TIMEOUT_MS", "20")),
            poll_interval_ms=float(_env("EMO_POLL_INTERVAL_MS", "50")),
            predict_timeout_sec=float(_env("EMO_PREDICT_TIMEOUT_SEC", "60")),
            result_ttl_sec=int(_env("EMO_RESULT_TTL_SEC", "3600")),
            payload_ttl_sec=int(_env("EMO_PAYLOAD_TTL_SEC", "600")),
            queue_name=_env("EMO_QUEUE_NAME", "emo:inference:queue"),
            task_prefix=_env("EMO_TASK_PREFIX", "emo:task:"),
            worker_name=_env("EMO_WORKER_NAME", "worker-1"),
            redis_url=_env("EMO_REDIS_URL", "") or None,
            checkpoint_path=_env("CHECKPOINT_PATH", "checkpoints/best.pt"),
            mock=_env("EMO_MOCK", "0") == "1",
            compute_dtype=_env("EMO_COMPUTE_DTYPE", "float32"),
            fused_xattn=_env("EMO_FUSED_XATTN", "0") == "1",
            device_normalize=_env("EMO_DEVICE_NORMALIZE", "1") == "1",
            audio_int16_wire=_env("EMO_AUDIO_INT16_WIRE", "1") == "1",
            mesh_shape=_parse_mesh_shape(_env("EMO_MESH_SHAPE", "")),
        )

    def make_mesh(self):
        """Build the inference mesh from `mesh_shape` (None when unset).
        Uses the first dp*tp devices so a sub-slice mesh works on any host."""
        if self.mesh_shape is None:
            return None
        import jax

        from multimodalemotionrecognition_tpu.parallel.mesh import make_mesh

        dp, tp = self.mesh_shape
        return make_mesh((dp, tp), devices=jax.devices()[: dp * tp])


def _parse_mesh_shape(spec: str) -> Optional[Tuple[int, int]]:
    """"8" -> (8, 1); "4,2" / "4x2" -> (4, 2); "" -> None."""
    spec = spec.strip()
    if not spec:
        return None
    parts = [p for p in spec.replace("x", ",").split(",") if p.strip()]
    if len(parts) == 1:
        return (int(parts[0]), 1)
    if len(parts) == 2:
        return (int(parts[0]), int(parts[1]))
    raise ValueError(f"EMO_MESH_SHAPE must be 'dp' or 'dp,tp', got {spec!r}")
