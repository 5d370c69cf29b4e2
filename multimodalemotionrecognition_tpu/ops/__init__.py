"""Device-side ops: XLA-friendly preprocessing and compute kernels."""

from multimodalemotionrecognition_tpu.ops.mel import (
    amplitude_to_db,
    log_mel_spectrogram,
    mel_filterbank,
    mel_spectrogram,
)
from multimodalemotionrecognition_tpu.ops.image import (
    adaptive_avg_pool_2d,
    imagenet_normalize,
    resize_bilinear,
    uniform_frame_indices,
)
from multimodalemotionrecognition_tpu.ops.stochastic import (
    drop_path,
    mix_noise_snr,
    modality_dropout_mask,
    spec_augment,
)

__all__ = [
    "amplitude_to_db",
    "log_mel_spectrogram",
    "mel_filterbank",
    "mel_spectrogram",
    "adaptive_avg_pool_2d",
    "imagenet_normalize",
    "resize_bilinear",
    "uniform_frame_indices",
    "drop_path",
    "mix_noise_snr",
    "modality_dropout_mask",
    "spec_augment",
]
