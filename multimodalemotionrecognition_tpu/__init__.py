"""TPU-native multimodal emotion recognition framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
reference audio-visual emotion recognition system
(Wionerlol/MultimodalEmotionRecognition): 8-class emotion recognition over
paired RAVDESS 3-second clips, with ResNet18 frame encoding, WavLM-base speech
encoding, four fusion heads (late / concat / gated / bidirectional
cross-attention with an optional emotion-prior attention bias), noise-curriculum
and face-crop augmentation, two-stage finetuning, checkpoint-compatible
import/export against the reference's PyTorch checkpoints, and a serving stack
with a dynamic batcher.

Layout:
    ops/       device-side kernels: mel, image, attention, stochastic regularizers
    models/    Flax model zoo (audio, video, wavlm, temporal pooling, fusion)
    data/      RAVDESS pairing/splits + host media pipeline
    convert/   PyTorch checkpoint <-> Flax params converters
    train/     optax training harness (two-stage finetune, layered LRs)
    parallel/  mesh/sharding utilities (data-parallel pjit over TPU slices)
    serving/   dynamic batcher, predictor, streaming sessions, HTTP APIs
    runtime/   model runners (fp32 / bf16 / int8) and export
    utils/     metrics, seeding
"""

from multimodalemotionrecognition_tpu.version import __version__

__all__ = ["__version__"]
