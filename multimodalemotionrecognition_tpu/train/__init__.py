from multimodalemotionrecognition_tpu.train.freeze import (
    label_params,
    trainable_mask,
)
from multimodalemotionrecognition_tpu.train.trainer import EmotionTrainer, TrainState

__all__ = ["label_params", "trainable_mask", "EmotionTrainer", "TrainState"]
