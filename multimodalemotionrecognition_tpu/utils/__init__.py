from multimodalemotionrecognition_tpu.utils.metrics import accuracy, confusion_matrix, macro_f1
from multimodalemotionrecognition_tpu.utils.seed import set_seed

__all__ = ["accuracy", "confusion_matrix", "macro_f1", "set_seed"]
