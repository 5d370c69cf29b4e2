from multimodalemotionrecognition_tpu.runtime.runner import JaxModelRunner

__all__ = ["JaxModelRunner"]
