from multimodalemotionrecognition_tpu.convert.torch_import import (
    ConversionReport,
    flax_to_torch_state_dict,
    load_reference_checkpoint,
    torch_state_dict_to_flax,
)
from multimodalemotionrecognition_tpu.convert.signature import (
    checkpoint_uses_wavlm,
    infer_model_signature,
)

__all__ = [
    "ConversionReport",
    "flax_to_torch_state_dict",
    "load_reference_checkpoint",
    "torch_state_dict_to_flax",
    "checkpoint_uses_wavlm",
    "infer_model_signature",
]
