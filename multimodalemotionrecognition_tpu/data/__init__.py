from multimodalemotionrecognition_tpu.data.ravdess import (
    EMOTION_ID_TO_NAME,
    PairRecord,
    build_pairs,
    map_emotion_label,
    parse_ravdess_name,
    save_pairs_csv,
    split_pairs_by_actor,
    split_pairs_stratified,
)

__all__ = [
    "EMOTION_ID_TO_NAME",
    "PairRecord",
    "build_pairs",
    "map_emotion_label",
    "parse_ravdess_name",
    "save_pairs_csv",
    "split_pairs_by_actor",
    "split_pairs_stratified",
]
