from echo_chambers_detection_spark.functions.cleaning import (
    clean_unknown,
    deterministic_id,
    presence_filter,
)
from echo_chambers_detection_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    squared_l2_distance,
)

__all__ = [
    "clean_unknown",
    "deterministic_id",
    "presence_filter",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_normalize",
    "squared_l2_distance",
]
