from . import (
    aggregates,
    cleaning,
    dedup,
    features,
    joins,
    multimodal,
    similarity,
    textstats,
)

__all__ = [
    "aggregates",
    "cleaning",
    "dedup",
    "features",
    "joins",
    "multimodal",
    "similarity",
    "textstats",
]
