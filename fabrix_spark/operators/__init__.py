from . import (
    dedup,
    multimodal,
    profile,
    sampling,
    similarity,
    skew,
    temporal,
    text,
)

__all__ = [
    "dedup",
    "multimodal",
    "profile",
    "sampling",
    "similarity",
    "skew",
    "temporal",
    "text",
]
