from . import (
    dedup,
    graph,
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
    "graph",
    "multimodal",
    "profile",
    "sampling",
    "similarity",
    "skew",
    "temporal",
    "text",
]
