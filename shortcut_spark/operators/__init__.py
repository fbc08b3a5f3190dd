from . import (
    dedup, events, graph, joins, multimodal, pipeline, sampling, similarity, sketch, text,
    validation,
)

__all__ = [
    "dedup", "events", "graph", "joins", "multimodal", "pipeline", "sampling",
    "similarity", "sketch", "text", "validation",
]
