from . import (
    cluster, dedup, events, graph, joins, multimodal, pipeline, sampling, similarity,
    sketch, text, validation,
)

__all__ = [
    "cluster", "dedup", "events", "graph", "joins", "multimodal", "pipeline",
    "sampling", "similarity", "sketch", "text", "validation",
]
