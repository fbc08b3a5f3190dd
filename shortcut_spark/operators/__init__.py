from . import (
    cluster, dedup, events, graph, joins, multimodal, pipeline, sampling, similarity,
    sketch, text, validation, vector_index,
)

__all__ = [
    "cluster", "dedup", "events", "graph", "joins", "multimodal", "pipeline",
    "sampling", "similarity", "sketch", "text", "validation", "vector_index",
]
