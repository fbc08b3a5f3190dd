from . import dedup, events, joins, multimodal, pipeline, sampling, similarity, text

__all__ = [
    "dedup", "events", "joins", "multimodal", "pipeline", "sampling", "similarity", "text",
]
