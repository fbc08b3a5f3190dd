from . import dedup, events, joins, multimodal, pipeline, similarity, text

__all__ = ["dedup", "events", "joins", "multimodal", "pipeline", "similarity", "text"]
