from . import curate, dedup, multimodal, similarity, text

__all__ = ["curate", "dedup", "multimodal", "similarity", "text"]
