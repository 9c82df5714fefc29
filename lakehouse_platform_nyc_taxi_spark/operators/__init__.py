from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
