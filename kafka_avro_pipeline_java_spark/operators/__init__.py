from . import asof, dedup, multimodal, similarity

__all__ = ["asof", "dedup", "multimodal", "similarity"]
