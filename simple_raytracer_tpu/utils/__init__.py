from .vma import match_vma

__all__ = ["match_vma"]
