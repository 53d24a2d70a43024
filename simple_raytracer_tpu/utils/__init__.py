from .vma import match_vma, pad_rays

__all__ = ["match_vma", "pad_rays"]
