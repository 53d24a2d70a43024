from . import tiled

__all__ = ["tiled"]
