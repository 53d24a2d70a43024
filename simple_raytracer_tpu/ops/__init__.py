from . import camera, intersect, shading

__all__ = ["camera", "intersect", "shading"]
