from .bvh import FlatBVHHost, build_bvh, concat_bvhs, triangle_blocks
from .prepared import PreparedScene, prepare
from . import traverse

__all__ = ["FlatBVHHost", "build_bvh", "concat_bvhs", "triangle_blocks",
           "PreparedScene", "prepare", "traverse"]
