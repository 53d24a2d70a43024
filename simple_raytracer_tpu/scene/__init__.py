from . import transforms
from .obj_loader import MeshData, TextureRegistry, load_obj
from .scene import Scene, SceneManager

__all__ = ["transforms", "MeshData", "TextureRegistry", "load_obj",
           "Scene", "SceneManager"]
