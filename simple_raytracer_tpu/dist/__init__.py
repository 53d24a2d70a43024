from .sharding import (make_mesh, render_sharded, render_radiance_sharded)
from .ring import ring_nearest_hit, render_flat_ring
from .train import DiffParams, make_train_step, extract_params, apply_params

__all__ = [
    "make_mesh", "render_sharded", "render_radiance_sharded",
    "ring_nearest_hit", "render_flat_ring",
    "DiffParams", "make_train_step", "extract_params", "apply_params",
]
