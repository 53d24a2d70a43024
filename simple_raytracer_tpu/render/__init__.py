from . import integrator
from .renderer import render, render_flat, render_radiance

__all__ = ["integrator", "render", "render_flat", "render_radiance"]
