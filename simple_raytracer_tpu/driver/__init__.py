from .animation import render_turntable, frames_parallel

__all__ = ["render_turntable", "frames_parallel"]
