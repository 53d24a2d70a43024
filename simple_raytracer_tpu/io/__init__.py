from .image import write_bmp, write_png, save_image

__all__ = ["write_bmp", "write_png", "save_image"]
