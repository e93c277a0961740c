from . import bmp  # noqa: F401
from .io import load_image, save_image  # noqa: F401
