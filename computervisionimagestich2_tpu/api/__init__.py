from .compat import ImageProcess, Projection, equalization, transfer  # noqa: F401
