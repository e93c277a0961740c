from . import distance, gaussian, resize, solve, warp  # noqa: F401
