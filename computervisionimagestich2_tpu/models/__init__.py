from . import blender, compose, equalization, matcher, ransac, sift, stitcher, transfer  # noqa: F401
