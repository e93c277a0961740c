from .batched import (  # noqa: F401
    batched_pairwise_register,
    batched_project_and_extract,
    shard_batch,
)
from .blend import sharded_blend_two_images  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from .spatial import sharded_gaussian_blur  # noqa: F401
