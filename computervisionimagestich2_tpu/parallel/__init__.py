from .batched import (  # noqa: F401
    batched_pairwise_register,
    batched_project_and_extract,
    batched_stitch_chain,
    shard_batch,
)
from .blend import (  # noqa: F401
    sharded_blend_two_images,
    sharded_composite_and_blend,
)
from .mesh import make_mesh  # noqa: F401
from .spatial import sharded_gaussian_blur  # noqa: F401
