"""Device-mesh scaling: the TPU-native replacement for the reference's
ProcessPoolExecutor symbol parallelism (SURVEY.md §2 row 24)."""

from iv_interpolation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    surface_batch_sharding,
)
