"""Shared utilities: padding/bucketing and time conversion."""
from iv_interpolation_tpu.parallel.mesh import pad_to_multiple  # noqa: F401
from iv_interpolation_tpu.pipeline.ingest import (  # noqa: F401
    batch_pad,
    choose_bucket,
    to_epoch_minutes,
)
