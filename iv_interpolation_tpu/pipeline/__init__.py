"""Pipeline orchestration: storage adapters, ingest/bucketing, stage
runners, run-manifest checkpointing (reference L5/L4 layers, SURVEY.md §1)."""

from iv_interpolation_tpu.pipeline.storage import (  # noqa: F401
    MemoryStore,
    ParquetStore,
    get_store,
)
from iv_interpolation_tpu.pipeline.manifest import RunManifest  # noqa: F401
from iv_interpolation_tpu.pipeline.runner import PipelineRunner  # noqa: F401
