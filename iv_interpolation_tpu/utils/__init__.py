"""Shared utilities: static-shape padding schedules, bucketing, and time
conversion.

These are THE definitions — ``pipeline.ingest`` and ``parallel.mesh``
import from here (they are the hot consumers; keeping the helpers in a
leaf module breaks an ingest<->mesh import knot). The padding schedules
are the static-shape answer to the reference's dynamic greedy
bin-packing (src/interpolation/optimized_batch_processor.py:123-164):
XLA compiles one executable per distinct shape, so batch/length dims
quantise to a small geometric ladder instead of exact sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def to_epoch_minutes(ts) -> np.ndarray:
    """Timestamps (pd.Series) -> int64 epoch minutes (floor)."""
    import pandas as pd
    vals = pd.to_datetime(ts).astype("datetime64[ns]").astype(np.int64)
    return vals // (60 * 1_000_000_000)


def choose_bucket(length: int, bucket_sizes: Sequence[int]) -> Optional[int]:
    """Smallest configured bucket >= length (None if too long)."""
    for b in sorted(bucket_sizes):
        if length <= b:
            return b
    return None


def batch_pad(n: int, max_batch: int) -> int:
    """Pad a chunk's batch dim to a geometric schedule so XLA sees a small
    fixed set of shapes (a ragged final chunk would otherwise force a full
    recompile per distinct remainder — 1-2 min each on this runtime)."""
    b = 16
    while b < n and b < max_batch:
        b *= 2
    return min(b, max_batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``n`` (batch padding so shards are
    equal — the static-shape version of the reference's greedy bin-packing
    at optimized_batch_processor.py:123-164)."""
    return ((n + m - 1) // m) * m
