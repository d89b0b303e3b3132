"""Candle aggregation as segment reductions — the Task-2 compute core.

TPU-native replacement for the reference's pandas groupby aggregation
(src/candle_reconstruction/core.py:36-106): 1-minute OHLCV bars are
bucketed by ``floor(timestamp / target_frequency)`` and reduced with
open=first / high=max / low=min / close=last / volume=sum, then buckets
with fewer than ``min_count`` source bars are dropped
(core.py:85-89 — "incomplete bucket" filter).

Design: instead of a hash-based groupby, timestamps are integer minutes so
the bucket id is pure arithmetic, and the reduction is ``jax.ops.segment_*``
over a static number of segments — one fused XLA computation per column,
vmappable over symbols. ``first``/``last`` are segment-argmin/argmax over
the in-bucket time index, realised as segment_min/max over an encoded
(time, position) key to stay gather-light.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Candles(NamedTuple):
    """A batch of candles on a dense bucket grid (device-resident)."""

    open: jax.Array
    high: jax.Array
    low: jax.Array
    close: jax.Array
    volume: jax.Array
    count: jax.Array  # source bars per bucket
    valid: jax.Array  # bool — bucket complete & non-empty


@partial(jax.jit, static_argnames=("num_segments", "min_count"))
def aggregate_ohlcv(minutes: jax.Array, o: jax.Array, h: jax.Array,
                    l: jax.Array, c: jax.Array, v: jax.Array,
                    valid: jax.Array, bucket_minutes: jax.Array,
                    base_bucket: jax.Array, *, num_segments: int,
                    min_count: int) -> Candles:
    """Aggregate 1-minute bars into ``bucket_minutes``-minute candles.

    Args:
      minutes: ``(L,)`` int — bar timestamps in epoch minutes.
      o/h/l/c/v: ``(L,)`` float — OHLCV columns.
      valid: ``(L,)`` bool — padding / missing-bar mask.
      bucket_minutes: scalar int — target frequency (e.g. 5).
      base_bucket: scalar int — bucket id of the first output slot
        (``floor(first_minute / bucket_minutes)``), so output slot ``j``
        covers epoch bucket ``base_bucket + j``.
      num_segments: static output length.
      min_count: static incomplete-bucket threshold (reference
        ``frequency_minutes``, core.py:88).

    Returns:
      :class:`Candles` with arrays of shape ``(num_segments,)``.
    """
    seg = (minutes // bucket_minutes - base_bucket).astype(jnp.int32)
    in_range = (seg >= 0) & (seg < num_segments)
    ok = valid & in_range
    seg = jnp.where(ok, seg, num_segments)  # park invalid in overflow slot
    ns = num_segments + 1

    big = jnp.asarray(jnp.finfo(h.dtype).max, h.dtype)
    high = jax.ops.segment_max(jnp.where(ok, h, -big), seg, num_segments=ns)
    low = jax.ops.segment_min(jnp.where(ok, l, big), seg, num_segments=ns)
    volume = jax.ops.segment_sum(jnp.where(ok, v, 0.0), seg, num_segments=ns)
    count = jax.ops.segment_sum(ok.astype(jnp.int32), seg, num_segments=ns)

    # first/last via in-bucket row order: rows are time-sorted, so the
    # first/last row position in a bucket is the first/last bar. Using the
    # row position (not the minute offset) keeps this correct when several
    # rows share a timestamp (e.g. multiple ticks within one minute).
    offset = jax.lax.broadcasted_iota(jnp.int32, (minutes.shape[-1], 1),
                                      0).squeeze(-1)
    bigi = jnp.iinfo(jnp.int32).max
    first_off = jax.ops.segment_min(jnp.where(ok, offset, bigi), seg,
                                    num_segments=ns)
    last_off = jax.ops.segment_max(jnp.where(ok, offset, -1), seg,
                                   num_segments=ns)
    is_first = ok & (offset == first_off[seg])
    is_last = ok & (offset == last_off[seg])
    open_ = jax.ops.segment_sum(jnp.where(is_first, o, 0.0), seg,
                                num_segments=ns)
    close = jax.ops.segment_sum(jnp.where(is_last, c, 0.0), seg,
                                num_segments=ns)

    nonempty = count[:num_segments] > 0
    complete = count[:num_segments] >= min_count
    valid_out = nonempty & complete
    nan = jnp.asarray(jnp.nan, h.dtype)
    fix = lambda a: jnp.where(nonempty, a[:num_segments], nan)
    return Candles(
        open=fix(open_),
        high=fix(high),
        low=fix(low),
        close=fix(close),
        volume=jnp.where(nonempty, volume[:num_segments], 0.0),
        count=count[:num_segments],
        valid=valid_out,
    )


@jax.jit
def validate_ohlcv(o, h, l, c, v, valid):
    """Vectorised OHLC-integrity check (reference
    ``CandleReconstructor.validate_candle_data``, core.py:108-144, and the
    DB CHECK constraints at candle_schema.py:41-48).

    Returns (all_ok: bool scalar, per-bar ok mask). Padding rows pass.
    """
    finite = jnp.isfinite(o) & jnp.isfinite(h) & jnp.isfinite(l) & jnp.isfinite(c)
    rel = (h >= l) & (h >= o) & (h >= c) & (l <= o) & (l <= c)
    vol_ok = v >= 0
    ok = (~valid) | (finite & rel & vol_ok)
    return jnp.all(ok), ok


def reconstruction_stats(count_in: jax.Array, candles: Candles,
                         volume_in: jax.Array):
    """Compression / volume-preservation stats (reference
    ``get_reconstruction_stats``, core.py:146-171), as jit-friendly scalars."""
    n_out = jnp.sum(candles.valid)
    n_in = count_in
    vol_out = jnp.sum(jnp.where(candles.valid, candles.volume, 0.0))
    vol_in = volume_in
    return {
        "original_candles": n_in,
        "reconstructed_candles": n_out,
        "compression_ratio": jnp.where(n_out > 0, n_in / n_out, 0.0),
        "total_volume_original": vol_in,
        "total_volume_reconstructed": vol_out,
        "volume_preservation": jnp.where(
            vol_in > 0, jnp.abs(1.0 - vol_out / vol_in), 1.0
        ),
    }
