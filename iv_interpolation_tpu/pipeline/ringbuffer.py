"""Device-resident ring buffers for streaming market-data windows.

North-star requirement (BASELINE.json): "segment-reduction kernels
writing device-resident ring buffers, eliminating the data_bridge/
database round-trips on the hot path". The reference's hot path wrote
every intermediate row to PostgreSQL (SURVEY.md §3.5); here the rolling
window of candles lives in HBM and is updated in place — ``push`` is a
jit with donated buffers, so XLA reuses the same memory every step and
the host only ever sees the aggregates it asks for.

Layout: (B, C, L) ring with a device scalar cursor. Slots advance modulo
L; reads return the window in chronological order.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RingState(NamedTuple):
    data: jax.Array     # (B, C, L) rolling window
    valid: jax.Array    # (B, L) slot has real data
    cursor: jax.Array   # () int32 — next write slot
    count: jax.Array    # () int32 — total rows ever pushed (per stream)


def make_ring(batch: int, channels: int, length: int,
              dtype=jnp.float32) -> RingState:
    return RingState(
        data=jnp.full((batch, channels, length), jnp.nan, dtype),
        valid=jnp.zeros((batch, length), bool),
        cursor=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def push(state: RingState, rows: jax.Array,
         rows_valid: jax.Array) -> RingState:
    """Append ``rows`` (B, C, K) at the cursor, wrapping modulo L.

    The state is donated: XLA updates the HBM buffers in place, so a
    streaming loop allocates nothing per step.
    """
    B, C, L = state.data.shape
    K = rows.shape[-1]
    if K > L:
        # only the newest L rows can survive; truncating keeps the scatter
        # free of duplicate slot writes (whose order is unspecified)
        dropped = K - L
        out = push(state, rows[..., dropped:], rows_valid[..., dropped:])
        return out._replace(count=out.count + dropped)
    idx = (state.cursor + jnp.arange(K)) % L
    data = state.data.at[:, :, idx].set(rows)
    valid = state.valid.at[:, idx].set(rows_valid)
    return RingState(
        data=data, valid=valid,
        cursor=(state.cursor + K) % L,
        count=state.count + K,
    )


@jax.jit
def window(state: RingState):
    """The ring contents in chronological order: (data, valid) with the
    oldest slot first. Slots never written stay NaN/False."""
    L = state.data.shape[-1]
    start = jnp.where(state.count >= L, state.cursor, 0)
    idx = (start + jnp.arange(L)) % L
    return state.data[:, :, idx], state.valid[:, idx]


@partial(jax.jit, static_argnames=("bucket_minutes", "num_segments",
                                   "min_count"))
def window_candles(state: RingState, t0_minute: jax.Array,
                   bucket_minutes: int = 5, *, num_segments: int,
                   min_count: int = 5):
    """Aggregate the ring's chronological window straight into candles —
    the read side of the streaming chain, no host round trip.

    Channels convention: C >= 5 with [open, high, low, close, volume].
    ``t0_minute``: epoch minute of the window's first slot.
    """
    from iv_interpolation_tpu.ops.segment_ohlcv import aggregate_ohlcv

    data, valid = window(state)
    L = data.shape[-1]
    minutes = t0_minute + jnp.arange(L)
    base_bucket = t0_minute // bucket_minutes
    return jax.vmap(
        lambda o, h, l, c, v, ok: aggregate_ohlcv(
            minutes, o, h, l, c, v, ok, jnp.int32(bucket_minutes),
            base_bucket, num_segments=num_segments, min_count=min_count)
    )(data[:, 0], data[:, 1], data[:, 2], data[:, 3], data[:, 4], valid)
