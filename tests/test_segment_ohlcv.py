"""Candle aggregation parity vs the reference's pandas groupby
(src/candle_reconstruction/core.py:36-106)."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from iv_interpolation_tpu.ops.segment_ohlcv import (
    aggregate_ohlcv,
    reconstruction_stats,
    validate_ohlcv,
)


def _pandas_oracle(df, freq_minutes, min_count):
    """The exact groupby the reference runs (core.py:70-89)."""
    data = df.sort_values("timestamp").copy()
    data["time_group"] = data["timestamp"].dt.floor(f"{freq_minutes}min")
    agg = data.groupby("time_group").agg(
        open=("open", "first"), high=("high", "max"), low=("low", "min"),
        close=("close", "last"), volume=("volume", "sum"),
    ).reset_index()
    counts = data.groupby("time_group").size()
    complete = counts[counts >= min_count].index
    return agg[agg["time_group"].isin(complete)].reset_index(drop=True)


def _random_bars(rng, n_minutes, keep_frac=0.8, start_minute=7):
    minutes = start_minute + np.flatnonzero(rng.uniform(size=n_minutes) < keep_frac)
    L = len(minutes)
    close = 100 + np.cumsum(rng.normal(size=L))
    open_ = close + rng.normal(size=L) * 0.1
    high = np.maximum(open_, close) + rng.uniform(0, 0.5, L)
    low = np.minimum(open_, close) - rng.uniform(0, 0.5, L)
    volume = rng.uniform(0, 100, L)
    return minutes, open_, high, low, close, volume


@pytest.mark.parametrize("freq,min_count", [(5, 5), (5, 1), (15, 15)])
def test_matches_pandas_groupby(rng, freq, min_count):
    minutes, o, h, l, c, v = _random_bars(rng, 600)
    df = pd.DataFrame({
        "timestamp": pd.to_datetime("2023-03-20") + pd.to_timedelta(minutes, unit="m"),
        "open": o, "high": h, "low": l, "close": c, "volume": v,
    })
    expected = _pandas_oracle(df, freq, min_count)

    base_bucket = int(minutes[0]) // freq
    num_segments = int(minutes[-1]) // freq - base_bucket + 1
    got = aggregate_ohlcv(
        jnp.array(minutes), *map(jnp.array, (o, h, l, c, v)),
        jnp.ones(len(minutes), bool), jnp.int32(freq), jnp.int32(base_bucket),
        num_segments=num_segments, min_count=min_count,
    )
    valid = np.asarray(got.valid)
    sel = np.flatnonzero(valid)
    # timestamps of surviving buckets
    got_minutes = (base_bucket + sel) * freq
    exp_minutes = (
        (expected["time_group"] - pd.Timestamp("2023-03-20")).dt.total_seconds()
        // 60
    ).to_numpy()
    np.testing.assert_array_equal(got_minutes, exp_minutes)
    for col in ("open", "high", "low", "close", "volume"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, col))[sel], expected[col].to_numpy(),
            atol=1e-12, err_msg=col,
        )


def test_padding_rows_ignored(rng):
    minutes, o, h, l, c, v = _random_bars(rng, 100, keep_frac=1.0, start_minute=0)
    L = len(minutes)
    pad = 37
    pad_arr = lambda a, fill: np.concatenate([a, np.full(pad, fill)])
    valid = np.concatenate([np.ones(L, bool), np.zeros(pad, bool)])
    got = aggregate_ohlcv(
        jnp.array(pad_arr(minutes, 0).astype(np.int64)),
        *[jnp.array(pad_arr(a, np.nan)) for a in (o, h, l, c)],
        jnp.array(pad_arr(v, 0.0)),
        jnp.array(valid), jnp.int32(5), jnp.int32(0),
        num_segments=20, min_count=5,
    )
    np.testing.assert_array_equal(np.asarray(got.count), np.full(20, 5))
    assert np.asarray(got.valid).all()


def test_validate_ohlcv_catches_violations():
    o = jnp.array([1.0, 1.0]); h = jnp.array([2.0, 0.5])
    l = jnp.array([0.5, 0.4]); c = jnp.array([1.5, 0.45])
    v = jnp.array([1.0, 1.0]); valid = jnp.array([True, True])
    all_ok, ok = validate_ohlcv(o, h, l, c, v, valid)
    assert not bool(all_ok)
    assert bool(ok[0]) and not bool(ok[1])
    # same rows as padding pass
    all_ok2, _ = validate_ohlcv(o, h, l, c, v, jnp.array([True, False]))
    assert bool(all_ok2)


def test_reconstruction_stats(rng):
    minutes, o, h, l, c, v = _random_bars(rng, 50, keep_frac=1.0, start_minute=0)
    got = aggregate_ohlcv(
        jnp.array(minutes), *map(jnp.array, (o, h, l, c, v)),
        jnp.ones(len(minutes), bool), jnp.int32(5), jnp.int32(0),
        num_segments=10, min_count=5,
    )
    stats = reconstruction_stats(jnp.int32(len(minutes)), got, jnp.sum(jnp.array(v)))
    assert int(stats["reconstructed_candles"]) == 10
    np.testing.assert_allclose(float(stats["compression_ratio"]), 5.0)
    np.testing.assert_allclose(float(stats["volume_preservation"]), 0.0, atol=1e-12)


@pytest.mark.parametrize("start_minute", [0, 7])
def test_assume_sorted_matches_default(rng, start_minute):
    """assume_sorted=True (sorted-scatter hints + running-max re-index
    of invalid rows) is numerically identical to the default path, even
    with garbage minutes on interleaved padding rows."""
    minutes, o, h, l, c, v = _random_bars(rng, 60, keep_frac=0.9,
                                          start_minute=start_minute)
    L = len(minutes)
    valid = rng.uniform(size=L) < 0.8
    # poison INVALID rows' minutes with unsorted garbage (incl. negative
    # and out-of-range) — the hint path must not care
    minutes = minutes.copy()
    minutes[~valid] = rng.integers(-50, 500, (~valid).sum())
    args = (jnp.array(minutes), *map(jnp.array, (o, h, l, c, v)),
            jnp.array(valid), jnp.int32(5),
            jnp.int32(start_minute // 5))
    ref = aggregate_ohlcv(*args, num_segments=14, min_count=1)
    fast = aggregate_ohlcv(*args, num_segments=14, min_count=1,
                           assume_sorted=True)
    # open/close are gathers and high/low/count are order-independent
    # reductions -> bit-exact; volume sums associate differently
    # (cumsum difference vs per-segment adds) -> allclose
    for f in ("open", "high", "low", "close", "count", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(fast, f)),
                                      err_msg=f)
    np.testing.assert_allclose(np.asarray(ref.volume),
                               np.asarray(fast.volume), rtol=1e-12)


def test_assume_sorted_all_invalid(rng):
    """Degenerate all-padding input stays empty under the hint path."""
    L = 16
    z = jnp.zeros(L)
    out = aggregate_ohlcv(jnp.zeros(L, jnp.int32), z, z, z, z, z,
                          jnp.zeros(L, bool), jnp.int32(5), jnp.int32(0),
                          num_segments=4, min_count=1, assume_sorted=True)
    assert not bool(out.valid.any())
    assert int(out.count.sum()) == 0
