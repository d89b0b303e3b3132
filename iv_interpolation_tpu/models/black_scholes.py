"""Model-family alias for :mod:`iv_interpolation_tpu.ops.black_scholes`."""
from iv_interpolation_tpu.ops.black_scholes import (  # noqa: F401
    bs_greeks,
    bs_price,
    implied_vol,
)
