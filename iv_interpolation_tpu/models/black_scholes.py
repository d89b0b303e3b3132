"""Model-family alias for :mod:`iv_interpolation_tpu.ops.black_scholes`."""
from iv_interpolation_tpu.ops.black_scholes import *  # noqa: F401,F403
