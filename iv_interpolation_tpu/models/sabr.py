"""Model-family alias for :mod:`iv_interpolation_tpu.ops.sabr`."""
from iv_interpolation_tpu.ops.sabr import (  # noqa: F401
    SABR_LOWER,
    SABR_UPPER,
    fit_sabr,
    fit_sabr_batched,
    sabr_init,
    sabr_vol,
)
