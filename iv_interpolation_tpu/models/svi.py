"""Model-family alias for :mod:`iv_interpolation_tpu.ops.svi`."""
from iv_interpolation_tpu.ops.svi import (  # noqa: F401
    SVI_LOWER,
    SVI_UPPER,
    fit_svi,
    fit_svi_batched,
    svi_g,
    svi_init,
    svi_is_butterfly_free,
    svi_quasi_init,
    svi_total_variance,
    vega_weights,
)
