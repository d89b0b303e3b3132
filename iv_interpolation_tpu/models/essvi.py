"""Model-family alias for :mod:`iv_interpolation_tpu.ops.essvi`."""
from iv_interpolation_tpu.ops.essvi import (  # noqa: F401
    EssviFit,
    essvi_g,
    essvi_init,
    essvi_w,
    essvi_w_derivs,
    fit_essvi,
    fit_essvi_batched,
    psi_butterfly_cap,
)
