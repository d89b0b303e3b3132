"""Model-family alias for :mod:`iv_interpolation_tpu.ops.andreasen_huge`."""
from iv_interpolation_tpu.ops.andreasen_huge import (  # noqa: F401
    AHFit,
    ah_local_vol,
    ah_step,
    eval_ah,
    fit_ah,
    fit_eval_ah_surface,
    normalized_call,
)
