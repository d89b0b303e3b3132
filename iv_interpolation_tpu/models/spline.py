"""Cubic-spline smile model: general batched fit/eval plus the
fixed-grid matrix operators (the MXU hot path)."""
from iv_interpolation_tpu.ops.cubic_spline import (  # noqa: F401
    eval_cubic_spline,
    eval_cubic_spline_deriv,
    eval_cubic_spline_second_deriv,
    fit_cubic_spline,
    fit_eval_smile,
)
from iv_interpolation_tpu.ops.spline_matrix import (  # noqa: F401
    SplineOperator,
    apply_spline_operator,
    build_spline_operator,
    build_surface_operators,
    fit_eval_surface_grid,
)
from iv_interpolation_tpu.ops.smoothing_spline import (  # noqa: F401
    SmoothingFit,
    eval_smoothing_spline,
    eval_smoothing_spline_derivs,
    fit_eval_smoothed_smile,
    fit_smoothing_spline,
    fit_smoothing_spline_autolam,
)
from iv_interpolation_tpu.ops.interp import cubic_resample  # noqa: F401
