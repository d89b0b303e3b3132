"""Model-family alias for :mod:`iv_interpolation_tpu.ops.rbf`."""
from iv_interpolation_tpu.ops.rbf import (  # noqa: F401
    eval_rbf,
    fit_eval_rbf_batched,
    fit_rbf,
)
