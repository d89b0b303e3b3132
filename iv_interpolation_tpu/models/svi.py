"""Model-family alias for :mod:`iv_interpolation_tpu.ops.svi`."""
from iv_interpolation_tpu.ops.svi import *  # noqa: F401,F403
