"""Static analysis tools (the reference's VX_FEA capability, TPU-native)."""

from evosoro_tpu.analysis.fea import fea_solve, linear_operator  # noqa: F401
from evosoro_tpu.analysis.tensile import tensile_test  # noqa: F401
