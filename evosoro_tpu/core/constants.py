"""Numerical-precision constants for the beam-bond physics.

These mirror the precision ladder of the reference engine
(reference: Utils/Vec3D.h:20-59 and VXS_BondInternal.h:16-26). The reference
`voxelyze` CLI builds with no PREC define, which selects the PREC_MED branch
(vfloat = double). We default to the same constants so trajectories match; the
values only gate small-angle fast paths, so f32 runs reuse them unchanged.
"""

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class Precision:
    """Small-angle/fast-path thresholds (reference: Vec3D.h:25-59)."""

    max_error_percent: float
    discard_angle_rad: float
    small_angle_rad: float
    w_thresh_acos2sqrt: float
    sa_bond_bend_rad: float  # reference: VXS_BondInternal.h:16-26

    @property
    def small_angle_w(self) -> float:
        return math.cos(self.small_angle_rad * 0.5)

    @property
    def smallish_angle_w(self) -> float:
        return math.cos(HYSTERESIS_FACTOR * self.small_angle_rad * 0.5)

    @property
    def sl_thresh_acos2sqrt(self) -> float:
        return 1.0 - self.w_thresh_acos2sqrt * self.w_thresh_acos2sqrt


HYSTERESIS_FACTOR = 1.1  # reference: Vec3D.h:21
SA_BOND_EXT_PERC = 1.30  # reference: VXS_BondInternal.h:26

# PREC_MED — the reference CLI's effective build (Vec3D.h:45-53).
PREC_MED = Precision(
    max_error_percent=1e-4,
    discard_angle_rad=1e-7,
    small_angle_rad=1.732e-2,
    w_thresh_acos2sqrt=0.9988,
    sa_bond_bend_rad=0.05,
)

PREC_HIGH = Precision(
    max_error_percent=1e-6,
    discard_angle_rad=1e-7,
    small_angle_rad=1.732e-3,
    w_thresh_acos2sqrt=0.999987737,
    sa_bond_bend_rad=0.02,
)

PREC_LOW = Precision(
    max_error_percent=0.001,
    discard_angle_rad=0.0001,
    small_angle_rad=0.0548,
    w_thresh_acos2sqrt=0.9880,
    sa_bond_bend_rad=0.1,
)

DEFAULT_PRECISION = PREC_MED

# Divergence guard: engineering strain beyond this aborts a rollout
# (reference: VX_Sim.cpp:1775 "GetEngStrain() > 100").
DIVERGENCE_STRAIN = 100.0

# The reference engine does not use machine π in its hot path — it embeds
# truncated literals, and trajectory parity requires replicating them:
# - `2*(vfloat)3.1415926` in CalcMaxDt (VX_Sim.cpp:1725) and the global
#   temperature sinusoid (VX_Environment.cpp:449): the double 3.1415926.
# - `2*3.1415926f` in the actuation control sinusoid (VXS_Voxel.cpp:302)
#   and per-material temperature (VX_Environment.cpp:451): the float
#   literal, which rounds UP to 3.14159274101257324.
# Using jnp.pi instead shifts dt by 1.7e-8 relative and dephases the
# actuation drive, which measurably diverges long rollouts.
REF_PI_DOUBLE = 3.1415926
REF_PI_FLOAT = 3.1415927410125732421875  # = (double)(float)3.1415926f
