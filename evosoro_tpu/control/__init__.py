"""Model-predictive control over batched soft-body rollouts.

New capability beyond the reference (SURVEY.md §7.6): the reference only
*evolves* open-loop sinusoid phase offsets (the control signal is
CtrlTempFact, reference: VXS_Voxel.cpp:302); here the same actuation channel
is exposed as a per-voxel control sequence and optimized online by shooting:

- `cem_optimize`    — derivative-free Cross-Entropy Method: sample K candidate
                      control sequences, roll them out batched (vmap → the
                      chip's rollout throughput IS the solver speed), refit a
                      Gaussian to the elites. Robust to contact nonsmoothness.
- `grad_optimize`   — first-order shooting via jax.grad through a
                      `jax.checkpoint`-ed scan (BPTT over the full horizon
                      with O(√T) memory).
- `MPCController` / `mpc_run` — receding-horizon driver: plan with CEM from
                      the current SimState, execute the first control segment,
                      replan.
"""

from evosoro_tpu.control.shooting import (  # noqa: F401
    CEMConfig,
    MPCController,
    cem_optimize,
    cem_optimize_fused,
    grad_optimize,
    locomotion_cost,
    make_fused_cem_solver,
    mpc_run,
)
from evosoro_tpu.control.sqp import (  # noqa: F401
    FusedSQPSolver,
    SQPConfig,
    locomotion_sqp,
    sqp_optimize,
    sqp_optimize_fused,
    sqp_optimize_multistart,
)
