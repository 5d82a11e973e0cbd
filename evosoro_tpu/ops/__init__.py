"""Pallas TPU kernels for the hot rollout path.

`fused_rollout` keeps the whole batched simulation state VMEM-resident across
every timestep of a rollout (the reference's per-step hot loop, VX_Sim.cpp:1763
Integrate, re-designed as a channel-major multi-step kernel); `core.step`
remains the general jnp stencil covering the full feature envelope.
"""

from evosoro_tpu.ops.fused_rollout import (  # noqa: F401
    FastRolloutStats,
    fused_rollout,
    locomotion_fitness,
    supports,
)
