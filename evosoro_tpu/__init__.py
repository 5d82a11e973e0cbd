"""evosoro_tpu — a TPU-native soft-body voxel robot simulation + design framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of skriegman/evosoro
(CPU Voxelyze + Python 2 evolutionary framework):

- `core`     — batched mass-spring-damper voxel lattice physics (Euler–Bernoulli
               beam bonds, floor contact/friction, thermal actuation) as fused
               3D-stencil compute over dense grids; `lax.scan` rollouts.
- `ops`      — Pallas TPU kernels for the hot per-timestep stencil.
- `io`       — VXA (VoxCad XML) reader/writer for reference interop.
- `evo`      — evolutionary layer: CPPN/direct encodings, genotype→phenotype,
               Pareto optimization (AFPO), mutation, selection, checkpointing.
- `control`  — MPC: shooting/CEM/SQP over batched rollouts.
- `parallel` — device-mesh sharding of rollout batches (pjit/shard_map).
- `envs`     — terrestrial and aquatic (drag) environments.

Reference parity targets: evosoro @ /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

from evosoro_tpu.core import (  # noqa: F401
    SimParams,
    EnvParams,
    Material,
    MaterialPalette,
    VoxelBody,
    SimState,
    build_body,
    init_state,
    sim_step,
    rollout,
)
