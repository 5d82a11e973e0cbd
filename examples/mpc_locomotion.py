"""Online MPC locomotion — a capability beyond the reference.

Where the reference only *evolves* open-loop sinusoid phase offsets, this
framework exposes the same actuation channel as a per-voxel control sequence
and optimizes it online: CEM shooting over a receding horizon, every
candidate rollout batched on the TPU (the chip's rollout throughput IS the
solver speed). See evosoro_tpu/control/.

Run:  python examples/mpc_locomotion.py [--segments N] [--cpu]
"""

import argparse

import numpy as np

import _bootstrap  # noqa: F401

import jax

from evosoro_tpu.control import CEMConfig, MPCController
from evosoro_tpu.control.shooting import mpc_run
from evosoro_tpu.core import (
    build_body,
    calc_max_dt,
    evosoro_default_palette,
    palette_from_list,
)
from evosoro_tpu.core.types import EnvParams, SimParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    structure = rng.integers(1, 5, size=(5, 5, 4)).astype(np.int32)
    pal = palette_from_list(evosoro_default_palette())
    body = build_body(structure, pal, lattice_dim=0.01,
                      phase_offset=np.zeros(structure.shape))
    sim = SimParams(stop_condition_value=10.0, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)  # pure feedback control, no CPG
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)

    controller = MPCController(
        body=body, sim=sim, env=env, dt=dt,
        plan_steps=200, plan_knots=4, execute_knots=1,
        config=CEMConfig(num_iters=4, pop_size=32, init_std=0.05),
    )
    final_state, executed, costs = mpc_run(
        jax.random.PRNGKey(0), controller, total_segments=args.segments
    )
    cm = np.asarray(final_state.pos).mean(axis=(0, 1, 2))
    print(f"executed {executed.shape[0]} control knots over "
          f"{args.segments} segments; planned costs: "
          f"{np.asarray(costs).round(4).tolist()}")
    print(f"final mean position: {cm.round(5).tolist()}")


if __name__ == "__main__":
    main()
