"""MPC solve throughput on one chip (BASELINE.md "MPC throughput" row).

One solve = a full CEM plan over a 10-voxel-cube robot: `num_iters`
iterations x `pop_size` candidate rollouts of `plan_steps` physics steps,
each iteration ONE fused-kernel launch (ops/fused_rollout.FusedBatchRunner).
Prints solves/sec and the real-time factor vs the planned horizon (a solve
is real-time capable when solve_time < horizon_time).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_mpc.py
"""

import json
import os
import time

import jax
import numpy as np

from evosoro_tpu.control.shooting import CEMConfig, cem_optimize_fused
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    N = 10
    PLAN_STEPS = 400 if on_tpu else 20
    KNOTS = 8
    cfg = CEMConfig(num_iters=6, pop_size=128 if on_tpu else 8)

    rng = np.random.default_rng(0)
    structure = rng.integers(1, 5, size=(N, N, N)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(N, N, N))
    body = build_body(
        structure, palette_from_list(evosoro_default_palette()),
        phase_offset=phase,
    )
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac

    def solve(seed):
        u, info = cem_optimize_fused(
            jax.random.PRNGKey(seed), body, sim, env,
            num_steps=PLAN_STEPS, num_knots=KNOTS, config=cfg, dt=dt,
            interpret=not on_tpu,
        )
        return info["best_cost"]

    solve(0)  # warm/compile
    t0 = time.perf_counter()
    reps = 5 if on_tpu else 1
    for r in range(reps):
        cost = solve(r + 1)
    elapsed = (time.perf_counter() - t0) / reps

    # SQP (Gauss–Newton/LM with matrix-free CG on JᵀJ — the "QP kernel"):
    # one solve = num_iters damped-Newton iterations, each a vjp-linearized
    # rollout + cg_iters CG steps of jvp∘vjp products
    from evosoro_tpu.control.sqp import SQPConfig, sqp_optimize

    sqp_cfg = SQPConfig(num_iters=4, cg_iters=5, n_res=8)
    sqp_steps = (PLAN_STEPS // 2) if on_tpu else 10
    # free-space tracking target: BPTT through Coulomb-friction floor
    # contact is not differentiable at the stick/slip switches
    sqp_env = EnvParams(gravity_enabled=False, floor_enabled=False)

    def sqp_solve(target):
        u, info = sqp_optimize(
            body, sim, sqp_env, sqp_steps, KNOTS, target=target,
            config=sqp_cfg, dt=dt,
        )
        return float(info["best_cost"])  # sync

    sqp_cost = sqp_solve(0.4)  # warm/compile
    t0 = time.perf_counter()
    for r in range(reps):
        sqp_cost = sqp_solve(0.4 + 0.01 * r)
    sqp_elapsed = (time.perf_counter() - t0) / reps

    horizon_s = PLAN_STEPS * float(dt)
    rollouts = cfg.num_iters * int(np.ceil(cfg.pop_size / 8) * 8)
    out = {
        "metric": "mpc_solves_per_sec",
        "value": round(1.0 / elapsed, 3),
        "unit": "solves/s",
        "sqp_solves_per_sec": round(1.0 / sqp_elapsed, 3),
        "sqp_config": {"num_iters": sqp_cfg.num_iters,
                       "cg_iters": sqp_cfg.cg_iters,
                       "plan_steps": sqp_steps, "best_cost": float(sqp_cost)},
        "plan_steps": PLAN_STEPS,
        "horizon_s": round(horizon_s, 5),
        "rollouts_per_solve": rollouts,
        "realtime_factor": round(horizon_s / elapsed, 3),
        "best_cost": float(cost),
    }
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        out["note"] = (
            "measured through the axon remote tunnel: each of the 6 kernel "
            "launches pays ~0.5s RPC latency that a locally-attached chip "
            "does not; kernel compute is ~40ms/launch at this size"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
