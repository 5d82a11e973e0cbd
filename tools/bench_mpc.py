"""MPC solve throughput on one chip (BASELINE.md "MPC throughput" row).

One solve = a full CEM plan over a 10-voxel-cube robot: `num_iters`
iterations x `pop_size` candidate rollouts of `plan_steps` physics steps.
Since r4 the WHOLE solve is ONE device program (control.shooting
make_fused_cem_solver: lax.scan over iterations, each invoking the fused
multi-step Pallas kernel), so launches_per_solve == 1.

Reported metrics:
  - value / solves_per_sec_wall: wall-clock solves/s, single solve at a
    time (includes one host->device launch; through the axon RPC tunnel
    that launch costs ~0.5 s a locally-attached chip does not pay)
  - device_solves_per_sec: DEVICE-time solves/s — 8 solves composed into
    one program via lax.map share a single launch, so
    (wall - launch)/8 ~ device time per solve
  - realtime_factor(s): planned horizon seconds per wall second

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_mpc.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.control.shooting import (
    CEMConfig, cem_optimize_fused, make_fused_cem_solver,
)
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.ops.fused_rollout import FusedBatchRunner


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    N = 10
    PLAN_STEPS = 200 if on_tpu else 20
    KNOTS = 8
    MULTI = 8 if on_tpu else 2
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

    # one-off API path (packs the body, builds + caches the solver)
    u, info = cem_optimize_fused(
        jax.random.PRNGKey(0), body, sim, env,
        num_steps=PLAN_STEPS, num_knots=KNOTS, config=cfg, dt=dt,
        interpret=not on_tpu,
    )
    cost = info["best_cost"]

    # wall-clock per solve in the receding-horizon pattern: runner/solver
    # built ONCE, each solve = one launch of the one-program CEM
    P = int(np.ceil(cfg.pop_size / 8) * 8)
    runner = FusedBatchRunner(
        body, sim, env, batch=P, num_steps=PLAN_STEPS, num_knots=KNOTS,
        dt=dt, interpret=not on_tpu,
    )
    solve_jit, solve_body = make_fused_cem_solver(runner, KNOTS, (N, N, N), cfg)
    packed = (runner.state_packed, runner.body_packed, runner.stats,
              runner.collision_packed, runner.ss_packed, runner.bc_packed)
    shape = (KNOTS, N, N, N)
    mean0 = jnp.zeros(shape, jnp.float32)
    std0 = jnp.full(shape, cfg.init_std, jnp.float32)

    jax.block_until_ready(
        solve_jit(jax.random.PRNGKey(1), packed, mean0, std0)[1])
    reps = 5 if on_tpu else 1
    t0 = time.perf_counter()
    for r in range(reps):
        out_solve = solve_jit(
            jax.random.PRNGKey(2 + r), packed, mean0, std0)
        jax.block_until_ready(out_solve[1])
    elapsed = (time.perf_counter() - t0) / reps

    # --- device-time measurement: MULTI solves in ONE program (lax.map)
    # amortize the single launch; per-solve device time ~ wall/MULTI ---

    @jax.jit
    def multi_solve(keys):
        return jax.lax.map(
            lambda k: solve_body(k, packed, mean0, std0)[1], keys)

    keys = jax.random.split(jax.random.PRNGKey(7), MULTI)
    jax.block_until_ready(multi_solve(keys))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(multi_solve(keys))
    multi_elapsed = time.perf_counter() - t0
    device_per_solve = multi_elapsed / MULTI

    # --- CLOSED LOOP (the north-star row): execute exec_steps while the
    # warm-started CEM plans the next window. The whole receding-horizon
    # run is ONE device program; device time per segment comes from the
    # difference of two run lengths (cancels the launch overhead). ---
    from evosoro_tpu.control.shooting import make_fused_mpc_closed_loop

    closed = []
    if on_tpu:
        steps_per_knot = PLAN_STEPS // KNOTS
        warm_grid = [
            # (warm_iters, warm_pop, exec_knots)
            (1, 32, 4), (2, 32, 4), (1, 64, 4), (1, 32, 2),
        ]
        mean_cold = jnp.asarray(u, jnp.float32)
        for it_w, pop_w, ek in warm_grid:
            cfg_w = CEMConfig(num_iters=it_w, pop_size=pop_w,
                              init_std=cfg.init_std)
            run, aux = make_fused_mpc_closed_loop(
                body, sim, env, PLAN_STEPS, KNOTS, exec_knots=ek,
                config=cfg_w, dt=dt, interpret=not on_tpu)
            std0 = jnp.full((KNOTS, N, N, N), cfg.init_std, jnp.float32)
            n1, n2 = 3, 13
            k1 = jax.random.split(jax.random.PRNGKey(11), n1)
            k2 = jax.random.split(jax.random.PRNGKey(11), n2)
            # compile both lengths
            jax.block_until_ready(run(
                k1, aux["state8"], aux["stats8"], mean_cold, std0)[2])
            jax.block_until_ready(run(
                k2, aux["state8"], aux["stats8"], mean_cold, std0)[2])
            t0 = time.perf_counter()
            jax.block_until_ready(run(
                k1, aux["state8"], aux["stats8"], mean_cold, std0)[2])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            s8, st8, costs = run(
                k2, aux["state8"], aux["stats8"], mean_cold, std0)
            jax.block_until_ready(costs)
            t2 = time.perf_counter() - t0
            dev_per_seg = (t2 - t1) / (n2 - n1)
            exec_s = aux["exec_steps"] * float(dt)
            cm_end = np.asarray(aux["cm_xy"](s8, st8))
            disp = float(np.linalg.norm(
                cm_end - np.asarray(aux["cm_xy"](
                    aux["state8"], aux["stats8"])))) / float(
                        body.nominal_size)
            closed.append(dict(
                warm_iters=it_w, warm_pop=pop_w, exec_knots=ek,
                exec_steps=aux["exec_steps"],
                exec_horizon_s=round(exec_s, 5),
                device_s_per_segment=round(dev_per_seg, 5),
                realtime_factor_device=round(exec_s / dev_per_seg, 3),
                mean_planned_cost=float(np.mean(np.asarray(costs))),
                executed_norm_dist=round(disp, 4),
                wall_n1_s=round(t1, 3), wall_n2_s=round(t2, 3),
            ))
            print("closed", closed[-1])

    # SQP (Gauss–Newton/LM with matrix-free CG on JᵀJ — the "QP kernel"):
    # one solve = num_iters damped-Newton iterations, each a vjp-linearized
    # rollout + cg_iters CG steps of jvp∘vjp products. Already ONE program
    # (sqp_optimize is a single jit around a lax.scan).
    from evosoro_tpu.control.sqp import SQPConfig, sqp_optimize

    sqp_cfg = SQPConfig(num_iters=4, cg_iters=5, n_res=8)
    sqp_steps = PLAN_STEPS if on_tpu else 10
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

    # FUSED SQP (r5): gradients through the reverse-mode segment kernel,
    # Jacobian rows as batch lanes, Woodbury-exact GN subproblem
    from evosoro_tpu.control.sqp import FusedSQPSolver

    fused_sqp = {}
    if on_tpu:
        # construct ONCE: the jitted solve (and both Pallas segment
        # kernels) compile at the first .solve(); each further target is a
        # pure device launch (r4's 0.058 solves/s measured a per-call
        # re-jit, not the kernel)
        fsolver = FusedSQPSolver(
            body, sim, sqp_env, sqp_steps, KNOTS, config=sqp_cfg, dt=dt,
            n_res=8)

        def fsqp_solve(target):
            uf, info = fsolver.solve(target=target)
            return float(info["best_cost"])

        fs_cost = fsqp_solve(0.4)  # compile
        t0 = time.perf_counter()
        for r in range(reps):
            fs_cost = fsqp_solve(0.4 + 0.01 * r)
        fs_elapsed = (time.perf_counter() - t0) / reps
        fused_sqp = {
            "sqp_fused_solves_per_sec": round(1.0 / fs_elapsed, 3),
            "sqp_fused_best_cost": float(fs_cost),
            "sqp_fused_n_res": 8,
        }
        print("fused sqp", fused_sqp)

    horizon_s = PLAN_STEPS * float(dt)
    rollouts = cfg.num_iters * P
    out = {
        "metric": "mpc_solves_per_sec",
        "value": round(1.0 / device_per_solve, 3),
        "unit": "solves/s",
        "launches_per_solve": 1,
        "solves_per_sec_wall": round(1.0 / elapsed, 3),
        "device_solves_per_sec": round(1.0 / device_per_solve, 3),
        "device_ms_per_solve": round(device_per_solve * 1e3, 1),
        "multi_solves_in_one_program": MULTI,
        "sqp_solves_per_sec": round(1.0 / sqp_elapsed, 3),
        "sqp_launches_per_solve": 1,
        "sqp_config": {"num_iters": sqp_cfg.num_iters,
                       "cg_iters": sqp_cfg.cg_iters,
                       "plan_steps": sqp_steps, "best_cost": float(sqp_cost)},
        "plan_steps": PLAN_STEPS,
        "horizon_s": round(horizon_s, 5),
        "rollouts_per_solve": rollouts,
        "realtime_factor_wall": round(horizon_s / elapsed, 3),
        "realtime_factor_device": round(horizon_s / device_per_solve, 3),
        "best_cost": float(cost),
        "closed_loop": closed,
    }
    out.update(fused_sqp)
    if closed:
        best_rt = max(c["realtime_factor_device"] for c in closed)
        out["closed_loop_realtime_factor_device"] = best_rt
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        out["note"] = (
            "wall numbers pay ONE ~0.5s axon RPC tunnel launch per solve "
            "(locally-attached chips do not); device_solves_per_sec "
            "amortizes the launch over lax.map-composed solves; "
            "closed_loop device_s_per_segment is a two-length run "
            "difference, launch-free"
        )
    print(json.dumps(out))
    if on_tpu:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MPCBENCH.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print("written", path)


if __name__ == "__main__":
    main()
