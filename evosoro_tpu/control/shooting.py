"""Shooting-method optimizers over the rollout actuation channel.

The decision variable is a control sequence `u` of shape (K, X, Y, Z): knot k
modulates every voxel's scale (fraction of nominal size) during steps
[k·S/K, (k+1)·S/K) — exactly the thermal-actuation term the reference's
evolution tunes via phase offsets (reference: VXS_Voxel.cpp:292-305), but
free-form in time. All optimizers are pure functions of a PRNG key and jit
end-to-end; candidate batches map onto `vmap`, so one chip evaluates the
whole population per solver iteration (SURVEY.md §2.4 — the reference's
process-per-candidate parallelism as SPMD).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from evosoro_tpu.core.rollout import init_state, rollout
from evosoro_tpu.core.types import EnvParams, SimParams, SimState, VoxelBody


def locomotion_cost(result) -> jnp.ndarray:
    """Negative normalized CoM displacement (reference fitness:
    VX_SimGA.cpp:36 NormFinalDist). Diverged rollouts score +inf-ish."""
    return jnp.where(result.diverged, 1e9, -result.norm_final_dist)


@dataclasses.dataclass(frozen=True)
class CEMConfig:
    num_iters: int = 8
    pop_size: int = 64
    elite_frac: float = 0.125
    init_std: float = 0.02  # scale modulation is a fraction of voxel size
    min_std: float = 1e-4
    smoothing: float = 0.5  # mean/std EMA across iterations
    u_clip: float = 0.2  # keep |u| within stable actuation range


@struct.dataclass
class CEMState:
    mean: Any  # (K, X, Y, Z)
    std: Any
    best_u: Any
    best_cost: Any
    key: Any


def _evaluate_batch(us, body, sim, env, num_steps, dt, state0, cost_fn):
    def one(u):
        res = rollout(
            body, sim, env, num_steps=num_steps, dt=dt, state=state0,
            control_sequence=u,
        )
        return cost_fn(res)

    return jax.vmap(one)(us)


@partial(jax.jit, static_argnames=("num_steps", "num_knots", "config",
                                   "cost_fn"))
def cem_optimize(
    key,
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    num_knots: int,
    config: CEMConfig = CEMConfig(),
    state0: SimState | None = None,
    dt=None,
    cost_fn: Callable = locomotion_cost,
    init_mean=None,
):
    """Cross-Entropy Method over control sequences. Returns (best_u, info).

    Fully jitted: the CEM loop is a `lax.scan`, each iteration vmapping
    `pop_size` rollouts — one XLA program per solve.
    """
    X, Y, Z = body.occ.shape
    shape = (num_knots, X, Y, Z)
    if state0 is None:
        state0 = init_state(body, volume_effects=sim.volume_effects_enabled)
    dtype = body.nom_pos.dtype
    mean0 = jnp.zeros(shape, dtype) if init_mean is None else jnp.asarray(init_mean, dtype)
    n_elite = max(1, int(config.pop_size * config.elite_frac))

    def iteration(carry: CEMState, _):
        key, sub = jax.random.split(carry.key)
        eps = jax.random.normal(sub, (config.pop_size,) + shape, mean0.dtype)
        us = carry.mean[None] + carry.std[None] * eps
        us = jnp.clip(us, -config.u_clip, config.u_clip)
        costs = _evaluate_batch(us, body, sim, env, num_steps, dt, state0, cost_fn)

        elite_idx = jnp.argsort(costs)[:n_elite]
        elites = us[elite_idx]
        new_mean = jnp.mean(elites, axis=0)
        new_std = jnp.std(elites, axis=0) + config.min_std
        a = config.smoothing
        mean = a * new_mean + (1 - a) * carry.mean
        std = a * new_std + (1 - a) * carry.std

        it_best = costs[elite_idx[0]]
        better = it_best < carry.best_cost
        best_u = jnp.where(better, us[elite_idx[0]], carry.best_u)
        best_cost = jnp.where(better, it_best, carry.best_cost)
        out = dict(best_cost=best_cost, mean_cost=jnp.mean(costs))
        return CEMState(mean, std, best_u, best_cost, key), out

    init = CEMState(
        mean=mean0,
        std=jnp.full(shape, config.init_std, mean0.dtype),
        best_u=mean0,
        best_cost=jnp.asarray(jnp.inf, mean0.dtype),
        key=key,
    )
    final, info = jax.lax.scan(iteration, init, None, length=config.num_iters)
    return final.best_u, dict(
        best_cost=final.best_cost,
        best_cost_trace=info["best_cost"],
        mean_cost_trace=info["mean_cost"],
        final_mean=final.mean,
        final_std=final.std,
    )


@partial(jax.jit, static_argnames=("num_steps", "num_knots", "num_iters",
                                   "cost_fn"))
def grad_optimize(
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    num_knots: int,
    num_iters: int = 50,
    lr: float = 1e-3,
    state0: SimState | None = None,
    dt=None,
    cost_fn: Callable = locomotion_cost,
    init_u=None,
):
    """First-order shooting: Adam on the rollout cost via BPTT.

    The per-step physics is rematerialized (`jax.checkpoint` around sim_step
    inside rollout's scan would be ideal; scan already gives O(T) with
    activation saving — we wrap the whole rollout in checkpoint to bound
    memory for long horizons). Contact nonsmoothness can make this landscape
    rough — CEM is the robust default; this is the refinement pass
    (SURVEY.md §7 hard part 5).
    """
    import optax

    X, Y, Z = body.occ.shape
    if state0 is None:
        state0 = init_state(body, volume_effects=sim.volume_effects_enabled)
    dtype = body.nom_pos.dtype
    u0 = (jnp.zeros((num_knots, X, Y, Z), dtype) if init_u is None
          else jnp.asarray(init_u, dtype))

    @jax.checkpoint
    def cost(u):
        res = rollout(
            body, sim, env, num_steps=num_steps, dt=dt, state=state0,
            control_sequence=u,
        )
        return cost_fn(res)

    opt = optax.adam(lr)

    def step(carry, _):
        u, opt_state = carry
        c, g = jax.value_and_grad(cost)(u)
        updates, opt_state = opt.update(g, opt_state)
        u = optax.apply_updates(u, updates)
        return (u, opt_state), c

    (u, _), cs = jax.lax.scan(step, (u0, opt.init(u0)), None, length=num_iters)
    return u, dict(cost_trace=cs, final_cost=cs[-1])


_fused_cem_solver_cache: dict = {}


def make_fused_cem_solver(runner, num_knots: int, grid_shape,
                          config: CEMConfig = CEMConfig(), mesh=None):
    """Build (and cache) a ONE-device-program CEM solve over the fused
    Pallas rollout kernel: the whole solver — candidate sampling, the
    rollout kernel, cost reduction and the elite update — is a `lax.scan`
    over iterations inside a single jit, so one solve is ONE launch
    (launches/solve == 1; on a tunnel-attached chip this removes
    num_iters-1 RPC round trips per solve).

    The packed state/body/stats ride as ARGUMENTS (not closure constants),
    so the compiled program is reused across bodies of the same shape and
    feature envelope. Returns `solve(key, packed, mean0, std0) ->
    (best_u, best_cost, best_trace, mean_trace, mean, std)` plus the
    traceable body (for composing several solves into one program, e.g.
    device-time benchmarking via lax.map).

    `mesh`: optional Mesh with a "rollout"-style first axis — the candidate
    rollout batch (the hot 99%) is shard_map'd across it, one kernel grid
    per device over its population shard; the tiny CEM update runs on the
    full (gathered) cost vector. The population must divide by
    n_devices x batch_block(8)."""
    import sys

    fr = sys.modules["evosoro_tpu.ops.fused_rollout"]

    P = runner.batch
    n_elite = max(1, int(config.pop_size * config.elite_frac))
    Vp = runner.Vp
    L = float(runner.L)
    shape = (num_knots,) + tuple(grid_shape)
    call_kwargs = dict(runner._call_kwargs)

    import numpy as _np

    mesh_key = None if mesh is None else (
        tuple(mesh.axis_names), tuple(d.id for d in mesh.devices.flat))
    cache_key = (tuple(sorted(
        (k, v) for k, v in call_kwargs.items())), P, n_elite, config,
        shape, L, mesh_key)
    if cache_key in _fused_cem_solver_cache:
        return _fused_cem_solver_cache[cache_key]

    kernel_call = lambda sp, bp, st, ctrl, coll, ss, bc: fr._fused_call(  # noqa: E731
        sp, bp, st, ctrl, coll, ss, bc, **call_kwargs)
    if mesh is not None and _np.prod(mesh.devices.shape) > 1:
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.7 layout
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as PS

        ax = mesh.axis_names[0]
        bspec = lambda x: PS(ax, *([None] * (x.ndim - 1)))  # noqa: E731
        rspec = lambda x: PS(*([None] * x.ndim))  # noqa: E731

        def kernel_sharded(sp, bp, st, ctrl, coll, ss, bc):
            # state/stats/controls are per-candidate (sharded); the body,
            # shared collision table and side tables are replicated
            args = (sp, bp, st, ctrl, coll, ss, bc)
            shared_body = bp.shape[0] == 1
            in_specs = (
                bspec(sp),
                rspec(bp) if shared_body else bspec(bp),
                bspec(st),
                bspec(ctrl),
                jax.tree_util.tree_map(rspec, coll),
                jax.tree_util.tree_map(rspec, ss),
                jax.tree_util.tree_map(rspec, bc),
            )
            out_specs = (bspec(sp), bspec(st))
            return shard_map(
                kernel_call, mesh=mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False,
            )(*args)

        kernel_dispatch = kernel_sharded
    else:
        kernel_dispatch = kernel_call

    def solve_body(key, packed, mean0, std0):
        state_packed, body_packed, stats, coll, ss, bc = packed

        def iteration(carry, _):
            mean, std, best_u, best_cost, key = carry
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, (P,) + shape, jnp.float32)
            us = jnp.clip(mean[None] + std[None] * eps,
                          -config.u_clip, config.u_clip)
            ctrl = fr._flat(us, Vp)
            out_state, out_stats = kernel_dispatch(
                state_packed, body_packed, stats, ctrl, coll, ss, bc
            )
            m = fr.packed_metrics(out_state, body_packed, out_stats, L)
            costs = jnp.where(m["diverged"], 1e9, -m["norm_final_dist"])
            order = jnp.argsort(costs)[:n_elite]
            elites = us[order]
            a = config.smoothing
            mean = a * jnp.mean(elites, axis=0) + (1 - a) * mean
            std = a * (jnp.std(elites, axis=0) + config.min_std) + (1 - a) * std
            it_best = costs[order[0]]
            better = it_best < best_cost
            best_u = jnp.where(better, us[order[0]], best_u)
            best_cost = jnp.minimum(best_cost, it_best)
            # trace the RUNNING best (monotone), matching cem_optimize
            return (mean, std, best_u, best_cost, key), (
                best_cost, jnp.mean(costs))

        init = (mean0, std0, mean0, jnp.asarray(jnp.inf, jnp.float32), key)
        (mean, std, best_u, best_cost, _), (bt, mt) = jax.lax.scan(
            iteration, init, None, length=config.num_iters
        )
        return best_u, best_cost, bt, mt, mean, std

    solve = jax.jit(solve_body)
    _fused_cem_solver_cache[cache_key] = (solve, solve_body)
    return solve, solve_body


def cem_optimize_fused(
    key,
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    num_knots: int,
    config: CEMConfig = CEMConfig(),
    dt=None,
    state0: SimState | None = None,
    stop_time=None,
    interpret: bool = False,
    mesh=None,
):
    """CEM over control sequences through the fused Pallas rollout kernel:
    the production MPC solve path on TPU. One solve is ONE device program
    (`make_fused_cem_solver`) — the CEM loop is a lax.scan whose every
    iteration invokes the multi-step rollout kernel with the state
    VMEM-resident, so a solve pays exactly one host->device launch.
    Pass a `mesh` to spread the candidate rollouts over devices
    (population padded to n_devices x 8).

    Same semantics as `cem_optimize` (which remains the general/differen-
    tiable-feature path)."""
    from evosoro_tpu.ops.fused_rollout import FusedBatchRunner

    import numpy as np

    quantum = 8 * (int(np.prod(mesh.devices.shape)) if mesh is not None else 1)
    P = int(np.ceil(config.pop_size / quantum) * quantum)
    runner = FusedBatchRunner(
        body, sim, env, batch=P, num_steps=num_steps, num_knots=num_knots,
        dt=dt, state=state0, stop_time=stop_time, interpret=interpret,
    )
    X, Y, Z = body.occ.shape
    shape = (num_knots, X, Y, Z)
    solve, _ = make_fused_cem_solver(runner, num_knots, (X, Y, Z), config,
                                     mesh=mesh)
    mean0 = jnp.zeros(shape, jnp.float32)
    std0 = jnp.full(shape, config.init_std, jnp.float32)
    packed = (runner.state_packed, runner.body_packed, runner.stats,
              runner.collision_packed, runner.ss_packed, runner.bc_packed)
    best_u, best_cost, best_trace, mean_trace, mean, std = solve(
        key, packed, mean0, std0)

    return best_u, dict(
        best_cost=float(best_cost),
        best_cost_trace=best_trace,
        mean_cost_trace=mean_trace,
        final_mean=mean,
        final_std=std,
    )


_fused_mpc_loop_cache: dict = {}


def make_fused_mpc_closed_loop(body, sim, env, plan_steps, plan_knots,
                               exec_knots=1, config: CEMConfig = CEMConfig(),
                               dt=None, interpret=False):
    """ONE-device-program receding-horizon MPC (the north-star control
    loop, BASELINE.md MPC row): every scan step plans a `plan_steps`
    window with a warm-started CEM (`config.num_iters` x
    `config.pop_size`, mean carried over from the previous plan shifted
    by the executed knots), then EXECUTES the first `exec_knots` knots on
    the true state — plan and execution are both fused-kernel launches
    inside one jit, so a whole closed-loop run costs one host->device
    launch.

    Returns `(run, aux)`: `run(seg_keys, state8, stats8, mean0, std0)`
    scans over `seg_keys.shape[0]` segments and returns
    `(state8, stats8, planned_cost_per_segment)`; `aux` carries the
    packed initial state/stats (batch 8) and geometry. Real-time factor =
    executed seconds per device second; the warm replan needs far fewer
    candidates than a cold solve (bench: tools/bench_mpc.py --closed)."""
    import sys

    import numpy as np

    fr = sys.modules["evosoro_tpu.ops.fused_rollout"]
    from evosoro_tpu.ops.fused_rollout import FusedBatchRunner

    steps_per_knot = plan_steps // plan_knots
    exec_steps = steps_per_knot * exec_knots
    P = int(np.ceil(config.pop_size / 8) * 8)
    runner = FusedBatchRunner(
        body, sim, env, batch=P, num_steps=plan_steps,
        num_knots=plan_knots, dt=dt, interpret=interpret,
    )
    plan_kwargs = dict(runner._call_kwargs)
    exec_kwargs = dict(plan_kwargs, num_steps=exec_steps,
                       n_knots=exec_knots)
    Vp = runner.Vp
    L = float(runner.L)
    X, Y, Z = body.occ.shape
    shape = (plan_knots, X, Y, Z)
    n_elite = max(1, int(config.pop_size * config.elite_frac))
    coll, ss, bc = (runner.collision_packed, runner.ss_packed,
                    runner.bc_packed)
    body_packed = runner.body_packed

    cache_key = (tuple(sorted((k, v) for k, v in plan_kwargs.items())),
                 P, n_elite, config, shape, L, exec_knots)
    if cache_key in _fused_mpc_loop_cache:
        run = _fused_mpc_loop_cache[cache_key]
    else:
        def run_body(seg_keys, state8, stats8, mean0, std0):
            def segment(carry, k):
                state8, stats8, mean, std = carry
                # plan from the CURRENT true state (rows broadcast to the
                # candidate pop; CoM capture reset so the plan scores its
                # own window)
                plan_state = jnp.broadcast_to(
                    state8[:1], (P,) + state8.shape[1:])
                pst = jnp.broadcast_to(stats8[:1], (P, stats8.shape[1]))
                pst = pst.at[:, fr._S_CAPT].set(0.0)
                it_keys = jax.random.split(k, config.num_iters)

                def it(c, kk):
                    mean, std, best_u, best_cost = c
                    eps = jax.random.normal(kk, (P,) + shape, jnp.float32)
                    us = jnp.clip(mean[None] + std[None] * eps,
                                  -config.u_clip, config.u_clip)
                    ctrl = fr._flat(us, Vp)
                    out_state, out_stats = fr._fused_call(
                        plan_state, body_packed, pst, ctrl, coll, ss, bc,
                        **plan_kwargs)
                    m = fr.packed_metrics(
                        out_state, body_packed, out_stats, L)
                    costs = jnp.where(
                        m["diverged"], 1e9, -m["norm_final_dist"])
                    order = jnp.argsort(costs)[:n_elite]
                    elites = us[order]
                    a = config.smoothing
                    mean = a * jnp.mean(elites, axis=0) + (1 - a) * mean
                    std = a * (jnp.std(elites, axis=0) + config.min_std) \
                        + (1 - a) * std
                    it_best = costs[order[0]]
                    better = it_best < best_cost
                    best_u = jnp.where(better, us[order[0]], best_u)
                    return (mean, std, best_u,
                            jnp.minimum(best_cost, it_best)), it_best

                (mean, std, best_u, best_cost), _ = jax.lax.scan(
                    it, (mean, std, mean,
                         jnp.asarray(jnp.inf, jnp.float32)), it_keys)

                # execute the first exec_knots on the true state
                u_exec = best_u[:exec_knots]
                ctrl_e = fr._flat(jnp.broadcast_to(
                    u_exec[None], (8,) + u_exec.shape), Vp)
                state8, stats8 = fr._fused_call(
                    state8, body_packed, stats8, ctrl_e, coll, ss, bc,
                    **exec_kwargs)
                # warm start the next plan: shift out the executed knots
                mean = jnp.concatenate(
                    [best_u[exec_knots:],
                     jnp.broadcast_to(best_u[-1:],
                                      (exec_knots,) + best_u.shape[1:])],
                    axis=0)
                std = jnp.full(shape, config.init_std, jnp.float32)
                return (state8, stats8, mean, std), best_cost

            (state8, stats8, mean, std), costs = jax.lax.scan(
                segment, (state8, stats8, mean0, std0), seg_keys)
            return state8, stats8, costs

        run = jax.jit(run_body)
        _fused_mpc_loop_cache[cache_key] = run

    mass = body_packed[:, fr._B_MASS, :]

    def cm_xy(state8, stats8):
        inv_m = stats8[:1, fr._S_INV_MASS]
        return jnp.stack([
            jnp.sum(state8[:1, fr._POS + c, :] * mass, axis=1)[0] * inv_m[0]
            for c in range(2)
        ])

    aux = dict(
        state8=runner.state_packed[:8], stats8=runner.stats[:8],
        shape=shape, exec_steps=exec_steps, P=P, cm_xy=cm_xy,
        runner=runner,
    )
    return run, aux


@dataclasses.dataclass(frozen=True)
class MPCController:
    """Receding-horizon planner: CEM over a short lookahead, execute the
    first `execute_knots` segment, warm-start the next plan by shifting."""

    body: VoxelBody
    sim: SimParams
    env: EnvParams
    dt: Any
    plan_steps: int  # lookahead rollout length (steps)
    plan_knots: int
    execute_knots: int = 1
    config: CEMConfig = CEMConfig()
    cost_fn: Callable = locomotion_cost

    def plan(self, key, state: SimState, warm_start=None):
        u, info = cem_optimize(
            key, self.body, self.sim, self.env, self.plan_steps,
            self.plan_knots, self.config, state0=state, dt=self.dt,
            cost_fn=self.cost_fn, init_mean=warm_start,
        )
        return u, info


def mpc_run(
    key,
    controller: MPCController,
    total_segments: int,
):
    """Closed-loop MPC: repeatedly plan → execute → advance the true state.

    Returns (final_state, executed_controls, per-segment planned costs).
    Python loop over segments (host decides when to stop, like the
    reference's main.cpp driver loop); everything inside is jitted.
    """
    body, sim, env, dt = (controller.body, controller.sim, controller.env,
                          controller.dt)
    steps_per_knot = controller.plan_steps // controller.plan_knots
    exec_steps = steps_per_knot * controller.execute_knots

    @jax.jit
    def execute(state, u_exec):
        res = rollout(body, sim, env, num_steps=exec_steps, dt=dt,
                      state=state, control_sequence=u_exec)
        return res.final_state

    state = init_state(body, volume_effects=sim.volume_effects_enabled)
    warm = None
    executed = []
    costs = []
    for _ in range(total_segments):
        key, sub = jax.random.split(key)
        u, info = controller.plan(sub, state, warm_start=warm)
        u_exec = u[: controller.execute_knots]
        state = execute(state, u_exec)
        executed.append(u_exec)
        costs.append(info["best_cost"])
        # shift plan for warm start: drop executed knots, repeat the tail
        warm = jnp.concatenate(
            [u[controller.execute_knots:],
             jnp.repeat(u[-1:], controller.execute_knots, axis=0)], axis=0
        )
    return state, jnp.concatenate(executed, axis=0), jnp.stack(costs)
