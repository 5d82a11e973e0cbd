"""MPC shooting layer: CEM and gradient shooting improve the rollout cost."""

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.control import CEMConfig, MPCController, cem_optimize, grad_optimize, mpc_run
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import rollout
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def _body():
    rng = np.random.default_rng(3)
    structure = rng.integers(1, 5, size=(3, 3, 2)).astype(np.int32)
    pal = palette_from_list(evosoro_default_palette())
    return build_body(structure, pal, lattice_dim=0.01,
                      phase_offset=rng.uniform(0, 1, size=(3, 3, 2)))


def test_cem_improves_cost():
    body = _body()
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)  # pure control, no open-loop sinusoid
    dt = calc_max_dt(body) * sim.dt_frac
    steps = 60
    cfg = CEMConfig(num_iters=3, pop_size=8, init_std=0.05)

    u, info = cem_optimize(jax.random.PRNGKey(0), body, sim, env, steps, 3,
                           cfg, dt=dt)
    assert u.shape == (3, 3, 3, 2)
    # best cost must beat the zero-control cost
    zero = rollout(body, sim, env, num_steps=steps, dt=dt)
    zero_cost = float(-zero.norm_final_dist)
    assert float(info["best_cost"]) <= zero_cost + 1e-9
    # trace is monotone non-increasing (best-so-far)
    trace = np.asarray(info["best_cost_trace"])
    assert np.all(np.diff(trace) <= 1e-12)


def test_grad_optimize_runs_and_descends():
    body = _body()
    sim = SimParams(stop_condition_value=0.02, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)
    dt = calc_max_dt(body) * sim.dt_frac
    u, info = grad_optimize(body, sim, env, num_steps=25, num_knots=2,
                            num_iters=5, lr=5e-3, dt=dt)
    cs = np.asarray(info["cost_trace"])
    assert np.all(np.isfinite(cs))
    assert cs[-1] <= cs[0] + 1e-9


def test_mpc_closed_loop():
    body = _body()
    sim = SimParams(stop_condition_value=1.0, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)
    dt = calc_max_dt(body) * sim.dt_frac
    ctrl = MPCController(
        body=body, sim=sim, env=env, dt=dt, plan_steps=40, plan_knots=2,
        execute_knots=1, config=CEMConfig(num_iters=2, pop_size=8),
    )
    final_state, executed, costs = mpc_run(jax.random.PRNGKey(1), ctrl,
                                           total_segments=2)
    assert executed.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(final_state.pos)))
    assert np.all(np.isfinite(np.asarray(costs)))
