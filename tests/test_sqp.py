"""SQP (Gauss-Newton/LM) shooting: the damped-Newton subproblem must reduce
the tracking cost on a small actuated body, and compose with the CEM warm
start."""

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.control.sqp import SQPConfig, sqp_optimize
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def _tiny_body(n=3):
    rng = np.random.default_rng(0)
    structure = np.full((n, n, 2), 3, dtype=np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, 2))
    palette = palette_from_list(evosoro_default_palette())
    return build_body(structure, palette, phase_offset=phase, dtype=jnp.float64)


def test_sqp_reduces_tracking_cost():
    body = _tiny_body()
    sim = SimParams(init_cm_time=0.0005)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    steps, K = 24, 3
    cfg = SQPConfig(num_iters=3, cg_iters=3, n_res=4, w_reg=1e-2)

    u, info = sqp_optimize(
        body, sim, env, steps, K, target=0.05, config=cfg, dt=dt
    )
    costs = np.asarray(info["cost_trace"])
    assert np.isfinite(costs).all()
    # the damped-Newton loop must find at least one cost-reducing step
    assert bool(np.asarray(info["accepted_trace"]).any())
    assert float(info["best_cost"]) <= float(costs[0])
    assert np.abs(np.asarray(u)).max() <= cfg.u_clip + 1e-12


def test_sqp_zero_target_prefers_zero_control():
    """With target 0 and no actuation (cte=0 everywhere via phase irrelevance
    ... the regularizer should keep u near zero)."""
    body = _tiny_body()
    sim = SimParams(init_cm_time=0.0005)
    env = EnvParams(temp_enabled=False)
    dt = calc_max_dt(body) * sim.dt_frac
    cfg = SQPConfig(num_iters=2, cg_iters=2, n_res=4, w_reg=1.0)
    u, info = sqp_optimize(
        body, sim, env, 16, 2, target=0.0, config=cfg, dt=dt
    )
    assert float(jnp.abs(u).max()) < 0.05


def test_sqp_fused_reduces_tracking_cost():
    """sqp_optimize_fused: Gauss-Newton over the FUSED kernel's segment-
    differentiable rollout (Jacobian rows ride batch lanes; Woodbury-exact
    subproblem). Interpret mode on CPU; the cost trace must show accepted
    cost-reducing steps within the control box."""
    from evosoro_tpu.control.sqp import sqp_optimize_fused

    rng = np.random.default_rng(0)
    structure = np.full((3, 3, 2), 3, dtype=np.int32)
    phase = rng.uniform(-1, 1, size=(3, 3, 2))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase,
                      dtype=jnp.float32)
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    steps, K = 8, 2
    cfg = SQPConfig(num_iters=1, w_reg=1e-2)

    u, info = sqp_optimize_fused(
        body, sim, env, steps, K, target=0.05, config=cfg, dt=dt,
        n_res=4, interpret=True,
    )
    costs = np.asarray(info["cost_trace"])
    assert np.isfinite(costs).all()
    assert bool(np.asarray(info["accepted_trace"]).any())
    assert float(info["best_cost"]) <= float(costs[0])
    assert np.abs(np.asarray(u)).max() <= cfg.u_clip + 1e-12
    assert u.shape == (K,) + body.occ.shape
