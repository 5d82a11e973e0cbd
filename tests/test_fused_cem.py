"""Fused-kernel CEM (one kernel launch per iteration) vs semantics of the
general jnp CEM: costs finite, improvement over iterations, controls within
the box. Interpreter mode on CPU keeps sizes tiny."""

import jax
import numpy as np

from evosoro_tpu.control.shooting import CEMConfig, cem_optimize_fused
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def test_fused_cem_improves():
    rng = np.random.default_rng(0)
    structure = np.full((3, 3, 2), 3, dtype=np.int32)
    phase = rng.uniform(-1, 1, size=(3, 3, 2))
    body = build_body(
        structure, palette_from_list(evosoro_default_palette()),
        phase_offset=phase,
    )
    sim = SimParams(init_cm_time=0.001)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac

    cfg = CEMConfig(num_iters=3, pop_size=8, init_std=0.05)
    u, info = cem_optimize_fused(
        jax.random.PRNGKey(0), body, sim, env, num_steps=30, num_knots=2,
        config=cfg, dt=dt, interpret=True,
    )
    trace = np.asarray(info["best_cost_trace"])
    assert np.isfinite(trace).all()
    assert trace[-1] <= trace[0] + 1e-12  # best cost is monotone
    assert float(np.abs(np.asarray(u)).max()) <= cfg.u_clip + 1e-7
    assert info["best_cost"] < 1e9  # nothing diverged


def test_fused_mpc_closed_loop():
    """make_fused_mpc_closed_loop: plan/execute/warm-shift entirely inside
    one jitted scan. The executed trajectory must advance sim time by
    n_segments x exec_steps x dt, planned costs stay finite, and the warm
    replans keep the loop stable (no divergence latch)."""
    import jax.numpy as jnp

    import importlib

    from evosoro_tpu.control.shooting import make_fused_mpc_closed_loop

    frmod = importlib.import_module("evosoro_tpu.ops.fused_rollout")

    rng = np.random.default_rng(1)
    structure = np.full((3, 3, 2), 3, dtype=np.int32)
    phase = rng.uniform(-1, 1, size=(3, 3, 2))
    body = build_body(
        structure, palette_from_list(evosoro_default_palette()),
        phase_offset=phase,
    )
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac

    cfg = CEMConfig(num_iters=2, pop_size=8, init_std=0.05)
    run, aux = make_fused_mpc_closed_loop(
        body, sim, env, plan_steps=16, plan_knots=4, exec_knots=2,
        config=cfg, dt=dt, interpret=True,
    )
    n_seg = 3
    seg_keys = jax.random.split(jax.random.PRNGKey(0), n_seg)
    mean0 = jnp.zeros(aux["shape"], jnp.float32)
    std0 = jnp.full(aux["shape"], cfg.init_std, jnp.float32)
    state8, stats8, costs = run(seg_keys, aux["state8"], aux["stats8"],
                                mean0, std0)
    assert np.isfinite(np.asarray(costs)).all()
    assert np.asarray(costs).shape == (n_seg,)
    # time advanced by exactly the executed horizon
    t = float(np.asarray(stats8[0, frmod._S_TIME]))
    expect = n_seg * aux["exec_steps"] * float(dt)
    np.testing.assert_allclose(t, expect, rtol=1e-5)
    assert not bool(np.asarray(stats8[:, frmod._S_DIV] > 0.5).any())
