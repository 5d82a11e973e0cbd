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
