"""Visualization layer: trajectory recording + headless rendering
(the VoxCad-GUI capability analog, SURVEY.md §2.2 'GUI (off-path)')."""

import os

import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.viz import record_trajectory, render_state, save_animation


def _body(n=4):
    rng = np.random.default_rng(0)
    structure = rng.integers(0, 5, size=(n, n, n)).astype(np.int32)
    structure[n // 2, n // 2, 0] = 3
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    return build_body(structure, palette, phase_offset=phase)


def test_record_trajectory_shapes():
    body = _body()
    sim = SimParams(init_cm_time=0.001)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    traj = record_trajectory(body, sim, env, num_steps=47, dt=dt, every=10)
    assert traj.pos.shape[0] == 4  # frames at steps 0, 10, 20, 30
    assert traj.quat.shape[-1] == 4
    # the final state must reflect all 47 steps
    np.testing.assert_allclose(
        float(traj.final_state.time), 47 * float(dt), rtol=1e-6
    )
    assert np.isfinite(np.asarray(traj.pos)).all()


def test_render_and_animate(tmp_path):
    body = _body()
    sim = SimParams(init_cm_time=0.001)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    traj = record_trajectory(body, sim, env, num_steps=30, dt=dt, every=10)

    png = os.path.join(tmp_path, "state.png")
    render_state(body, traj.final_state, path=png)
    assert os.path.getsize(png) > 1000

    gif = os.path.join(tmp_path, "clip.gif")
    save_animation(body, traj, gif, fps=5)
    assert os.path.getsize(gif) > 1000
