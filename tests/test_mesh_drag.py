"""Mesh-accurate facet drag (land_water model) vs the voxel-face
approximation: on an undeformed lattice with a uniform velocity field and
identity orientations, the two are analytically identical — each exposed
face contributes −C·scale²·v_n²·n̂ to its owner voxel."""

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state, rollout
from evosoro_tpu.core.step import _fluid_drag
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.envs.drag import attach_mesh_drag, mesh_drag_forces


def _body(n=4, seed=0):
    rng = np.random.default_rng(seed)
    structure = rng.integers(0, 5, size=(n, n, n)).astype(np.int32)
    structure[n // 2, n // 2, n // 2] = 3
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    return build_body(structure, palette, phase_offset=phase, dtype=jnp.float64)


def test_mesh_drag_matches_voxel_drag_undeformed():
    body = attach_mesh_drag(_body())
    env = EnvParams(fluid_environment=True, aggregate_drag_coefficient=750.0)
    state = init_state(body)

    v = jnp.asarray([0.13, -0.07, 0.4])
    linmom = jnp.where(
        body.occ[..., None], body.mass[..., None] * v, 0.0
    )
    state = state.replace(linmom=linmom)
    vel = state.linmom * body.mass_inv[..., None]

    f_vox = _fluid_drag(state, body, env, vel)
    f_mesh = mesh_drag_forces(
        state.pos, state.quat, state.scale, state.linmom, body.mass_inv,
        body.mesh_drag, env.aggregate_drag_coefficient,
    )
    np.testing.assert_allclose(
        np.asarray(f_mesh), np.asarray(f_vox), rtol=1e-9, atol=1e-12
    )


def test_mesh_drag_swimming_rollout_runs():
    body = attach_mesh_drag(_body(seed=2))
    sim = SimParams(init_cm_time=0.001)
    env = EnvParams(
        fluid_environment=True,
        aggregate_drag_coefficient=0.5 * 1.5 * 1000.0,  # swimming_basic.py
        gravity_enabled=True,  # disabled internally in fluid (neutral buoyancy)
        floor_enabled=True,
    )
    dt = calc_max_dt(body) * sim.dt_frac
    res = rollout(body, sim, env, num_steps=60, dt=dt)
    assert np.isfinite(np.asarray(res.final_state.pos)).all()
    assert not bool(res.diverged)
    # drag must actually damp motion: kinetic energy stays bounded
    ke = float(res.final_state.ke_history[0])
    assert np.isfinite(ke)


def test_mesh_drag_opposes_motion():
    """Total drag power must be non-positive (forces oppose velocity)."""
    body = attach_mesh_drag(_body(seed=3))
    state = init_state(body)
    rng = np.random.default_rng(0)
    linmom = jnp.asarray(rng.normal(size=state.linmom.shape)) * body.mass[..., None]
    state = state.replace(linmom=linmom)
    f = mesh_drag_forces(
        state.pos, state.quat, state.scale, state.linmom, body.mass_inv,
        body.mesh_drag, 100.0,
    )
    vel = state.linmom * body.mass_inv[..., None]
    power = float(jnp.sum(f * vel))
    assert power <= 1e-12
