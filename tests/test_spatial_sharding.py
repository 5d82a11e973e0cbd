"""Spatially-sharded rollout (halo exchange over a device mesh) must match
the single-device rollout exactly: the halo scheme recomputes boundary bonds
identically on both owners, so interiors see bit-identical inputs.

Runs on the 8-virtual-CPU-device mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state, rollout
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.parallel.spatial import (
    spatial_rollout,
    supports_spatial,
)
from jax.sharding import Mesh


def _make(X=16, Y=5, Z=4, seed=0):
    rng = np.random.default_rng(seed)
    structure = rng.integers(0, 5, size=(X, Y, Z)).astype(np.int32)
    structure[:, Y // 2, 0] = 3  # connected spine so the body hangs together
    phase = rng.uniform(-1, 1, size=(X, Y, Z))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase, dtype=jnp.float64)
    sim = SimParams()
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    return body, sim, env, dt


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_spatial_matches_unsharded(n_dev):
    body, sim, env, dt = _make()
    sim = sim.replace(init_cm_time=0.001)
    steps = 40
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("space",))

    assert supports_spatial(body, sim, env)
    res = spatial_rollout(body, sim, env, steps, dt, mesh)

    ref = rollout(body, sim, env, num_steps=steps, dt=dt)

    np.testing.assert_allclose(
        np.asarray(res.final_state.pos), np.asarray(ref.final_state.pos),
        rtol=1e-12, atol=1e-15,
    )
    np.testing.assert_allclose(
        np.asarray(res.final_state.quat), np.asarray(ref.final_state.quat),
        rtol=1e-12, atol=1e-15,
    )
    # CoM reductions sum per-shard partials -> psum; only reassociation
    # differences from the single-device sum are acceptable
    np.testing.assert_allclose(
        float(res.final_dist), float(ref.final_dist), rtol=1e-8, atol=1e-16
    )
    np.testing.assert_allclose(
        np.asarray(res.ini_cm), np.asarray(ref.ini_cm), rtol=1e-8
    )
    assert bool(res.diverged) == bool(ref.diverged)


def test_spatial_volume_effects():
    """The volume-effects carry (ts_sum/cs_area) must ride the halo too."""
    body, sim, env, dt = _make(X=8, Y=4, Z=3, seed=2)
    sim = sim.replace(volume_effects_enabled=True)
    steps = 15
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("space",))

    res = spatial_rollout(body, sim, env, steps, dt, mesh)
    ref = rollout(body, sim, env, num_steps=steps, dt=dt)
    np.testing.assert_allclose(
        np.asarray(res.final_state.pos), np.asarray(ref.final_state.pos),
        rtol=1e-12, atol=1e-15,
    )


def test_spatial_rejects_unsupported():
    body, sim, env, dt = _make(X=8, Y=4, Z=3)
    with pytest.raises(ValueError):
        spatial_rollout(
            body, sim.replace(equilibrium_mode=True), env, 4, dt,
            Mesh(np.array(jax.devices()[:2]), axis_names=("space",)),
        )
