"""Nonlinear material models + volume effects (reference:
VX_Object.cpp:1472-1535 GetModelStress; VXS_Voxel.cpp:543-632 and
VXS_BondInternal.cpp:200-222 volume-effects coupling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evosoro_tpu.core.materials import build_body, palette_from_list
from evosoro_tpu.core.rollout import init_state, rollout
from evosoro_tpu.core.step import _vox_mat_stress, sim_step
from evosoro_tpu.core.types import (
    EnvParams,
    Material,
    MDL_BILINEAR,
    MDL_LINEAR,
    SimParams,
    evosoro_default_palette,
)


def test_model_stress_linear_and_bilinear():
    e = jnp.asarray(5e6)
    ys = jnp.asarray(1e5)  # yield strain 0.02
    pm = jnp.asarray(1e6)
    # linear: stress = E*strain everywhere
    for s in (-0.1, 0.0, 0.01, 0.5):
        got = _vox_mat_stress(jnp.asarray(s), e, jnp.asarray(MDL_LINEAR), pm, ys)
        assert np.isclose(float(got), 5e6 * s)
    # bilinear below yield == linear
    got = _vox_mat_stress(jnp.asarray(0.01), e, jnp.asarray(MDL_BILINEAR), pm, ys)
    assert np.isclose(float(got), 5e6 * 0.01)
    # bilinear above yield kinks to the plastic modulus
    # (reference: VX_Object.cpp:1497-1504)
    got = _vox_mat_stress(jnp.asarray(0.05), e, jnp.asarray(MDL_BILINEAR), pm, ys)
    assert np.isclose(float(got), 1e5 + 1e6 * (0.05 - 0.02))


def _body(palette, n=4, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    return build_body(s, palette, phase_offset=rng.uniform(-1, 1, size=(n, n, n)))


def test_bilinear_differs_once_yielding():
    """A palette whose muscle yields at tiny strain must produce a different
    trajectory from the pure-linear palette under identical actuation."""
    lin = evosoro_default_palette()
    soft = [
        Material(m.id, m.name, m.elastic_mod, cte=m.cte,
                 mat_model=MDL_BILINEAR, plastic_mod=m.elastic_mod * 0.01,
                 yield_stress=m.elastic_mod * 1e-4)
        for m in lin
    ]
    b1 = _body(palette_from_list(lin))
    b2 = _body(palette_from_list(soft))
    assert b1.all_linear and not b2.all_linear
    r1 = rollout(b1, SimParams(), EnvParams(), num_steps=300)
    r2 = rollout(b2, SimParams(), EnvParams(), num_steps=300)
    assert not bool(r1.diverged) and not bool(r2.diverged)
    assert not np.allclose(
        np.asarray(r1.final_state.pos), np.asarray(r2.final_state.pos), atol=1e-9
    )


def test_volume_effects_rollout_stable_and_coupled():
    body = _body(palette_from_list(evosoro_default_palette()))
    sim = SimParams(volume_effects_enabled=True)
    res = rollout(body, sim, EnvParams(), num_steps=200)
    assert not bool(res.diverged)
    assert np.all(np.isfinite(np.asarray(res.final_state.pos)))
    # coupling state is populated (nonzero transverse strains under gravity)
    assert res.final_state.ts_sum is not None
    assert np.any(np.asarray(res.final_state.ts_sum) != 0.0)
    # cross-section areas stay near L² but deform
    L2 = float(body.nominal_size) ** 2
    cs = np.asarray(res.final_state.cs_area)
    assert np.all(cs > 0.5 * L2) and np.all(cs < 2.0 * L2)


def test_volume_effects_requires_coupling_state():
    body = _body(palette_from_list(evosoro_default_palette()))
    sim = SimParams(volume_effects_enabled=True)
    state = init_state(body)  # missing volume_effects=True
    with pytest.raises(ValueError):
        sim_step(state, body, sim, EnvParams(), 1e-4)


def test_volume_effects_vs_off_trajectories_differ():
    body = _body(palette_from_list(evosoro_default_palette()))
    r_on = rollout(body, SimParams(volume_effects_enabled=True), EnvParams(),
                   num_steps=200)
    r_off = rollout(body, SimParams(), EnvParams(), num_steps=200)
    assert not np.allclose(
        np.asarray(r_on.final_state.pos), np.asarray(r_off.final_state.pos),
        atol=1e-9,
    )


def test_bond_eh_per_side_harmonic():
    """Eh must be the harmonic mean of per-side Eᵢ/((1-2uᵢ)(1+uᵢ)) — the
    reference's live VX_Bond.cpp code — not Eh(E_comp, u_comp) (ADVICE r1)."""
    from evosoro_tpu.core.materials import build_body, palette_from_list
    from evosoro_tpu.core.types import Material

    E1, u1 = 1e6, 0.4
    E2, u2 = 5e6, 0.1
    pal = palette_from_list([
        Material(1, elastic_mod=E1, poissons_ratio=u1),
        Material(2, elastic_mod=E2, poissons_ratio=u2),
    ])
    structure = np.zeros((2, 1, 1), dtype=np.int32)
    structure[0, 0, 0] = 1
    structure[1, 0, 0] = 2
    body = build_body(structure, pal)

    e1h = E1 / ((1 - 2 * u1) * (1 + u1))
    e2h = E2 / ((1 - 2 * u2) * (1 + u2))
    want = 2 * e1h * e2h / (e1h + e2h)
    got = float(body.bond_eh[0, 0, 0, 0])
    assert got == pytest.approx(want, rel=1e-5)
