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


def test_validate_ss_data_derives_scalars():
    """ValidateSSData semantics (reference: VX_Object.cpp:1545-1605):
    E = first-segment slope, fail_strain = last point, FM_MAXSTRAIN, and
    yield at the 0.2%-offset intersection."""
    from evosoro_tpu.core.types import FM_MAXSTRAIN, MDL_DATA, validate_ss_data

    m = Material(1, mat_model=MDL_DATA,
                 ss_strain=(0.0, 0.01, 0.05, 0.10),
                 ss_stress=(0.0, 5e4, 9e4, 9.5e4))
    v = validate_ss_data(m)
    E = 5e4 / 0.01
    assert v.elastic_mod == pytest.approx(E)
    assert v.plastic_mod == pytest.approx(E)
    assert v.fail_strain == pytest.approx(0.10)
    assert v.fail_stress == 0.0
    assert v.fail_model == FM_MAXSTRAIN
    # 0.2% offset line y = E(x - 0.002) intersects segment [0.01, 0.05]:
    mt = (9e4 - 5e4) / (0.05 - 0.01)
    bt = 5e4 - mt * 0.01
    xint = (bt + 0.002 * E) / (E - mt)
    want_yield = 5e4 + (xint - 0.01) / (0.05 - 0.01) * (9e4 - 5e4)
    assert v.yield_stress == pytest.approx(want_yield)

    # malformed tables raise
    with pytest.raises(ValueError):
        validate_ss_data(Material(1, ss_strain=(0.0,), ss_stress=(0.0,)))
    with pytest.raises(ValueError):
        validate_ss_data(Material(1, ss_strain=(0.01, 0.02),
                                  ss_stress=(0.0, 1.0)))
    with pytest.raises(ValueError):
        validate_ss_data(Material(1, ss_strain=(0.0, 0.02, 0.02),
                                  ss_stress=(0.0, 1.0, 2.0)))


def test_model_stress_data_table():
    """MDL_DATA stress lookup vs the hand-evaluated reference algorithm
    (VX_Object.cpp:1499-1532): compression extrapolates the first segment,
    in-data strains interpolate, past-fail extrapolates the last slope when
    increasing and goes flat when decreasing."""
    from evosoro_tpu.core.types import MDL_DATA

    def make_ss(xs_t, ys_t):
        pal = palette_from_list(
            [Material(1, mat_model=MDL_DATA, ss_strain=xs_t, ss_stress=ys_t)],
            dtype=jnp.float64,
        )
        structure = np.ones((1, 1, 1), dtype=np.int32)
        body = build_body(structure, pal, dtype=jnp.float64)
        return body, pal

    xs_t = (0.0, 0.01, 0.05, 0.10)
    ys_t = (0.0, 5e4, 9e4, 9.5e4)
    body, pal = make_ss(xs_t, ys_t)
    ss = dict(xs=body.ss_strain_vox, ys=body.ss_stress_vox,
              fail=body.ss_fail_strain_vox,
              last_stress=body.ss_last_stress_vox,
              last_slope=body.ss_last_slope_vox)
    args = (body.e_mod, body.mat_model_vox, body.plastic_mod,
            body.yield_stress)
    E = 5e4 / 0.01

    def stress(s):
        grid = jnp.full((1, 1, 1), s, dtype=jnp.float64)
        return float(_vox_mat_stress(grid, *args, ss=ss)[0, 0, 0])

    assert stress(-0.3) == pytest.approx(E * -0.3)          # compression
    assert stress(0.005) == pytest.approx(E * 0.005)        # first segment
    assert stress(0.03) == pytest.approx(5e4 + 0.5 * 4e4)   # interp seg 2
    assert stress(0.07) == pytest.approx(9e4 + (0.02 / 0.05) * 0.5e4)
    last_slope = (9.5e4 - 9e4) / 0.05
    assert stress(0.2) == pytest.approx(9.5e4 + last_slope * 0.1)  # past fail

    # decreasing final slope → flat past-fail stress
    body2, _ = make_ss((0.0, 0.01, 0.05), (0.0, 5e4, 4e4))
    ss2 = dict(xs=body2.ss_strain_vox, ys=body2.ss_stress_vox,
               fail=body2.ss_fail_strain_vox,
               last_stress=body2.ss_last_stress_vox,
               last_slope=body2.ss_last_slope_vox)
    args2 = (body2.e_mod, body2.mat_model_vox, body2.plastic_mod,
             body2.yield_stress)
    grid = jnp.full((1, 1, 1), 0.5, dtype=jnp.float64)
    got = float(_vox_mat_stress(grid, *args2, ss=ss2)[0, 0, 0])
    assert got == pytest.approx(4e4)


def test_data_model_step_forces_follow_table():
    """Stretch a 2-voxel bar past the table's first segment: the axial bond
    force must follow the interpolated table stress (softer than linear),
    while the equivalent linear body follows E·strain."""
    from evosoro_tpu.core.types import MDL_DATA

    E = 5e6
    kink = 0.01
    data_mats = [Material(1, "soft", mat_model=MDL_DATA,
                          ss_strain=(0.0, kink, 0.5),
                          ss_stress=(0.0, E * kink, E * kink + 0.1 * E * 0.49))]
    lin_mats = [Material(1, "soft", elastic_mod=E)]
    s = np.zeros((2, 1, 1), dtype=np.int32)
    s[:, 0, 0] = 1
    b_data = build_body(s, palette_from_list(data_mats))
    b_lin = build_body(s, palette_from_list(lin_mats))
    assert not b_data.all_linear and b_lin.all_linear

    env = EnvParams(gravity_enabled=False, floor_enabled=False,
                    temp_enabled=False)
    # zero damping: the imposed displacement would otherwise read as a huge
    # one-step velocity in the damping reference frames
    sim = SimParams(bond_damping_z=0.0, col_damping_z=0.0, slow_damping_z=0.0)
    strain = 0.1  # past the kink
    L = float(b_data.nominal_size)

    def axial_force(body):
        st = init_state(body)
        pos = np.asarray(st.pos).copy()
        pos[1, 0, 0, 0] += strain * L  # stretch the x bond
        st = st.replace(pos=jnp.asarray(pos))
        new = sim_step(st, body, sim, env, 1e-6)
        # impulse on voxel 0 over dt reveals the bond force
        return float(new.linmom[0, 0, 0, 0]) / 1e-6

    f_data = axial_force(b_data)
    f_lin = axial_force(b_lin)
    area = L * L
    want_lin = E * strain * area
    want_data = (E * kink + 0.1 * E * (strain - kink)) * area
    assert f_lin == pytest.approx(want_lin, rel=1e-3)
    assert f_data == pytest.approx(want_data, rel=1e-3)
    assert f_data < 0.5 * f_lin


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
