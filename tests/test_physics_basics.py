"""Analytic sanity tests of the physics core.

The reference ships exactly one physics check — a cantilever vs the analytic
PL³/3EI deflection, compiled but never run (reference: VX_Benchmark.cpp:34-82).
We make it real, plus a bond-frequency test and conservation-style checks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evosoro_tpu.core import (
    EnvParams,
    Material,
    SimParams,
    build_body,
    calc_max_dt,
    init_state,
    palette_from_list,
    rollout,
    sim_step,
)

F64 = jnp.float64


def _simple_palette(E=1e6, density=1e3, cte=0.0):
    return palette_from_list(
        [Material(1, "mat", elastic_mod=E, density=density, cte=cte,
                  poissons_ratio=0.0)],
        dtype=F64,
    )


def _free_env():
    return EnvParams(gravity_enabled=False, floor_enabled=False, temp_enabled=False)


def test_two_voxel_oscillation_frequency():
    """Axial stretch of a 2-voxel chain oscillates at f = sqrt(2k/m)/2π.

    (two free masses on one spring → reduced mass m/2, k = EA/L = E*L)
    """
    E, rho, L = 1e6, 1e3, 0.01
    pal = _simple_palette(E, rho)
    structure = np.zeros((2, 1, 1), np.int32)
    structure[:, 0, 0] = 1
    body = build_body(structure, pal, lattice_dim=L, dtype=F64)
    sim = SimParams(bond_damping_z=0.0, slow_damping_z=0.0)
    env = _free_env()

    state = init_state(body)
    # stretch the pair symmetrically by 0.1% of L
    delta = 0.0005 * L
    pos = state.pos.at[0, 0, 0, 0].add(-delta).at[1, 0, 0, 0].add(delta)
    state = state.replace(pos=pos)

    dt = float(calc_max_dt(body)) * 0.1  # well below stability limit
    k = E * L  # a1 = E*A/L = E*L
    m = rho * L ** 3
    f_expect = np.sqrt(2 * k / m) / (2 * np.pi)
    period_steps = int(round(1.0 / (f_expect * dt)))

    @jax.jit
    def run(state):
        def body_fn(st, _):
            st = sim_step(st, body, sim, env, dt)
            return st, st.pos[1, 0, 0, 0] - st.pos[0, 0, 0, 0]
        return jax.lax.scan(body_fn, state, None, length=3 * period_steps)

    _, seps = run(state)
    seps = np.asarray(seps) - L
    # count zero crossings → frequency
    signs = np.sign(seps)
    crossings = np.sum(signs[1:] != signs[:-1])
    f_measured = crossings / 2.0 / (3 * period_steps * dt)
    assert abs(f_measured - f_expect) / f_expect < 0.02


def test_cantilever_tip_deflection():
    """Cantilever under tip load ≈ PL³/3EI (the reference's one physics
    benchmark, VX_Benchmark.cpp:34-82 — compiled but never run there).
    Euler–Bernoulli lattice beams are nodally exact for a static tip load,
    so this converges to ~0.01% with critical bond damping."""
    n = 6
    E, rho, L = 1e6, 1e3, 0.001
    pal = _simple_palette(E, rho)
    structure = np.zeros((n, 1, 1), np.int32)
    structure[:, 0, 0] = 1
    dof = np.zeros((n, 1, 1), np.int32)
    dof[0, 0, 0] = 63  # clamp the root voxel
    P = 1e-4  # small tip load, keeps it linear
    ext_f = np.zeros((n, 1, 1, 3))
    ext_f[-1, 0, 0, 2] = -P
    body = build_body(structure, pal, lattice_dim=L, dof_fixed=dof,
                      external_force=ext_f, dtype=F64)
    sim = SimParams(bond_damping_z=1.0, slow_damping_z=0.01)
    env = _free_env()

    dt = float(calc_max_dt(body)) * 0.9

    @jax.jit
    def run(state):
        def body_fn(st, _):
            return sim_step(st, body, sim, env, dt), None
        st, _ = jax.lax.scan(body_fn, state, None, length=10000)
        return st

    final = run(init_state(body))
    tip_deflect = float(final.pos[-1, 0, 0, 2] - body.nom_pos[-1, 0, 0, 2])

    I = L ** 4 / 12
    # beam length: root voxel is clamped; flexible length spans the (n-1) bonds
    Lbeam = (n - 1) * L
    analytic = -P * Lbeam ** 3 / (3 * E * I)
    assert tip_deflect < 0  # bends down
    assert abs(tip_deflect - analytic) / abs(analytic) < 0.01


def test_rigid_body_momentum_free_fall():
    """Gravity, no floor: CoM must obey projectile motion exactly."""
    pal = _simple_palette()
    structure = np.ones((2, 2, 2), np.int32)
    body = build_body(structure, pal, lattice_dim=0.01, dtype=F64)
    # slow_damping_z=0: the reference's ground damping acts on absolute
    # velocity, which would (correctly) slow free fall
    sim = SimParams(slow_damping_z=0.0)
    env = EnvParams(floor_enabled=False, temp_enabled=False)
    dt = float(calc_max_dt(body)) * 0.9
    steps = 200

    @jax.jit
    def run(state):
        def body_fn(st, _):
            return sim_step(st, body, sim, env, dt), None
        st, _ = jax.lax.scan(body_fn, state, None, length=steps)
        return st

    final = run(init_state(body))
    from evosoro_tpu.core import center_of_mass
    cm0 = np.asarray(center_of_mass(init_state(body), body))
    cm1 = np.asarray(center_of_mass(final, body))
    # semi-implicit Euler: z(n) = z0 + g*dt²*n(n+1)/2
    expect_dz = -9.81 * dt * dt * steps * (steps + 1) / 2
    np.testing.assert_allclose(cm1[2] - cm0[2], expect_dz, rtol=1e-6)
    np.testing.assert_allclose(cm1[:2], cm0[:2], atol=1e-12)


def test_floor_rest_and_no_sinking():
    """A block dropped from rest onto the floor settles near zero penetration."""
    pal = _simple_palette(E=1e7)
    structure = np.ones((2, 2, 2), np.int32)
    body = build_body(structure, pal, lattice_dim=0.01, dtype=F64)
    sim = SimParams()
    env = EnvParams(temp_enabled=False)
    dt = float(calc_max_dt(body)) * 0.9

    @jax.jit
    def run(state):
        def body_fn(st, _):
            return sim_step(st, body, sim, env, dt), None
        st, _ = jax.lax.scan(body_fn, state, None, length=5000)
        return st

    final = run(init_state(body))
    z_bottom = np.asarray(final.pos[..., 2]).min()
    # resting: bottom voxel centers near scale/2 above floor (small sag ok)
    assert z_bottom > 0.0
    assert z_bottom < 0.006
    assert not bool(final.diverged)


def test_thermal_actuation_moves_robot():
    """A 2-material (active/passive) bar on the floor with sinusoidal
    actuation must locomote (nonzero CoM displacement) and not diverge."""
    pal = palette_from_list(
        [
            Material(1, "soft", elastic_mod=1e7, density=1e6, poissons_ratio=0.35),
            Material(3, "act+", elastic_mod=1e7, density=1e6, cte=0.01,
                     poissons_ratio=0.35),
            Material(4, "act-", elastic_mod=1e7, density=1e6, cte=-0.01,
                     poissons_ratio=0.35),
        ],
        dtype=F64,
    )
    structure = np.zeros((4, 2, 2), np.int32)
    structure[:2] = 3
    structure[2:] = 4
    phase = np.zeros((4, 2, 2))
    body = build_body(structure, pal, lattice_dim=0.01, phase_offset=phase, dtype=F64)
    sim = SimParams(stop_condition_value=0.3, init_cm_time=0.05)
    env = EnvParams(temp_amplitude=39.0, temp_period=0.25)

    dt = float(calc_max_dt(body)) * 0.9
    import math
    steps = int(math.ceil(0.3 / dt))
    res = jax.jit(lambda: rollout(body, sim, env, num_steps=steps, dt=dt))()
    assert not bool(res.diverged)
    assert float(res.norm_final_dist) > 0.0
    # scales actually actuate: some voxel left nominal size
    assert abs(float(jnp.max(jnp.abs(res.final_state.scale - 0.01)))) > 1e-5


def test_vmap_batch_consistency():
    """vmapped rollouts must equal individually-run rollouts."""
    pal = _simple_palette(cte=0.01)
    structure = np.ones((2, 2, 1), np.int32)
    phases = jnp.asarray(np.random.default_rng(0).uniform(0, 1, size=(2, 2, 2, 1)))

    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.0)
    env = EnvParams()

    def single(phase):
        body = build_body(structure, pal, lattice_dim=0.01, phase_offset=phase,
                          dtype=F64)
        return rollout(body, sim, env, num_steps=30).norm_final_dist

    batched = jax.jit(jax.vmap(single))(phases)
    single_jit = jax.jit(single)
    individual = jnp.stack([single_jit(p) for p in phases])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(individual),
                               rtol=1e-9, atol=1e-12)
