"""Parity of the fused Pallas rollout kernel (interpreter mode, CPU) against
the general jnp stencil `core.step.sim_step` / `core.rollout.rollout`.

The kernel replicates the jnp step's f32 numerics op-for-op, so short-horizon
trajectories should agree to float32 roundoff; statistics (divergence latch,
IniCM capture) follow core/rollout.py semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.ops.fused_rollout import (
    fused_rollout,
    locomotion_fitness,
    supports,
)


def _make(batch=8, n=5, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    structure = rng.integers(0, 5, size=(n, n, n)).astype(np.int32)
    structure[n // 2, n // 2, 0] = 3
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase, dtype=dtype)
    sim = SimParams()
    env = EnvParams()
    dt = jnp.asarray(calc_max_dt(body), dtype) * jnp.asarray(sim.dt_frac, dtype)
    state = init_state(body, dtype=dtype)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state
    )
    return batched, body, sim, env, dt


def _jnp_steps(batched, body, sim, env, dt, steps):
    def one(s):
        def step(s, _):
            return sim_step(s, body, sim, env, dt), ()

        s, _ = jax.lax.scan(step, s, None, length=steps)
        return s

    return jax.jit(jax.vmap(one))(batched)


@pytest.mark.parametrize("steps", [1, 25])
def test_fused_matches_jnp_step(steps):
    batched, body, sim, env, dt = _make()
    assert supports(body, sim, env)

    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )

    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.quat), np.asarray(ref.quat), rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.linmom), np.asarray(ref.linmom), rtol=1e-4, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=1e-6, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.time), np.asarray(ref.time), rtol=1e-6
    )
    assert np.array_equal(np.asarray(out.small_angle), np.asarray(ref.small_angle))
    assert not bool(np.any(np.asarray(stats.diverged)))


def test_fused_longer_actuated_locomotion():
    """Past init_cm_time the actuation kicks in; CoM capture + fitness must
    track the jnp rollout's NormFinalDist within f32 drift."""
    batched, body, sim, env, dt = _make(batch=8, n=4, seed=3)
    # shorten the pre-actuation settle so actuation happens within the test
    # (dt here is ~6.4e-5 s, so actuation starts ~step 32)
    sim = sim.replace(init_cm_time=0.002, stop_condition_value=0.1)
    steps = 120

    from evosoro_tpu.core.rollout import rollout

    def ref_one(s):
        return rollout(body, sim, env, num_steps=steps, dt=dt, state=s)

    ref = jax.jit(jax.vmap(ref_one))(batched)

    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    fit = locomotion_fitness(out, body, stats)

    np.testing.assert_allclose(
        np.asarray(stats.ini_cm), np.asarray(ref.ini_cm), rtol=1e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(fit),
        np.asarray(jnp.where(ref.diverged, 0.0, ref.final_dist)),
        rtol=5e-3, atol=1e-5,
    )


def test_fused_stop_time_freezes():
    batched, body, sim, env, dt = _make(batch=8, n=4, seed=1)
    stop = float(dt) * 10.5
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=30, dt=dt, stop_time=stop,
        interpret=True,
    )
    # time freezes at the first step whose pre-step time >= stop
    t = np.asarray(stats.time)
    assert np.all(t <= stop + float(dt) * 1.001)
    assert np.all(t >= stop - float(dt) * 0.001)


def test_fused_control_sequence_matches_jnp():
    batched, body, sim, env, dt = _make(batch=8, n=4, seed=2)
    steps, K = 20, 4
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        rng.uniform(-0.05, 0.05, size=(8, K) + body.occ.shape), jnp.float32
    )

    def one(s, ui):
        def step(carry, i):
            knot = jnp.minimum(i * K // steps, K - 1)
            return (
                sim_step(carry, body, sim, env, dt, control_offset=ui[knot]),
                (),
            )

        s, _ = jax.lax.scan(step, s, jnp.arange(steps))
        return s

    ref = jax.jit(jax.vmap(one))(batched, u)
    out, _ = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt,
        control_sequence=u, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=1e-5, atol=0
    )


def test_fused_devo_growth_matches_jnp():
    """Linear development (growth.py's envelope: initial/final voxel sizes,
    growth window, size-capped actuation) inside the fused kernel must track
    the jnp step."""
    rng = np.random.default_rng(7)
    n = 4
    structure = np.full((n, n, n), 3, dtype=np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    L = 0.01
    init_size = (1.0 + 0.8 * rng.uniform(-1, 1, size=(n, n, n))) * L
    final_size = (1.0 + 0.8 * rng.uniform(-1, 1, size=(n, n, n))) * L
    growth_time = rng.uniform(0.001, 0.004, size=(n, n, n))
    start_gt = rng.uniform(0.0005, 0.002, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(
        structure, palette, phase_offset=phase,
        initial_voxel_size=init_size, final_voxel_size=final_size,
        growth_time=growth_time, start_growth_time=start_gt,
        dtype=jnp.float32,
    )
    sim = SimParams(init_cm_time=0.001, min_temp_fact=0.4)
    env = EnvParams(growth_amplitude=0.8)
    dt = jnp.asarray(calc_max_dt(body), jnp.float32) * jnp.asarray(
        sim.dt_frac, jnp.float32
    )
    state = init_state(body, dtype=jnp.float32)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 80

    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=2e-5, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=5e-5, atol=1e-8
    )


def test_fused_collision_matches_jnp():
    """Self-collision inside the fused kernel (dense Vp×Vp pair field) must
    match core.collision's masked S×S path through an actual contact event:
    a free voxel flying at a bonded pair, bouncing off the 0.75·(s1+s2)
    sphere envelope (reference: VXS_BondCollision.cpp:41-59)."""
    from evosoro_tpu.core.collision import attach_collision_system

    structure = np.zeros((4, 1, 1), dtype=np.int32)
    structure[:2, 0, 0] = 1  # bonded pair (lattice-nearby → excluded)
    structure[3, 0, 0] = 1  # free voxel, 1-cell gap
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, lattice_dim=0.01)
    body = attach_collision_system(body)
    sim = SimParams(self_collisions_enabled=True)
    env = EnvParams(gravity_enabled=False, floor_enabled=False,
                    temp_enabled=False)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)

    state = init_state(body)
    # launch the free voxel at the pair: gap 0.02 m, contact below 0.015 m
    linmom = state.linmom.at[3, 0, 0, 0].set(-2.0 * float(body.mass[3, 0, 0]))
    state = state.replace(linmom=linmom)
    batch = 8
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state
    )
    steps = 60

    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    # the contact must actually have happened: the flying voxel bounced
    assert float(ref.linmom[0, 3, 0, 0, 0]) > 0.0
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.linmom), np.asarray(ref.linmom), rtol=1e-4, atol=1e-8
    )
    assert not bool(np.any(np.asarray(stats.diverged)))


def test_fused_collision_no_false_contacts():
    """With the dense pair field, bonded/nearby voxels (a1 = 0 rows) must
    contribute exactly zero force: a quiescent bonded body with collision
    enabled integrates bit-identically to the collision-free kernel."""
    from evosoro_tpu.core.collision import attach_collision_system

    # solid block: every surface pair within the 1.5·L contact envelope is
    # ≤2 bond hops away → excluded by the lattice-nearby rule, so collision
    # must change nothing (a porous random blob would NOT qualify: diagonal
    # pairs across a gap are legitimately in contact at √2·L < 1.5·L)
    rng = np.random.default_rng(5)
    n = 4
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    structure[:] = np.maximum(structure, 1)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sim = SimParams()
    env = EnvParams()
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    body_col = attach_collision_system(body)
    sim_col = sim.replace(self_collisions_enabled=True)
    steps = 20
    out_plain, _ = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    out_col, _ = fused_rollout(
        batched, body_col, sim_col, env, num_steps=steps, dt=dt,
        interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_col.pos), np.asarray(out_plain.pos), rtol=0, atol=1e-7
    )


def test_fused_volume_effects_matches_jnp():
    """Volume effects (Poisson coupling + thermal stress actuation,
    reference: VXS_BondInternal.cpp:200-298, VXS_Voxel.cpp:543-632) in the
    fused kernel vs the jnp step: the TSavg/CSavg carry, the Eh/u composite
    stress, the thermal subtraction and the /1.01 angular damping must all
    line up over an actuated multi-material trajectory."""
    from evosoro_tpu.core.rollout import init_state as _init

    rng = np.random.default_rng(7)
    n = 4
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sim = SimParams(volume_effects_enabled=True, init_cm_time=0.0)
    env = EnvParams(temp_amplitude=10.0)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = _init(body, volume_effects=True)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 80

    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    # coupling is active (transverse strains nonzero)
    assert np.any(np.asarray(ref.ts_sum) != 0.0)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-4, atol=2e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=1e-5, atol=0
    )
    # the carried coupling state round-trips (both sides average-preserving)
    ts_ref = 0.5 * (np.asarray(ref.ts_sum)[:, 0] + np.asarray(ref.ts_sum)[:, 1])
    ts_out = 0.5 * (np.asarray(out.ts_sum)[:, 0] + np.asarray(out.ts_sum)[:, 1])
    np.testing.assert_allclose(ts_out, ts_ref, rtol=2e-3, atol=1e-6)
    cs_ref = 0.5 * (np.asarray(ref.cs_area)[:, 0] + np.asarray(ref.cs_area)[:, 1])
    cs_out = 0.5 * (np.asarray(out.cs_area)[:, 0] + np.asarray(out.cs_area)[:, 1])
    np.testing.assert_allclose(cs_out, cs_ref, rtol=1e-4)
    assert not bool(np.any(np.asarray(stats.diverged)))


def test_fused_fluid_drag_matches_jnp():
    """Fluid environments in the fused kernel: voxel-face quadratic drag
    (core.step._fluid_drag), no gravity/floor, and the land_water fork's
    simpler actuation (hard 0.1 temp-factor floor) must track the jnp path
    through an actuated swimming trajectory."""
    rng = np.random.default_rng(11)
    n = 4
    structure = rng.integers(0, 5, size=(n, n, n)).astype(np.int32)
    structure[:, :, 0] = 3  # ensure actuated voxels
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(fluid_environment=True, gravity_enabled=False,
                    floor_enabled=False, aggregate_drag_coefficient=375.0)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 100

    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    # the swimmer must actually have moved (drag-actuation interplay)
    assert float(np.abs(np.asarray(ref.linmom)).max()) > 0
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=1e-6, atol=0
    )
    # momenta accumulate f32 op-ordering noise linearly (~2e-7/step measured)
    # through the quadratic drag; positions stay at ~1e-8 m
    np.testing.assert_allclose(
        np.asarray(out.linmom), np.asarray(ref.linmom), rtol=1e-3, atol=5e-5
    )
    assert not bool(np.any(np.asarray(stats.diverged)))

    # drag must actually change the trajectory vs a drag-free fluid
    env0 = env.replace(aggregate_drag_coefficient=0.0)
    out0, _ = fused_rollout(
        batched, body, sim, env0, num_steps=steps, dt=dt, interpret=True
    )
    assert not np.allclose(np.asarray(out0.pos), np.asarray(out.pos),
                           atol=1e-10)


def test_fused_equilibrium_mode_matches_jnp():
    """Equilibrium mode (zero momenta when the 3-step KE sum decreases,
    core.step.py:949-967) in the kernel: KE ring carry + zeroing must match
    the jnp step, including the ke_history state round-trip."""
    batched, body, sim, env, dt = _make(n=4, seed=9)
    sim = sim.replace(equilibrium_mode=True)
    assert supports(body, sim, env)
    steps = 60
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    # the mode must have triggered at least once somewhere
    assert np.any(np.asarray(ref.ke_history) > 0)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.linmom), np.asarray(ref.linmom), rtol=1e-3, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.ke_history), np.asarray(ref.ke_history),
        rtol=1e-3, atol=1e-12,
    )


def test_fused_midlife_freeze_matches_jnp():
    """Mid-life freeze: the FrozenTimeAdj development-clock pause and the
    FreezeInitialized actuation-zeroing window (core.step.py:641-705) must
    reproduce the jnp trajectory through the freeze."""
    rng = np.random.default_rng(13)
    n = 4
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sim = SimParams(init_cm_time=0.001, stop_condition_value=0.02,
                    mid_life_freeze_time=0.008)
    env = EnvParams()
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    # horizon spans the whole freeze window (middle ± freeze/2)
    steps = int(0.016 / float(dt)) + 2
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, _ = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-4, atol=5e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=1e-5, atol=0
    )


def test_fused_bilinear_materials_match_jnp():
    """Bilinear palettes (yield + plastic modulus) in-kernel: the per-side
    stress equalization loop (core.step.py:297-328) must reproduce the jnp
    trajectory, and yielding must actually occur."""
    from evosoro_tpu.core.types import MDL_BILINEAR, Material

    lin = evosoro_default_palette()
    soft = [
        Material(m.id, m.name, m.elastic_mod, cte=m.cte,
                 mat_model=MDL_BILINEAR, plastic_mod=m.elastic_mod * 0.01,
                 yield_stress=m.elastic_mod * 1e-4)
        for m in lin
    ]
    rng = np.random.default_rng(4)
    n = 4
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    body = build_body(structure, palette_from_list(soft), phase_offset=phase)
    body_lin = build_body(structure, palette_from_list(lin),
                          phase_offset=phase)
    assert not body.all_linear
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams()
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 80
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-4, atol=5e-8
    )
    assert not bool(np.any(np.asarray(stats.diverged)))
    # yielding changes the trajectory vs the linear palette
    out_lin, _ = fused_rollout(
        batched, body_lin, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    assert not np.allclose(np.asarray(out.pos), np.asarray(out_lin.pos),
                           atol=1e-9)


def test_fused_max_velocity_clamp_matches_jnp():
    """MaxVelLimit: the per-step displacement clamp (VXS_Voxel.cpp:188-192)
    must engage and match the jnp step."""
    batched, body, sim, env, dt = _make(n=4, seed=6)
    sim = sim.replace(max_velocity_enabled=True, max_vox_vel_limit=1e-4)
    assert supports(body, sim, env)
    steps = 80
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, _ = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=5e-5, atol=1e-8
    )
    # the clamp actually binds: unclamped trajectory differs
    sim0 = sim.replace(max_velocity_enabled=False)
    ref0 = _jnp_steps(batched, body, sim0, env, dt, steps)
    assert not np.allclose(np.asarray(ref.pos), np.asarray(ref0.pos),
                           atol=1e-10)


def test_fused_env_sources_match_jnp():
    """Environmental source tracking in-kernel (oscillating positions +
    per-source min-distance / history means, reference VX_Sim.cpp:2527-2558)
    must match the jnp rollout's bookkeeping."""
    from evosoro_tpu.core.rollout import rollout
    from evosoro_tpu.envs.sources import make_sources

    rng = np.random.default_rng(5)
    n = 4
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sources = make_sources([
        dict(pos=(0.1, 0.01, 0.01), amp=(0.02, 0.0, 0.0),
             freq=(3.0, 0.0, 0.0), enabled=True),
        dict(pos=(0.01, 0.2, 0.05), enabled=True),
    ])
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(sources=sources, temp_enabled=False)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 120  # crosses two history samples (every 50 steps)

    def ref_one(s):
        r = rollout(body, sim, env, num_steps=steps, dt=dt, state=s)
        return r.source_min_dist, r.source_avg_min_dist, r.final_state.pos

    ref_min, ref_avg, ref_pos = jax.jit(jax.vmap(ref_one))(batched)

    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    assert stats.source_min_dist is not None
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref_pos), rtol=2e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(stats.source_min_dist), np.asarray(ref_min),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stats.source_avg_min_dist), np.asarray(ref_avg),
        rtol=1e-4, atol=1e-6,
    )


def test_fused_bc_regions_match_jnp():
    """Boundary-condition regions in-kernel (streamed 15-channel block):
    a cantilever with an all-DOF-fixed base layer under gravity plus a tip
    load must match the jnp step, and the anchored voxels must not move."""
    from evosoro_tpu.core.types import DOF_ALL

    n = 4
    structure = np.zeros((n, 2, 2), dtype=np.int32)
    structure[:] = 1
    dof = np.zeros((n, 2, 2), dtype=np.int32)
    dof[0] = DOF_ALL  # clamp the root slice
    extf = np.zeros((n, 2, 2, 3))
    extf[-1, :, :, 2] = -0.05  # tip load
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, lattice_dim=0.01,
                      dof_fixed=dof, external_force=extf)
    sim = SimParams()
    env = EnvParams(temp_enabled=False)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 60
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-9
    )
    # stiff-oscillation momenta accumulate f32 phase noise (~1e-8/step
    # measured on 0.02-scale momenta)
    np.testing.assert_allclose(
        np.asarray(out.linmom), np.asarray(ref.linmom), rtol=1e-3, atol=1e-5
    )
    # anchored voxels pinned at their nominal positions
    nomz = np.asarray(body.nom_pos)[0, :, :, 2]
    np.testing.assert_allclose(np.asarray(out.pos)[0, 0, :, :, 2], nomz,
                               rtol=0, atol=0)
    # the tip sagged under gravity + load
    assert float(np.asarray(out.pos)[0, -1, 0, 0, 2]) < float(
        np.asarray(body.nom_pos)[-1, 0, 0, 2])
    assert not bool(np.any(np.asarray(stats.diverged)))


def test_fused_mdl_data_matches_jnp():
    """MDL_DATA point-table materials in-kernel (streamed side-table
    buffer + the same vectorized segment search as core.step): actuation
    drives strains past the table kink, trajectories must match jnp."""
    from evosoro_tpu.core.types import MDL_DATA, Material

    E = 5e6
    mats = [
        Material(1, "data_soft", mat_model=MDL_DATA, cte=0.02,
                 ss_strain=(0.0, 0.001, 0.05, 0.5),
                 ss_stress=(0.0, E * 0.001, E * 0.0015, E * 0.0017)),
        Material(2, "data_stiff", mat_model=MDL_DATA, cte=-0.02,
                 ss_strain=(0.0, 0.002, 0.1),
                 ss_stress=(0.0, E * 0.004, E * 0.006)),
    ]
    rng = np.random.default_rng(17)
    n = 4
    structure = rng.integers(1, 3, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    body = build_body(structure, palette_from_list(mats), phase_offset=phase)
    assert body.ss_strain_vox is not None
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(temp_amplitude=25.0)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 80
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    # the nonlinear region must actually be exercised
    assert float(np.abs(np.asarray(ref.max_strain)).max()) > 0.001
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-4, atol=5e-8
    )
    assert not bool(np.any(np.asarray(stats.diverged)))


def test_fused_plasticity_matches_jnp():
    """Bond plasticity (high-water max-strain memory + linear unloading from
    the strain offset, reference VXS_BondInternal.cpp:193-207) in-kernel:
    actuation cycles strain past its high-water mark and back, so the
    offset path must engage and match the jnp step."""
    batched, body, sim, env, dt = _make(n=4, seed=21)
    sim = sim.replace(plasticity_enabled=True, init_cm_time=0.0)
    assert supports(body, sim, env)
    steps = 80
    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    # the plastic memory must actually be active
    assert float(np.abs(np.asarray(ref.strain_offset)).max()) > 0
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-4, atol=2e-8
    )
    # strain − (E·strain)/E rounds to ±1 ulp (~1.5e-8) differently between
    # the two op orders; offsets at play are ≳1e-4
    np.testing.assert_allclose(
        np.asarray(out.strain_offset), np.asarray(ref.strain_offset),
        rtol=1e-3, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out.max_strain), np.asarray(ref.max_strain),
        rtol=1e-4, atol=1e-10,
    )
    assert not bool(np.any(np.asarray(stats.diverged)))
    # and the trajectory differs from the non-plastic one (plastic
    # unloading effects are small at this horizon — compare exactly)
    ref0 = _jnp_steps(batched, body, sim.replace(plasticity_enabled=False),
                      env, dt, steps)
    assert not np.allclose(np.asarray(ref.pos), np.asarray(ref0.pos),
                           rtol=0, atol=1e-12)


def test_fused_volume_effects_requires_coupling_state():
    batched, body, sim, env, dt = _make(n=4)
    with pytest.raises(ValueError):
        fused_rollout(
            batched, body, sim.replace(volume_effects_enabled=True), env,
            num_steps=1, dt=dt, interpret=True,
        )


def test_supports_rejects_featureful_configs():
    batched, body, sim, env, dt = _make(n=4)
    assert supports(body, sim, env)
    assert supports(body, sim.replace(volume_effects_enabled=True), env)
    assert supports(body, sim, env.replace(fluid_environment=True))
    assert supports(body, sim.replace(plasticity_enabled=True), env)
    # r4: needle / falling / NormDistByVol / windows are in-kernel now
    assert supports(body, sim, env.replace(needle_in_haystack=True))
    assert supports(body, sim, env.replace(falling_prohibited=True))
    assert supports(body, sim, env.replace(norm_dist_by_vol=True,
                                           time_between_traces=0.01))
    assert supports(body, sim, env.replace(num_trace_steps_in_window=8,
                                           time_between_traces=0.01))
    # ...within the ring budget and only with a trace cadence
    assert not supports(body, sim, env.replace(num_trace_steps_in_window=64,
                                               time_between_traces=0.01))
    assert not supports(body, sim, env.replace(num_trace_steps_in_window=8,
                                               time_between_traces=0.0))
    assert not supports(body, sim, env.replace(norm_dist_by_vol=True,
                                               time_between_traces=0.0))
    assert not supports(body, sim, env.replace(floor_limited=True))
    # fluid with a deformed-mesh drag system runs in-kernel (r5) but only
    # with a one-voxel empty shell at the +X/+Y/+Z faces (corner-lattice
    # stencil); unshelled bodies stay on the jnp facet path
    from evosoro_tpu.envs.drag import attach_mesh_drag

    body_mesh = attach_mesh_drag(body)
    assert not supports(body_mesh, sim, env.replace(fluid_environment=True))
    struct_sh = np.zeros((5, 5, 5), dtype=np.int32)
    struct_sh[:4, :4, :4] = np.asarray(body.mat)
    palette = palette_from_list(evosoro_default_palette())
    body_sh = attach_mesh_drag(build_body(struct_sh, palette))
    assert supports(body_sh, sim, env.replace(fluid_environment=True))
    with pytest.raises(ValueError):
        fused_rollout(
            batched, body, sim, env.replace(floor_limited=True),
            num_steps=1, dt=dt, interpret=True,
        )


def test_fused_mesh_drag_matches_jnp():
    """Deformed-mesh facet drag in-kernel (r5, VERDICT r4 missing #1): the
    corner-lattice stencil must track the gather/scatter jnp model
    (envs/drag.py mesh_drag_forces, parity-validated vs land_water
    VX_Sim.cpp:1516-1600) through an actuated swimming trajectory.
    The body carries the one-voxel empty shell supports() requires."""
    from evosoro_tpu.envs.drag import attach_mesh_drag

    rng = np.random.default_rng(13)
    n = 4
    structure = np.zeros((n + 1, n + 1, n + 1), dtype=np.int32)
    structure[:n, :n, :n] = rng.integers(0, 5, size=(n, n, n))
    structure[:n, :n, 0] = 3  # ensure actuated voxels
    phase = rng.uniform(-1, 1, size=(n + 1, n + 1, n + 1))
    palette = palette_from_list(evosoro_default_palette())
    body = attach_mesh_drag(
        build_body(structure, palette, phase_offset=phase))
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(fluid_environment=True, gravity_enabled=False,
                    floor_enabled=False, aggregate_drag_coefficient=375.0)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state
    )
    steps = 100

    ref = _jnp_steps(batched, body, sim, env, dt, steps)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )
    assert float(np.abs(np.asarray(ref.linmom)).max()) > 0
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.scale), np.asarray(ref.scale), rtol=1e-6, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.linmom), np.asarray(ref.linmom), rtol=1e-3, atol=5e-5
    )
    assert not bool(np.any(np.asarray(stats.diverged)))

    # the mesh model must differ from the voxel-face approximation (the two
    # drag models diverge at 2nd order in deformation, DRAGDIV.json) — guard
    # against silently running the cheap model
    body_nomesh = body.replace(mesh_drag=None)
    out_face, _ = fused_rollout(
        batched, body_nomesh, sim, env, num_steps=steps, dt=dt,
        interpret=True,
    )
    assert not np.allclose(np.asarray(out_face.pos), np.asarray(out.pos),
                           atol=1e-12)
