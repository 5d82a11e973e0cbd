"""Interpret-mode parity of the r4 in-kernel fitness features vs
core.rollout: needle-in-haystack, falling-prohibited latch, end-of-life
posterior Y, trace windows + ballistic devo, and NormDistByVol online
accumulation (VERDICT r3 #8/#9)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from evosoro_tpu.core.materials import build_body, calc_max_dt, \
    palette_from_list  # noqa: E402
from evosoro_tpu.core.rollout import init_state, rollout  # noqa: E402
from evosoro_tpu.core.types import EnvParams, SimParams, \
    evosoro_default_palette  # noqa: E402
from evosoro_tpu.ops.fused_rollout import fused_rollout, supports  # noqa: E402

L = 0.01


def _walker(extra=None):
    rng = np.random.default_rng(7)
    s = np.zeros((3, 3, 2), dtype=np.int32)
    s[:, :, 0] = 3
    s[:, :, 1] = 1
    if extra:
        for (i, j, k), m in extra.items():
            s[i, j, k] = m
    phase = rng.uniform(-1, 1, size=s.shape) * (s > 0)
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      lattice_dim=L, phase_offset=phase)
    return body


def _run_both(body, sim, env, steps, ballistic=False):
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    res = jax.jit(lambda: rollout(
        body, sim, env, num_steps=steps, dt=dt,
        stop_time=sim.stop_condition_value))()
    st = init_state(body, ballistic_devo=ballistic)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), st)
    out, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True,
        stop_time=float(sim.stop_condition_value))
    return res, out, stats, float(dt)


def test_needle_parity():
    """Initial-needle capture and push distance match core.rollout."""
    body = _walker({(1, 1, 1): 7})
    sim = SimParams(init_cm_time=0.002, stop_condition_value=1.0)
    env = EnvParams(needle_in_haystack=True)
    assert supports(body, sim, env)
    res, out, stats, _ = _run_both(body, sim, env, steps=60)

    ini = np.asarray(stats.ini_needle[0])
    # fused push_dist replicated host-side from the final state
    mat7 = np.asarray(body.mat) == 7
    fpos = np.asarray(out.pos[0])
    npos = fpos[mat7].mean(axis=0)
    nd = npos[:2] - ini[:2]
    push = float(np.sqrt((nd ** 2).sum())) / L
    np.testing.assert_allclose(push, float(res.push_dist), rtol=2e-4,
                               atol=1e-7)
    assert int(res.found_needle) == int(push > 0)


def test_falling_latch_parity():
    """A top-heavy feet body falls over; the latch and frozen state match
    core.rollout (which also ends the sim on the latch)."""
    # feet (mat 6) bottom layer -> feet touching > non-feet touching
    body = _walker({(i, j, 0): 6 for i in range(3) for j in range(3)})
    sim = SimParams(init_cm_time=0.001, stop_condition_value=1.0)
    env = EnvParams(falling_prohibited=True)
    assert supports(body, sim, env)
    res, out, stats, _ = _run_both(body, sim, env, steps=40)

    assert bool(res.fell_over) == bool(stats.fell_over[0])
    assert bool(stats.fell_over[0])  # the scenario actually trips the latch
    np.testing.assert_allclose(
        np.asarray(out.pos[0]), np.asarray(res.final_state.pos),
        rtol=5e-5, atol=1e-8)


def test_eol_posterior_y_parity():
    # the EoL capture rides the feature carries; falling_prohibited with no
    # mat-6 feet enables them without changing the dynamics (latch can't
    # trip: 0 feet touching is never > non-feet touching)
    body = _walker()
    sim = SimParams(init_cm_time=0.0, stop_condition_value=0.002)
    env = EnvParams(falling_prohibited=True)
    res, out, stats, _ = _run_both(body, sim, env, steps=40)
    assert not bool(stats.fell_over[0])
    np.testing.assert_allclose(
        float(stats.end_of_life_posterior_y[0]),
        float(res.end_of_life_posterior_y), rtol=1e-5, atol=1e-7)


def test_window_and_ballistic_devo_parity():
    """The windowed speed traces and the per-voxel ballistic rebasing match
    core.rollout step-for-step (same tb cadence, same post-step sampling,
    same rebase formula) — the test_devo_ballistic scenario, fused."""
    rng = np.random.default_rng(11)
    s = np.zeros((3, 3, 2), dtype=np.int32)
    s[:, :, 0] = 3
    s[:, :, 1] = 1
    phase = rng.uniform(-1, 1, size=s.shape) * (s > 0)
    shape = s.shape
    body = build_body(
        s, palette_from_list(evosoro_default_palette()), lattice_dim=L,
        phase_offset=phase,
        initial_voxel_size=np.full(shape, L),
        final_voxel_size=np.full(shape, 1.4 * L),
        growth_time=np.full(shape, 0.15),
        start_growth_time=np.full(shape, 0.02),
    )
    sim = SimParams(stop_condition_value=0.08, init_cm_time=0.02)
    env = EnvParams(growth_amplitude=0.5, num_trace_steps_in_window=4,
                    time_between_traces=0.005, norm_dist_by_vol=True,
                    ballistic_slowdown_fact=1.0, max_slowdown_permitted=-0.5,
                    min_growth_time=0.0)
    assert supports(body, sim, env)
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    steps = int(np.ceil(0.08 / float(dt))) + 5
    res, out, stats, _ = _run_both(body, sim, env, steps=steps,
                                   ballistic=True)

    devo_ref = res.final_state.devo
    assert devo_ref is not None
    assert int(devo_ref.win_count) >= 2
    np.testing.assert_allclose(
        float(stats.win_count[0]), float(devo_ref.win_count))
    np.testing.assert_allclose(
        float(stats.norm_window_dist[0]), float(devo_ref.win_last),
        rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(
        float(stats.win_prev_dist[0]), float(devo_ref.win_prev),
        rtol=2e-4, atol=1e-8)
    # the rebased per-voxel devo fields ride the state channels
    occ = np.asarray(body.occ)
    np.testing.assert_allclose(
        np.asarray(out.devo.final_voxel_size[0])[occ],
        np.asarray(devo_ref.final_voxel_size)[occ], rtol=2e-4, atol=1e-9)
    # ...and the ballistic feedback shapes the trajectory itself
    np.testing.assert_allclose(
        np.asarray(out.pos[0]), np.asarray(res.final_state.pos),
        rtol=5e-4, atol=1e-6)


def test_norm_dist_by_vol_online_accumulation():
    """The kernel's online NormDistByVol accumulation reproduces a dense
    host-side recomputation at the same TimeBetweenTraces cadence (the
    reference's UpdateStats push schedule, VX_Sim.cpp:1600-1606) from a
    per-step jnp trace."""
    body = _walker()
    sim = SimParams(init_cm_time=0.002, stop_condition_value=1.0)
    env = EnvParams(norm_dist_by_vol=True, time_between_traces=0.0007)
    assert supports(body, sim, env)
    steps = 60
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    # dense per-step trace: rollout records (pre-step cm, vol, t) each step;
    # the post-step sample of step i is the pre-step sample of step i+1
    res = jax.jit(lambda: rollout(
        body, sim, env, num_steps=steps + 1, dt=dt, trace_every=1,
        stop_time=sim.stop_condition_value))()
    cms = np.asarray(res.cm_trace)[1:steps + 1, 1]
    vols = np.asarray(res.vol_trace)[1:steps + 1]
    times = np.asarray(res.trace_times)[1:steps + 1]

    tb = env.time_between_traces
    init_cm = sim.init_cm_time
    nd = 0.0
    last_t = -1.0
    prev = None
    for cy, vol, t in zip(cms, vols, times):
        due = (t > init_cm) and (prev is None or last_t + tb <= t)
        if due:
            if prev is not None:
                dy = (cy - prev[0]) / L
                avg = 0.5 * (vol + prev[1])
                nd += dy / (avg if avg > 0 else 1.0)
            prev = (cy, vol)
            last_t = t

    st = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), st)
    _, stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True,
        stop_time=float(sim.stop_condition_value))
    np.testing.assert_allclose(float(stats.norm_dist_by_vol[0]), nd,
                               rtol=2e-4, atol=1e-7)


def test_evaluator_paths_agree_on_needle_falling():
    """The EVALUATOR wiring of the r4 feature flags (make_fused_evaluator ->
    kernel flags -> packed_metrics) produces the same extended fitness
    surface as the jnp batched evaluator for a needle + falling-prohibited
    experiment (features whose semantics are cadence-independent)."""
    from evosoro_tpu.core.materials import palette_from_list
    from evosoro_tpu.core.types import SimParams, evosoro_default_palette
    from evosoro_tpu.evo.evaluation import (
        make_batched_evaluator, make_fused_evaluator,
    )

    rng = np.random.default_rng(5)
    B, n = 8, 3
    structures = np.zeros((B, n, n, 2), dtype=np.int32)
    structures[:, :, :, 0] = 3
    structures[:, :, :, 1] = 1
    structures[:, 1, 1, 1] = 7  # needle voxel
    structures[:, 0, 0, 0] = 6  # one foot (latch cannot trip: 1 < others)
    phases = rng.uniform(-1, 1, size=(B, n, n, 2))

    pal = palette_from_list(evosoro_default_palette())
    sim = SimParams(init_cm_time=0.001, stop_condition_value=1.0)
    env = EnvParams(needle_in_haystack=True, falling_prohibited=True,
                    lattice_dim=L)
    steps = 40
    stop = 1.0

    env_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (B,)), env)

    fused = make_fused_evaluator(
        pal, (n, n, 2), steps, ("phase_offset",), L, sim, env,
        interpret=True)
    m_fused = fused(jnp.asarray(structures),
                    {"phase_offset": jnp.asarray(phases, jnp.float32)},
                    None, env_b, stop)

    jnp_fn = make_batched_evaluator(pal, (n, n, 2), steps,
                                    ("phase_offset",), ("all",))
    m_jnp = jnp_fn(jnp.asarray(structures),
                   {"phase_offset": jnp.asarray(phases)},
                   sim, env_b, stop)

    # fused runs f32 on-chip layouts vs the f64 jnp path; distances are in
    # lattice units, so atol 1e-4 = one micron at L=0.01
    for key in ("norm_final_dist", "push_dist", "end_of_life_posterior_y"):
        np.testing.assert_allclose(
            np.asarray(m_fused[key]), np.asarray(m_jnp[key]),
            rtol=3e-3, atol=1e-4, err_msg=key)
    np.testing.assert_array_equal(
        np.asarray(m_fused["found_needle"]) > 0.5,
        np.asarray(m_jnp["found_needle"]) > 0.5)
    assert not np.asarray(m_fused["diverged"]).any()
