"""Ballistic (velocity-adjusted) development behavior.

Reference semantics (VXS_Voxel.cpp:342-381): with speed windows enabled
(NumTimeStepsInWindow > 0), each voxel's development is rebased every step
once two windows exist; when the robot's windowed speed drops by more than
MaxSlowdownPermitted, the final size is pulled toward the current size by
BallisticSlowdownFact — development slows and can stop for good.

No golden-parity test exists for this feature because the reference's
window read is undefined behavior (WindowTrace[size()], one past the end —
see types.DevoState); these tests pin the intended semantics instead.
"""

import numpy as np
import jax

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state, num_steps_for, rollout
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def _growing_walker():
    rng = np.random.default_rng(11)
    structure = np.zeros((3, 3, 2), dtype=np.int32)
    structure[:, :, 0] = 3
    structure[:, :, 1] = 1
    phase = rng.uniform(-1, 1, size=structure.shape) * (structure > 0)
    L = 0.01
    pal = palette_from_list(evosoro_default_palette())
    shape = structure.shape
    body = build_body(
        structure, pal, lattice_dim=L, phase_offset=phase,
        initial_voxel_size=np.full(shape, L),
        final_voxel_size=np.full(shape, 1.4 * L),
        growth_time=np.full(shape, 0.15),
        start_growth_time=np.full(shape, 0.02),
    )
    return body


def _run(body, sim, env):
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    steps = num_steps_for(body, sim, dt=dt)
    return jax.jit(
        lambda: rollout(body, sim, env, num_steps=steps, dt=dt)
    )()


def test_windows_accumulate_and_rebase_applies():
    body = _growing_walker()
    sim = SimParams(stop_condition_value=0.2, init_cm_time=0.02)
    # any speed decrease halts development (slowdown fact 1, threshold -0.5
    # makes every decrease count)
    env = EnvParams(growth_amplitude=0.5, num_trace_steps_in_window=4,
                    time_between_traces=0.005, norm_dist_by_vol=True,
                    ballistic_slowdown_fact=1.0, max_slowdown_permitted=-0.5,
                    min_growth_time=0.0)
    res = _run(body, sim, env)
    devo = res.final_state.devo
    assert devo is not None
    assert int(devo.win_count) >= 2
    assert np.isfinite(np.asarray(res.final_state.pos)).all()
    # the rebase rewrote start_growth_time to a sim time
    occ = np.asarray(body.occ)
    assert (np.asarray(devo.start_growth_time)[occ] > 0.02).all()
    # with every decrease halting development, some voxel's final size was
    # pulled below the original target
    assert (np.asarray(devo.final_voxel_size)[occ] < 1.4 * 0.01 - 1e-9).any()


def test_zero_slowdown_fact_keeps_growing():
    """BallisticSlowdownFact = 0 → adjustment is always 1: the rebase is
    value-preserving and development reaches (near) the original target."""
    body = _growing_walker()
    sim = SimParams(stop_condition_value=0.2, init_cm_time=0.02)
    env = EnvParams(growth_amplitude=0.5, num_trace_steps_in_window=4,
                    time_between_traces=0.005, norm_dist_by_vol=True,
                    ballistic_slowdown_fact=0.0, max_slowdown_permitted=0.1,
                    min_growth_time=0.0)
    res = _run(body, sim, env)
    devo = res.final_state.devo
    occ = np.asarray(body.occ)
    # final target survives the per-step rebases (float32 quantization aside)
    np.testing.assert_allclose(
        np.asarray(devo.final_voxel_size)[occ], 1.4 * 0.01, rtol=1e-5
    )
    # and the passive (non-actuated) voxels actually grew to the target
    # (actuated voxels oscillate, so only mat-1 scales are deterministic)
    passive = np.asarray(body.mat) == 1
    np.testing.assert_allclose(
        np.asarray(res.final_state.scale)[passive], 1.4 * 0.01, rtol=1e-3
    )


def test_ballistic_state_absent_when_disabled():
    body = _growing_walker()
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.02)
    env = EnvParams(growth_amplitude=0.5)  # no windows
    res = _run(body, sim, env)
    assert res.final_state.devo is None
    st = init_state(body)
    assert st.devo is None
