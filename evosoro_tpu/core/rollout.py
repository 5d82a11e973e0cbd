"""Rollouts: `lax.scan` over the physics step + trajectory statistics.

Replaces the reference's `while !StopConditionMet(): TimeStep()` driver loop
(reference: voxelyzeMain/main.cpp:89-111) with a compiled scan of fixed step
count; stop conditions other than max-sim-time become freeze masks. Fitness
metrics are pure reductions replicating the full result-file surface of
VX_SimGA.cpp:25-203 (NormFinalDist/NormRegimeDist/NormFrozenDist, anterior/
posterior stats, feet/floor touch counts, needle-in-haystack push distance,
fall-over zeroing, CoM and volume traces, volume-normalized distances).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from evosoro_tpu.core import quaternion as q
from evosoro_tpu.core.constants import DEFAULT_PRECISION, Precision
from evosoro_tpu.core.materials import calc_max_dt
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, SimState, VoxelBody

_BIG = 1e5  # reference sentinel for "min over voxels" scans (VX_Sim.cpp:2603)


def init_state(body: VoxelBody, dtype=None, volume_effects: bool = False,
               ballistic_devo: bool = False) -> SimState:
    """Initial rest state (reference: VXS_Voxel.cpp:95-134 ResetVoxel).

    `volume_effects`: allocate the Poisson-coupling carry (TStrainSum/CSArea,
    reference VXS_Voxel.cpp:543-632); keep it None otherwise so the scan
    carries no dead state.

    `ballistic_devo`: allocate the dynamic DevoState so velocity-adjusted
    development can rebase the per-voxel devo fields each step
    (reference: VXS_Voxel.cpp:342-381; see types.DevoState).
    """
    from evosoro_tpu.core.types import DevoState

    X, Y, Z = body.occ.shape
    dtype = dtype or body.nom_pos.dtype
    nom = jnp.broadcast_to(body.nominal_size, (X, Y, Z)).astype(dtype)
    ts_sum = cs_area = None
    cur_dt = None
    if volume_effects:
        ts_sum = jnp.zeros((2, 3, X, Y, Z), dtype)
        L2 = (body.nominal_size * body.nominal_size).astype(dtype)
        cs_area = jnp.broadcast_to(L2, (2, 3, X, Y, Z))
        # per-step dt carry (the reference recomputes CalcMaxDt every step
        # under volume effects, VX_Sim.cpp:1792-1794); 0 = "use the caller's
        # dt for the first bond pass"
        cur_dt = jnp.zeros((), dtype)
    devo = None
    if ballistic_devo:
        bc = lambda a: jnp.broadcast_to(a, (X, Y, Z)).astype(dtype)  # noqa: E731
        devo = DevoState(
            initial_voxel_size=bc(body.initial_voxel_size),
            final_voxel_size=bc(body.final_voxel_size),
            original_final_voxel_size=bc(body.final_voxel_size),
            growth_time=bc(body.growth_time),
            start_growth_time=bc(body.start_growth_time),
            win_prev=jnp.zeros((), dtype),
            win_last=jnp.zeros((), dtype),
            win_count=jnp.zeros((), jnp.int32),
        )
    return SimState(
        ts_sum=ts_sum,
        cs_area=cs_area,
        cur_dt=cur_dt,
        devo=devo,
        total_strain_e=jnp.zeros((), dtype),
        max_vox_vel=jnp.zeros((), dtype),
        pos=body.nom_pos.astype(dtype),
        quat=q.quat_identity((X, Y, Z), dtype=dtype),
        linmom=jnp.zeros((X, Y, Z, 3), dtype),
        angmom=jnp.zeros((X, Y, Z, 3), dtype),
        scale=nom,
        last_scale=nom,
        small_angle=jnp.ones((3, X, Y, Z), dtype=bool),
        last_pos2=jnp.zeros((3, X, Y, Z, 3), dtype),
        last_angle1=jnp.zeros((3, X, Y, Z, 3), dtype),
        last_angle2=jnp.zeros((3, X, Y, Z, 3), dtype),
        max_strain=jnp.zeros((3, X, Y, Z), dtype),
        strain_offset=jnp.zeros((3, X, Y, Z), dtype),
        time=jnp.zeros((), dtype),
        diverged=jnp.zeros((), bool),
        # the reference clears energy histories to -1 sentinels
        # (VX_Sim.h:421 ClearHistories); the first real comparisons only
        # engage once enough samples displace them
        ke_history=jnp.full((6,), -1.0, dtype),
    )


def center_of_mass(state: SimState, body: VoxelBody):
    """Mass-weighted CoM (reference: VX_Sim.cpp:2415-2430 GetCM)."""
    total_mass = jnp.sum(body.mass)
    return jnp.sum(
        state.pos * body.mass[..., None], axis=(0, 1, 2)
    ) / jnp.where(total_mass > 0, total_mass, 1.0)


def total_volume(state: SimState, body: VoxelBody):
    """Σ (scale/L)³ over occupied voxels — the DIMENSIONLESS robot volume
    (units of voxel counts), exactly the reference's getTotalVolume()
    (VX_Sim.cpp:2573-2580: pow(GetCurScale()/GetLatticeDim(), 3)). This is
    what the NormDistByVol fitness family and the ballistic-devo speed
    windows normalize by. (The deformed-mesh volume used by shape
    descriptors is host-side: core/shape.py robot_volume.)"""
    s = state.scale / body.nominal_size
    return jnp.sum(jnp.where(body.occ, s * s * s, 0.0))


def floor_penetration(state: SimState, body: VoxelBody):
    """Per-voxel ground penetration 0.5·scale − z (reference:
    VXS_Voxel.cpp:700-706 GetCurGroundPenetration), masked to occupancy."""
    pen = 0.5 * state.scale - state.pos[..., 2]
    return jnp.where(body.occ, pen, 0.0)


def _touch_counts(state: SimState, body: VoxelBody):
    """(num_touching, num_mat6_touching) — reference VX_Sim.cpp:2432-2441
    GetNumTouchingFloor and :2698-2713 GetNumNonFeetTouchingFloor (which
    counts material-6 "feet" voxels with positive ground penetration)."""
    pen = floor_penetration(state, body)
    touching = pen > 0
    n_all = jnp.sum(touching & body.occ)
    n_feet = jnp.sum(touching & (body.mat == 6))
    return n_all, n_feet


@struct.dataclass
class RolloutResult:
    """Outputs of one rollout (batched via vmap) — the TPU analog of the
    reference fitness XML (VX_SimGA.cpp:140-203 WriteResultFile)."""

    final_state: SimState
    ini_cm: Any  # CoM captured when t first exceeds init_cm_time
    final_cm: Any
    norm_final_dist: Any  # <NormFinalDist> (minus frozen-window distance)
    final_dist: Any  # <FinalDist> |ΔCoM_xy| / lattice_dim
    final_dist_y: Any  # <finalDistY>
    norm_regime_dist: Any  # <NormRegimeDist> (afterlife displacement)
    norm_frozen_dist: Any  # <NormFrozenDist>
    anterior_dist: Any  # <AnteriorDist> max voxel XY dist from IniCM / L
    posterior_dist: Any  # <PosteriorDist> min of the same
    anterior_y: Any  # <AnteriorY> max voxel y (mat != 5)
    posterior_y: Any  # <PosteriorY> min voxel y (mat != 5)
    end_of_life_posterior_y: Any  # <EndOfLifePosteriorY>
    fall_adj_post_y: Any  # <FallAdjPostY>
    fell_over: Any  # fall-over latch (VX_Sim.cpp:1414-1419)
    num_touching_floor: Any  # <NumTouchingFloor>
    num_non_feet_touching_floor: Any  # <NumNonFeetTouchingFloor>
    lifetime: Any  # <Lifetime> = final time − afterlife
    found_needle: Any  # <FoundNeedleInHaystack>
    push_dist: Any  # <PushDist>
    norm_window_dist: Any  # GetWindowDist (VX_Sim.cpp:2745-2784)
    diverged: Any
    cm_trace: Any  # (T_trace, 3) CoM snapshots (SS.CMTrace analog)
    vol_trace: Any  # (T_trace,) robot volume snapshots (SS.VolTrace)
    trace_times: Any
    # environmental source tracking (reference: VX_Sim.cpp:2527-2558 +
    # VX_Source min-distance history) — None when env.sources is None
    source_min_dist: Any = None  # (S,) final min distance / lattice_dim
    source_avg_min_dist: Any = None  # (S,) mean of 50-step history samples


class _Carry(NamedTuple):
    state: SimState
    ini_cm: jnp.ndarray
    cm_initialized: jnp.ndarray
    eol_posterior_y: jnp.ndarray
    eol_captured: jnp.ndarray
    fell_over: jnp.ndarray
    ini_needle: jnp.ndarray
    needle_initialized: jnp.ndarray
    # windowed-speed-trace bookkeeping for ballistic development
    # (reference: VX_Sim.cpp:1600-1606 WindowTrace; None unless active)
    buf_y: Any = None  # (N,) last N trace samples of CoM y
    buf_v: Any = None  # (N,) last N trace samples of robot volume
    n_traces: Any = None
    last_trace_t: Any = None
    last_win_t: Any = None
    # environmental-source tracking (None unless env.sources set)
    src_min: Any = None  # (S,) current min distance (lattice units)
    src_sum: Any = None  # (S,) history accumulator
    src_count: Any = None  # scalar int
    # downsampled history rings for quiescence stop conditions
    # (reference: VX_Sim.cpp:1685-1687; None unless such a condition set)
    ring_ke: Any = None  # (10,)
    ring_tote: Any = None  # (10,)
    ring_move: Any = None  # (10,)


def num_steps_for(body: VoxelBody, sim: SimParams, dt=None) -> int:
    """Concrete step count covering the sim's stop-condition time (incl.
    afterlife). Host-side helper (dt must be concrete): scan length is static.
    """
    import numpy as np

    if dt is None:
        dt = float(calc_max_dt(body, sim.volume_effects_enabled)) * float(
            sim.dt_frac)
    total = float(sim.stop_condition_value) + float(sim.afterlife_time)
    steps = int(np.ceil(total / dt))
    if sim.volume_effects_enabled:
        # dt is recomputed per step and shrinks under compression; pad the
        # static scan length so the stop time is still reached
        steps = int(np.ceil(steps * 1.15))
    return steps


def _needle_pos(state: SimState, body: VoxelBody):
    """Position of the material-7 "needle" voxel (reference:
    VX_Sim.cpp:2715-2727 GetNeedlePosition — last mat-7 voxel in scan order;
    designs carry at most one, so a masked sum is exact)."""
    is_needle = (body.mat == 7)[..., None]
    n = jnp.sum(is_needle)
    return jnp.sum(jnp.where(is_needle, state.pos, 0.0), axis=(0, 1, 2)) / jnp.maximum(
        n, 1
    )


def _posterior_y(state: SimState, body: VoxelBody):
    """Min voxel y over non-obstacle voxels, in lattice units (reference:
    VX_Sim.cpp getPosteriorY divides by GetLatticeDim)."""
    valid = body.occ & (body.mat != 5)
    return jnp.min(
        jnp.where(valid, state.pos[..., 1] / body.nominal_size, _BIG)
    )


def _norm_dist_by_vol(cm_y, vols, mask, L, exponent):
    """Σ Δy/L / ((V_i + V_{i-1})/2)^exp over trace intervals whose endpoint
    is in `mask` (reference: VX_SimGA.cpp:58-117). Interval i-1→i counts when
    mask[i] & mask[i-1] (the reference keeps separate per-regime trace lists;
    boundary-crossing intervals are excluded here, a sub-trace-interval
    difference)."""
    dy = (cm_y[1:] - cm_y[:-1]) / L
    avg_v = 0.5 * (vols[1:] + vols[:-1])
    m = mask[1:] & mask[:-1]
    safe_v = jnp.where(avg_v > 0, avg_v, 1.0)
    return jnp.sum(jnp.where(m, dy / safe_v**exponent, 0.0))


def rollout(
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    dt=None,
    state: SimState | None = None,
    prec: Precision = DEFAULT_PRECISION,
    trace_every: int = 0,
    control_sequence=None,
    unroll: int = 1,
    stop_time=None,
    stop_condition_type: int | None = None,
) -> RolloutResult:
    """Run `num_steps` of physics and reduce the full fitness-statistic set.

    `control_sequence`: optional (num_control_knots, X, Y, Z) per-voxel scale
    modulation; knot k is active for steps [k*S/K, (k+1)*S/K) — the MPC
    actuation channel. `trace_every > 0` records the CoM and robot volume
    every that many steps (analog of TimeBetweenTraces, VX_Environment.h);
    it is required for the NormDistByVol fitness family.

    `stop_time`: optional per-rollout SC_MAX_SIM_TIME value; once a rollout's
    sim time passes it, its state freezes for the remaining steps. This lets
    a batch of rollouts with heterogeneous dt (CalcMaxDt is design-dependent,
    reference: VX_Sim.cpp:1693-1727) share one fixed-length scan.

    `stop_condition_type`: one of types.SC_* (reference: VX_Enums.h:55-65,
    StopConditionMet VX_Sim.cpp:1398-1510). The scan always runs its static
    `num_steps`; a met stop condition freezes the rollout's state (time
    included, so Lifetime reports the stop time). The quiescence conditions
    (SC_CONST_MAXENERGY / SC_MIN_KE / SC_MIN_MAXMOVE*) replicate the
    reference's HISTORY_SIZE=10000-deep check sampled every 1000 steps,
    with the ring anchored at step multiples of 1000 rather than sliding
    per-step (a bounded-by-1000-steps timing difference). SC_POINTING_ERR
    falls back to its guaranteed max-sim-time component (the pointing-error
    branch requires tip-voxel wiring the CLI path never configures).
    None defaults to SC_MAX_SIM_TIME behavior via `stop_time`/`num_steps`.
    """
    if dt is None:
        dt = calc_max_dt(body, sim.volume_effects_enabled) * sim.dt_frac
    if state is None:
        state = init_state(
            body,
            volume_effects=sim.volume_effects_enabled,
            ballistic_devo=(
                env.num_trace_steps_in_window > 0
                and body.using_final_voxel_size
            ),
        )

    n_knots = 0 if control_sequence is None else control_sequence.shape[0]
    want_trace = trace_every > 0 or env.norm_dist_by_vol

    # ballistic development is active when the state carries a DevoState
    # and the env defines speed windows (reference: NumTimeStepsInWindow>0)
    ballistic = state.devo is not None and env.num_trace_steps_in_window > 0
    n_win = env.num_trace_steps_in_window
    tb = env.time_between_traces

    from evosoro_tpu.core.types import (
        HISTORY_SIZE,
        MOTION_FLOOR_THR,
        SC_CONST_MAXENERGY,
        SC_MAX_TIME_STEPS,
        SC_MIN_KE,
        SC_MIN_MAXMOVE,
        SC_MIN_MAXMOVE_MAX_SIM_TIME,
        SC_POINTING_ERR,
        SC_TEMP_CYCLES,
    )

    history_scs = (SC_CONST_MAXENERGY, SC_MIN_KE, SC_MIN_MAXMOVE,
                   SC_MIN_MAXMOVE_MAX_SIM_TIME)
    want_rings = stop_condition_type in history_scs
    num_jump = HISTORY_SIZE // 10

    def step_fn(carry: _Carry, i):
        st = carry.state

        # --- environmental sources: distances at the top of the step from
        # the previous step's positions (reference: VX_Sim.cpp:1060
        # updateSourcesInformation runs before Integrate), with a history
        # sample every UPDATE_SOURCES_HIST_EVERY steps ---
        src_min, src_sum, src_count = carry.src_min, carry.src_sum, carry.src_count
        if env.sources is not None:
            from evosoro_tpu.envs.sources import (
                UPDATE_SOURCES_HIST_EVERY,
                min_distances,
                source_positions,
            )

            tau = jnp.maximum(st.time - sim.init_cm_time, 0.0)
            spos = source_positions(env.sources, tau)
            src_min = min_distances(spos, st, body).astype(st.pos.dtype)
            hist = (i % UPDATE_SOURCES_HIST_EVERY) == 0
            src_sum = src_sum + jnp.where(hist, src_min, 0.0)
            src_count = src_count + hist
        # IniCM capture happens at the top of TimeStep when CurTime has
        # passed InitCmTime (reference: VX_Sim.cpp:1064-1075), i.e. with the
        # CoM computed from the *previous* step's positions.
        cm_now = center_of_mass(st, body)
        capture = (~carry.cm_initialized) & (st.time > sim.init_cm_time)
        ini_cm = jnp.where(capture, cm_now, carry.ini_cm)
        cm_initialized = carry.cm_initialized | capture

        # end-of-lifetime posterior-Y capture (reference: VX_Sim.cpp:1078-1082)
        eol_cap = (~carry.eol_captured) & (st.time >= sim.stop_condition_value)
        eol_y = jnp.where(eol_cap, _posterior_y(st, body), carry.eol_posterior_y)
        eol_captured = carry.eol_captured | eol_cap

        # needle initial position (reference: VX_Sim.cpp:1084-1088)
        if env.needle_in_haystack:
            ncap = (~carry.needle_initialized) & (st.time > sim.init_cm_time)
            ini_needle = jnp.where(ncap, _needle_pos(st, body), carry.ini_needle)
            needle_init = carry.needle_initialized | ncap
        else:
            ini_needle = carry.ini_needle
            needle_init = carry.needle_initialized

        # fall-over latch: more material-6 feet than non-feet touching the
        # floor ends the sim (reference: VX_Sim.cpp:1412-1419)
        fell = carry.fell_over
        if env.falling_prohibited:
            n_all, n_feet = _touch_counts(st, body)
            fell = fell | (
                (st.time > sim.init_cm_time) & (n_feet > n_all - n_feet)
            )

        ctrl = None
        if control_sequence is not None:
            knot = jnp.minimum(i * n_knots // num_steps, n_knots - 1)
            ctrl = control_sequence[knot]

        new_state = sim_step(st, body, sim, env, dt, prec, control_offset=ctrl)

        # --- windowed speed traces for ballistic development (reference:
        # UpdateStats pushes a window every NumTimeStepsInWindow trace
        # intervals once past InitCmTime: VX_Sim.cpp:1600-1606) ---
        buf_y, buf_v = carry.buf_y, carry.buf_v
        n_traces, last_trace_t = carry.n_traces, carry.last_trace_t
        last_win_t = carry.last_win_t
        if ballistic:
            t_new = new_state.time
            cm_new = center_of_mass(new_state, body)
            vol_new = total_volume(new_state, body)
            trace_due = (t_new > sim.init_cm_time) & (
                (n_traces == 0) | (last_trace_t + tb <= t_new)
            )
            pushed_y = jnp.roll(buf_y, -1).at[-1].set(cm_new[1])
            pushed_v = jnp.roll(buf_v, -1).at[-1].set(vol_new)
            buf_y = jnp.where(trace_due, pushed_y, buf_y)
            buf_v = jnp.where(trace_due, pushed_v, buf_v)
            n_traces = n_traces + trace_due
            last_trace_t = jnp.where(trace_due, t_new, last_trace_t)

            win_due = (t_new > sim.init_cm_time) & (
                (last_win_t < 0) | (last_win_t + n_win * tb <= t_new)
            )
            dy = (buf_y[1:] - buf_y[:-1]) / body.nominal_size
            avg_v = 0.5 * (buf_v[1:] + buf_v[:-1])
            nb = buf_y.shape[0]
            pair_ok = jnp.arange(nb - 1) >= (nb - jnp.minimum(n_traces, nb))
            safe_v = jnp.where(avg_v > 0, avg_v, 1.0)
            wdist = jnp.sum(
                jnp.where(pair_ok, dy / safe_v**env.normalization_exponent, 0.0)
            )
            devo2 = new_state.devo.replace(
                win_prev=jnp.where(
                    win_due, new_state.devo.win_last, new_state.devo.win_prev
                ),
                win_last=jnp.where(win_due, wdist, new_state.devo.win_last),
                win_count=new_state.devo.win_count + win_due,
            )
            new_state = new_state.replace(devo=devo2)
            last_win_t = jnp.where(win_due, t_new, last_win_t)

        stopped = fell
        if stop_time is not None:
            stopped = stopped | (st.time >= stop_time)

        # --- stop conditions beyond max-sim-time (reference:
        # VX_Sim.cpp:1398-1510 StopConditionMet, checked before each step
        # and gated on CurTime > InitCmTime) ---
        ring_ke, ring_tote, ring_move = (
            carry.ring_ke, carry.ring_tote, carry.ring_move
        )
        if stop_condition_type is not None:
            sc = stop_condition_type
            scv = sim.stop_condition_value
            met = jnp.zeros((), bool)
            if sc == SC_MAX_TIME_STEPS:
                met = i > jnp.asarray(scv + 0.5).astype(jnp.int32)
            elif sc == SC_TEMP_CYCLES:
                met = st.time > env.temp_period * scv
            elif sc == SC_POINTING_ERR:
                met = st.time > scv
            elif sc in history_scs:
                n_vox_inv = 1.0 / jnp.maximum(jnp.sum(body.occ), 1)
                cur_ke = st.ke_history[0]
                cur_tote = cur_ke + st.total_strain_e
                cur_move = st.max_vox_vel * dt
                if sc == SC_MIN_KE:
                    ok = (ring_ke >= 0) & (ring_ke * n_vox_inv <= 0.001 * scv)
                    met = jnp.all(ok) & (cur_ke * n_vox_inv <= 0.001 * scv)
                elif sc == SC_CONST_MAXENERGY:
                    ok = (ring_tote >= 0) & (
                        jnp.abs(ring_tote - cur_tote) * n_vox_inv
                        <= 0.001 * scv
                    )
                    met = jnp.all(ok)
                elif sc == SC_MIN_MAXMOVE:
                    ok = (ring_move >= 0) & (ring_move <= 0.001 * scv)
                    met = jnp.all(ok) & (cur_move <= 0.001 * scv)
                else:  # SC_MIN_MAXMOVE_MAX_SIM_TIME
                    ok = (ring_move >= 0) & (ring_move <= MOTION_FLOOR_THR)
                    met = (st.time > scv) | (
                        jnp.all(ok) & (cur_move <= MOTION_FLOOR_THR)
                    )
                # push the history rings every num_jump steps
                push = (i % num_jump) == 0
                ring_ke = jnp.where(
                    push, jnp.roll(ring_ke, 1).at[0].set(cur_ke), ring_ke
                )
                ring_tote = jnp.where(
                    push, jnp.roll(ring_tote, 1).at[0].set(cur_tote), ring_tote
                )
                ring_move = jnp.where(
                    push, jnp.roll(ring_move, 1).at[0].set(cur_move), ring_move
                )
            stopped = stopped | ((st.time > sim.init_cm_time) & met)
        new_state = jax.tree_util.tree_map(
            lambda old, new: jnp.where(stopped, old, new), st, new_state
        )

        out = ()
        if want_trace:
            out = (cm_now, total_volume(st, body), st.time)
        return (
            _Carry(new_state, ini_cm, cm_initialized, eol_y, eol_captured,
                   fell, ini_needle, needle_init,
                   buf_y, buf_v, n_traces, last_trace_t, last_win_t,
                   src_min, src_sum, src_count,
                   ring_ke, ring_tote, ring_move),
            out,
        )

    dtype = state.pos.dtype
    carry0 = _Carry(
        state,
        center_of_mass(state, body),
        jnp.zeros((), bool),
        jnp.zeros((), dtype),
        jnp.zeros((), bool),
        jnp.zeros((), bool),
        _needle_pos(state, body),
        jnp.zeros((), bool),
        buf_y=jnp.zeros((n_win,), dtype) if ballistic else None,
        buf_v=jnp.zeros((n_win,), dtype) if ballistic else None,
        n_traces=jnp.zeros((), jnp.int32) if ballistic else None,
        last_trace_t=jnp.full((), -1.0, dtype) if ballistic else None,
        last_win_t=jnp.full((), -1.0, dtype) if ballistic else None,
        src_min=(jnp.full((env.sources.num_sources,), -1.0, dtype)
                 if env.sources is not None else None),
        src_sum=(jnp.zeros((env.sources.num_sources,), dtype)
                 if env.sources is not None else None),
        src_count=jnp.zeros((), jnp.int32) if env.sources is not None else None,
        ring_ke=jnp.full((10,), -1.0, dtype) if want_rings else None,
        ring_tote=jnp.full((10,), -1.0, dtype) if want_rings else None,
        ring_move=jnp.full((10,), -1.0, dtype) if want_rings else None,
    )
    xs = jnp.arange(num_steps)
    stride = max(trace_every, 1)
    if want_trace:
        carry, (cms, vols, times) = jax.lax.scan(step_fn, carry0, xs, unroll=unroll)
        cm_trace = cms[::stride]
        vol_trace = vols[::stride]
        trace_times = times[::stride]
    else:
        carry, _ = jax.lax.scan(step_fn, carry0, xs, unroll=unroll)
        cm_trace = vol_trace = trace_times = None

    final = carry.state
    L = body.nominal_size
    final_cm = center_of_mass(final, body)
    ini_cm = carry.ini_cm
    delta = final_cm - ini_cm
    dsq = delta[0] ** 2 + delta[1] ** 2
    # double-where: keep the gradient finite at zero displacement (the
    # zero-control BPTT starting point would otherwise NaN immediately)
    final_dist = jnp.where(
        dsq > 0, jnp.sqrt(jnp.where(dsq > 0, dsq, 1.0)), 0.0
    ) / L
    final_dist_y = delta[1] / L

    # anterior/posterior voxel extremes (reference: VX_Sim.cpp:2584-2697)
    vdel = final.pos[..., :2] - ini_cm[:2]
    vdsq = jnp.sum(vdel * vdel, axis=-1)
    vdist = jnp.where(vdsq > 0, jnp.sqrt(jnp.where(vdsq > 0, vdsq, 1.0)), 0.0) / L
    anterior_dist = jnp.max(jnp.where(body.occ, vdist, 0.0))
    posterior_dist = jnp.min(jnp.where(body.occ, vdist, _BIG))
    # anterior/posterior voxel y in lattice units, AnteriorY floored at 0
    # by its accumulator init (reference: VX_Sim.cpp getAnteriorY/getPosteriorY)
    non_obstacle = body.occ & (body.mat != 5)
    anterior_y = jnp.max(jnp.where(non_obstacle, final.pos[..., 1] / L, 0.0))
    posterior_y = jnp.min(jnp.where(non_obstacle, final.pos[..., 1] / L, _BIG))

    n_all, n_feet = _touch_counts(final, body)

    # volume-normalized distances over the trace (reference:
    # VX_SimGA.cpp:58-117) — plain |ΔCoM| when NormDistByVol is off
    norm_final_dist = final_dist
    norm_frozen_dist = jnp.zeros_like(final_dist)
    # (the reference subtracts the raw-meters posterior Y from the
    # L-normalized posterior distance — replicated verbatim for parity:
    # VX_SimGA.cpp:39 normRegimeDist)
    norm_regime_dist = posterior_dist - carry.eol_posterior_y
    if env.norm_dist_by_vol and want_trace:
        exp = env.normalization_exponent
        cm_y = cm_trace[:, 1]
        life = trace_times <= sim.stop_condition_value
        norm_final_dist = _norm_dist_by_vol(
            cm_y, vol_trace, jnp.ones_like(life), L, exp
        )
        if sim.afterlife_time is not None:
            regime = trace_times > sim.stop_condition_value
            norm_regime_dist = _norm_dist_by_vol(cm_y, vol_trace, regime, L, exp)
        # frozen window mask (reference: VX_Sim.cpp:1090-1104)
        middle = 0.5 * (sim.stop_condition_value - sim.init_cm_time)
        fs = middle - 0.5 * sim.mid_life_freeze_time + sim.init_cm_time
        fe = middle + 0.5 * sim.mid_life_freeze_time
        frozen = (trace_times > fs) & (trace_times < fe)
        norm_frozen_dist = _norm_dist_by_vol(cm_y, vol_trace, frozen, L, exp)

    # fixed trailing window distance (reference: VX_Sim.cpp:2745-2784)
    norm_window_dist = jnp.zeros_like(final_dist)
    if env.num_trace_steps_in_window > 0 and want_trace:
        w = min(env.num_trace_steps_in_window, int(cm_trace.shape[0]))
        norm_window_dist = _norm_dist_by_vol(
            cm_trace[-w:, 1], vol_trace[-w:],
            jnp.ones((w,), bool), L, env.normalization_exponent,
        )

    # needle-in-haystack (reference: VX_SimGA.cpp:45-55)
    if env.needle_in_haystack:
        npos = _needle_pos(final, body)
        nd = npos[:2] - carry.ini_needle[:2]
        ndsq = nd[0] ** 2 + nd[1] ** 2
        push_dist = jnp.where(
            ndsq > 0, jnp.sqrt(jnp.where(ndsq > 0, ndsq, 1.0)), 0.0
        ) / L
        found_needle = (ndsq > 0).astype(jnp.int32)
    else:
        push_dist = jnp.zeros_like(final_dist)
        found_needle = jnp.zeros((), jnp.int32)

    # fall-over zeroing (reference: VX_SimGA.cpp:115-126; the penalty
    # subtracts the workspace Z dimension in voxel counts, GetVZDim)
    fall_adj_post_y = carry.eol_posterior_y
    if env.falling_prohibited:
        Z = body.occ.shape[2]
        zero = carry.fell_over
        fall_adj_post_y = jnp.where(zero, fall_adj_post_y - Z, fall_adj_post_y)
        norm_final_dist = jnp.where(zero, 0.0, norm_final_dist)
        norm_regime_dist = jnp.where(zero, 0.0, norm_regime_dist)
        norm_frozen_dist = jnp.where(zero, 0.0, norm_frozen_dist)

    # the reported headline fitness subtracts the frozen-window distance
    # (reference: VX_SimGA.cpp:145 "NormFinalDist" element)
    norm_final_dist = norm_final_dist - norm_frozen_dist

    # diverged rollouts score worst (evosoro assigns worst fitness on crash:
    # tools/evaluation.py:107-110)
    norm_final_dist = jnp.where(final.diverged, 0.0, norm_final_dist)

    source_min_dist = source_avg_min_dist = None
    if env.sources is not None:
        source_min_dist = carry.src_min
        source_avg_min_dist = jnp.where(
            carry.src_count > 0,
            carry.src_sum / jnp.maximum(carry.src_count, 1),
            -1.0,
        )

    return RolloutResult(
        source_min_dist=source_min_dist,
        source_avg_min_dist=source_avg_min_dist,
        final_state=final,
        ini_cm=ini_cm,
        final_cm=final_cm,
        norm_final_dist=norm_final_dist,
        final_dist=final_dist,
        final_dist_y=final_dist_y,
        norm_regime_dist=norm_regime_dist,
        norm_frozen_dist=norm_frozen_dist,
        anterior_dist=anterior_dist,
        posterior_dist=posterior_dist,
        anterior_y=anterior_y,
        posterior_y=posterior_y,
        end_of_life_posterior_y=carry.eol_posterior_y,
        fall_adj_post_y=fall_adj_post_y,
        fell_over=carry.fell_over,
        num_touching_floor=n_all,
        num_non_feet_touching_floor=n_feet,
        lifetime=final.time - sim.afterlife_time,
        found_needle=found_needle,
        push_dist=push_dist,
        norm_window_dist=norm_window_dist,
        diverged=final.diverged,
        cm_trace=cm_trace,
        vol_trace=vol_trace,
        trace_times=trace_times,
    )
