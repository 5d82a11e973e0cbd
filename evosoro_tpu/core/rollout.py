"""Rollouts: `lax.scan` over the physics step + trajectory statistics.

Replaces the reference's `while !StopConditionMet(): TimeStep()` driver loop
(reference: voxelyzeMain/main.cpp:89-111) with a compiled scan of fixed step
count; stop conditions other than max-sim-time become freeze masks. Fitness
metrics are pure reductions replicating VX_SimGA.cpp:36-124.
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


def init_state(body: VoxelBody, dtype=None) -> SimState:
    """Initial rest state (reference: VXS_Voxel.cpp:95-134 ResetVoxel)."""
    X, Y, Z = body.occ.shape
    dtype = dtype or body.nom_pos.dtype
    nom = jnp.broadcast_to(body.nominal_size, (X, Y, Z)).astype(dtype)
    return SimState(
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
        ke_history=jnp.zeros((6,), dtype),
    )


def center_of_mass(state: SimState, body: VoxelBody):
    """Mass-weighted CoM (reference: VX_Sim.cpp:2415-2430 GetCM)."""
    total_mass = jnp.sum(body.mass)
    return jnp.sum(
        state.pos * body.mass[..., None], axis=(0, 1, 2)
    ) / jnp.where(total_mass > 0, total_mass, 1.0)


@struct.dataclass
class RolloutResult:
    """Outputs of one rollout (batched via vmap)."""

    final_state: SimState
    ini_cm: Any  # CoM captured when t first exceeds init_cm_time
    final_cm: Any
    norm_final_dist: Any  # |ΔCoM_xy| / lattice_dim (VX_SimGA.cpp:36)
    final_dist_y: Any  # ΔCoM_y / lattice_dim
    diverged: Any
    cm_trace: Any  # (T_trace, 3) CoM snapshots (SS.CMTrace analog)
    trace_times: Any


class _Carry(NamedTuple):
    state: SimState
    ini_cm: jnp.ndarray
    cm_initialized: jnp.ndarray


def num_steps_for(body: VoxelBody, sim: SimParams, dt=None) -> int:
    """Concrete step count covering the sim's stop-condition time.

    Host-side helper (dt must be concrete): the scan length is static.
    """
    import numpy as np

    if dt is None:
        dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    total = float(sim.stop_condition_value) + float(sim.afterlife_time)
    return int(np.ceil(total / dt))


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
) -> RolloutResult:
    """Run `num_steps` of physics and reduce fitness statistics.

    `control_sequence`: optional (num_control_knots, X, Y, Z) per-voxel scale
    modulation; knot k is active for steps [k*S/K, (k+1)*S/K) — the MPC
    actuation channel. `trace_every > 0` records the CoM every that many
    steps (analog of TimeBetweenTraces, VX_Environment.h).

    `stop_time`: optional per-rollout SC_MAX_SIM_TIME value; once a rollout's
    sim time passes it, its state freezes for the remaining steps. This lets
    a batch of rollouts with heterogeneous dt (CalcMaxDt is design-dependent,
    reference: VX_Sim.cpp:1693-1727) share one fixed-length scan.
    """
    if dt is None:
        dt = calc_max_dt(body) * sim.dt_frac
    if state is None:
        state = init_state(body)

    n_knots = 0 if control_sequence is None else control_sequence.shape[0]

    def step_fn(carry: _Carry, i):
        st = carry.state
        # IniCM capture happens at the top of TimeStep when CurTime has
        # passed InitCmTime (reference: VX_Sim.cpp:1064-1075), i.e. with the
        # CoM computed from the *previous* step's positions.
        cm_now = center_of_mass(st, body)
        capture = (~carry.cm_initialized) & (st.time > sim.init_cm_time)
        ini_cm = jnp.where(capture, cm_now, carry.ini_cm)
        cm_initialized = carry.cm_initialized | capture

        ctrl = None
        if control_sequence is not None:
            knot = jnp.minimum(i * n_knots // num_steps, n_knots - 1)
            ctrl = control_sequence[knot]

        new_state = sim_step(st, body, sim, env, dt, prec, control_offset=ctrl)
        if stop_time is not None:
            stopped = st.time >= stop_time
            new_state = jax.tree_util.tree_map(
                lambda old, new: jnp.where(stopped, old, new), st, new_state
            )

        out = ()
        if trace_every:
            out = (cm_now, st.time)
        return _Carry(new_state, ini_cm, cm_initialized), out

    carry0 = _Carry(
        state,
        center_of_mass(state, body),
        jnp.zeros((), bool),
    )
    xs = jnp.arange(num_steps)
    if trace_every:
        # sample the scan outputs every trace_every steps
        carry, (cms, times) = jax.lax.scan(step_fn, carry0, xs, unroll=unroll)
        cm_trace = cms[::trace_every]
        trace_times = times[::trace_every]
    else:
        carry, _ = jax.lax.scan(step_fn, carry0, xs, unroll=unroll)
        cm_trace = None
        trace_times = None

    final = carry.state
    final_cm = center_of_mass(final, body)
    delta = final_cm - carry.ini_cm
    L = body.nominal_size
    dsq = delta[0] ** 2 + delta[1] ** 2
    # double-where: keep the gradient finite at zero displacement (the
    # zero-control BPTT starting point would otherwise NaN immediately)
    norm_final_dist = jnp.where(
        dsq > 0, jnp.sqrt(jnp.where(dsq > 0, dsq, 1.0)), 0.0
    ) / L
    final_dist_y = delta[1] / L
    # diverged rollouts score worst (evosoro assigns worst fitness on crash:
    # tools/evaluation.py:107-110)
    norm_final_dist = jnp.where(final.diverged, 0.0, norm_final_dist)

    return RolloutResult(
        final_state=final,
        ini_cm=carry.ini_cm,
        final_cm=final_cm,
        norm_final_dist=norm_final_dist,
        final_dist_y=final_dist_y,
        diverged=final.diverged,
        cm_trace=cm_trace,
        trace_times=trace_times,
    )
