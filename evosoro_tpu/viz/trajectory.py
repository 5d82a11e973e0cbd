"""Trajectory recording: downsampled pose snapshots of a rollout.

The reference's visual verification loop is "run the .vxa in VoxCad and watch
it" (reference: README.md:120-140); the TPU equivalent records (pos, quat,
scale, time) every `every` steps during a compiled rollout and hands the
stacked snapshots to the renderer."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, SimState, VoxelBody


class Trajectory(NamedTuple):
    """(F, ...) stacked pose snapshots of one rollout."""

    pos: Any  # (F, X, Y, Z, 3)
    quat: Any  # (F, X, Y, Z, 4)
    scale: Any  # (F, X, Y, Z)
    time: Any  # (F,)
    final_state: SimState


def record_trajectory(
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    dt=None,
    every: int = 50,
    state: SimState | None = None,
    control_sequence=None,
) -> Trajectory:
    """Scan the physics and stack a pose snapshot every `every` steps
    (snapshot f covers step f*every; the initial state is frame 0)."""
    from evosoro_tpu.core.materials import calc_max_dt

    if dt is None:
        dt = calc_max_dt(body) * sim.dt_frac
    if state is None:
        state = init_state(
            body, volume_effects=sim.volume_effects_enabled
        )
    n_knots = 0 if control_sequence is None else control_sequence.shape[0]

    n_frames = max(1, num_steps // every)

    @jax.jit
    def run(state):
        def one_step(i, st):
            ctrl = None
            if control_sequence is not None:
                knot = jnp.minimum(i * n_knots // num_steps, n_knots - 1)
                ctrl = control_sequence[knot]
            return sim_step(st, body, sim, env, dt, control_offset=ctrl)

        def chunk(carry, f):
            # snapshot the state at the top of the chunk, then advance
            snap = (carry.pos, carry.quat, carry.scale, carry.time)
            new = jax.lax.fori_loop(
                0, every, lambda j, st: one_step(f * every + j, st), carry
            )
            return new, snap

        final, (pos, quat, scale, time) = jax.lax.scan(
            chunk, state, jnp.arange(n_frames)
        )
        # run out the remainder so final matches num_steps exactly
        rem = num_steps - n_frames * every
        if rem:
            final = jax.lax.fori_loop(
                0, rem,
                lambda j, st: one_step(n_frames * every + j, st),
                final,
            )
        return final, pos, quat, scale, time

    final, pos, quat, scale, time = run(state)
    return Trajectory(
        pos=pos, quat=quat, scale=scale, time=time, final_state=final
    )
