"""Environmental sources (light/heat beacons) and pointing-error metrics.

Replicates the reference's VX_Source machinery (reference:
VX_Environment.h:40-130): each source has a base position, optional
per-axis sinusoidal motion, and tracks its minimum distance to the robot.
The engine updates source positions once actuation starts
(updateSourcesPosition(CurTime - InitCmTime), VX_Sim.cpp:1905-1907) and
recomputes nearest-voxel distances at the top of every timestep
(updateSourcesInformation, VX_Sim.cpp:2527-2558), pushing a history sample
every UPDATE_SOURCES_HIST_EVERY=50 steps (VX_Sim.h:41) whose mean is the
average-minimum-distance statistic.

On TPU all of this is dense per-step math folded into the rollout scan —
the O(sources × voxels) scan becomes a masked min-reduction.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

# reference: Utils/Vec3D.h:21 — the engine's PI literal (14 digits)
REF_PI_VEC3D = 3.14159265358979

# reference: VX_Sim.h:41-42
UPDATE_SOURCES_HIST_EVERY = 50
POINTING_ERROR_SAMPLING_STEPS = 25


@struct.dataclass
class EnvSources:
    """Array-of-sources parameters (reference VXA <Sources><Source> block,
    VX_Environment.cpp:241-285)."""

    base_pos: Any  # (S,3) [m]
    amp: Any  # (S,3) motion amplitude per axis [m]
    freq: Any  # (S,3) motion frequency per axis [Hz]
    enabled: Any  # (S,) bool
    source_type: Any  # (S,) int32 (SourceType enum; 0 = light)

    @property
    def num_sources(self):
        return self.base_pos.shape[0]


def make_sources(entries) -> EnvSources | None:
    """Build EnvSources from dicts with keys name/type/enabled/pos/amp/freq."""
    import numpy as np

    if not entries:
        return None
    S = len(entries)
    base = np.zeros((S, 3))
    amp = np.zeros((S, 3))
    freq = np.zeros((S, 3))
    enabled = np.zeros((S,), bool)
    stype = np.zeros((S,), np.int32)
    for i, e in enumerate(entries):
        base[i] = e.get("pos", (0, 0, 0))
        amp[i] = e.get("amp", (0, 0, 0))
        freq[i] = e.get("freq", (0, 0, 0))
        enabled[i] = bool(e.get("enabled", False))
        stype[i] = int(e.get("type", 0))
    return EnvSources(
        base_pos=jnp.asarray(base),
        amp=jnp.asarray(amp),
        freq=jnp.asarray(freq),
        enabled=jnp.asarray(enabled),
        source_type=jnp.asarray(stype),
    )


def source_positions(sources: EnvSources, tau):
    """Oscillating positions at time-since-actuation tau (reference:
    VX_Environment.h:110 updateSourcePosition: base + amp·sin(2π·freq·t))."""
    return sources.base_pos + sources.amp * jnp.sin(
        2.0 * REF_PI_VEC3D * sources.freq * tau
    )


def min_distances(positions, state, body):
    """Per-source minimum distance to any occupied voxel, in lattice units
    (reference: VX_Sim.cpp:2540-2549 divides by GetLatticeDim)."""
    # (S,1,1,1,3) - (X,Y,Z,3) → (S,X,Y,Z)
    d = positions[:, None, None, None, :] - state.pos[None]
    dist2 = jnp.sum(d * d, axis=-1)
    big = jnp.asarray(jnp.inf, dist2.dtype)
    dist2 = jnp.where(body.occ[None], dist2, big)
    return jnp.sqrt(jnp.min(dist2.reshape(dist2.shape[0], -1), axis=-1)) / (
        body.nominal_size
    )


def pointing_error_deg(tip_pos, tip_quat, initial_pointing_vector, target_pos):
    """Signed planar pointing error in degrees (reference:
    VX_Sim.cpp:1010-1046 computePointingError; its TimeStep call is
    commented out — VX_Sim.cpp:1062 — but the SC_POINTING_ERR stop
    condition consumes it, so it is part of the engine surface).

    The sign convention uses N = +X as the plane normal ("WORKS ONLY IN THE
    PLANAR CASE" per the reference comment).
    """
    from evosoro_tpu.core import quaternion as q

    a = q.quat_rotate(tip_quat, initial_pointing_vector)
    b = target_pos - tip_pos
    na = a / jnp.linalg.norm(a)
    nb = b / jnp.linalg.norm(b)
    cosang = jnp.clip(jnp.sum(na * nb), -1.0, 1.0)
    err = jnp.degrees(jnp.arccos(cosang))
    cross = jnp.cross(nb, na)
    return jnp.where(cross[0] < 0, -err, err)
