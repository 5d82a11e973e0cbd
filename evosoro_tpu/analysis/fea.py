"""Static linear FEA on the voxel lattice — TPU-native re-design of VX_FEA.

The reference's CVX_FEA (reference: VX_FEA.{h,cpp}, ~1,600 LoC) assembles a
sparse global stiffness matrix from frame elements on the voxel lattice and
hands it to a direct solver; it exists for the GUI's static-analysis mode.

Here the same capability is *matrix-free*: the dynamic engine's beam-bond
force function (core/step._bond_axis_forces, the Euler–Bernoulli frame
element of VXS_BondInternal.cpp) IS the stiffness operator — its exact
linearization at the rest state, obtained with `jax.jvp`, gives K·u without
ever materializing K. Conjugate gradients (K is symmetric PSD once fixed
DOFs are projected out) solve K·u = f as a chain of 3D-stencil matvecs,
which is exactly the computation XLA maps best onto the TPU VPU — no
sparse-matrix scatter/gather anywhere.

The frame element here is the same one the dynamics integrate, so a static
solution is by construction the dynamics' equilibrium (cf. the analytic
cantilever check in VX_Benchmark.cpp:34-82, reproduced in the tests).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from evosoro_tpu.core import quaternion as q
from evosoro_tpu.core.constants import DEFAULT_PRECISION
from evosoro_tpu.core.step import _bond_axis_forces, _from_nbr
from evosoro_tpu.core.types import EnvParams, SimParams, VoxelBody
from evosoro_tpu.core.rollout import init_state


def _elastic_loads(body: VoxelBody, u, w):
    """Internal elastic force/moment on every voxel for a displacement
    field u (X,Y,Z,3) and rotation-vector field w (X,Y,Z,3).

    Positions are nom+u, orientations exp(w); dt=0 disables the bond
    damping terms, and no gravity/floor/external forces enter — this is
    the pure frame-element response."""
    state = init_state(body)
    state = state.replace(
        pos=body.nom_pos + u,
        quat=q.quat_from_rotation_vector(w),
    )
    sim = SimParams()
    env = EnvParams(gravity_enabled=False, floor_enabled=False,
                    temp_enabled=False)
    force = jnp.zeros_like(u)
    moment = jnp.zeros_like(w)
    for d in range(3):
        b = _bond_axis_forces(d, state, body, sim, env, 0.0, DEFAULT_PRECISION)
        force = force + b["f1"] + _from_nbr(b["f2"], d)
        moment = moment - b["m1"] - _from_nbr(b["m2"], d)
    return force, moment


def linear_operator(body: VoxelBody):
    """Returns K(u, w) -> (f, m): the exact linearization of the beam-bond
    force field at rest (the global stiffness operator, applied
    matrix-free). Sign convention: K·x is the *restoring* load, so the
    equilibrium equation reads K·x = f_ext."""

    zero_u = jnp.zeros_like(body.nom_pos)
    zero_w = jnp.zeros_like(body.nom_pos)

    def matvec(u, w):
        _, (df, dm) = jax.jvp(
            lambda uu, ww: _elastic_loads(body, uu, ww),
            (zero_u, zero_w), (u, w),
        )
        return -df, -dm

    return matvec


def fea_solve(
    body: VoxelBody,
    ext_force=None,
    ext_moment=None,
    fixed_mask=None,
    tol: float = 1e-9,
    maxiter: int | None = None,
):
    """Solve the static problem K·x = f for voxel displacements/rotations.

    `ext_force`/`ext_moment`: (X,Y,Z,3) applied loads [N]/[N·m].
    `fixed_mask`: (X,Y,Z) bool of fully-clamped voxels (defaults to
    body.dof_fixed != 0 — region BCs from the VXA).

    Returns dict(displacement=(X,Y,Z,3), rotation=(X,Y,Z,3),
    residual=scalar). Matrix-free CG over the 6-DOF-per-voxel field; fixed
    and empty voxels are projected out of the Krylov space.
    """
    X, Y, Z = body.occ.shape
    dtype = body.nom_pos.dtype
    f = jnp.zeros((X, Y, Z, 3), dtype) if ext_force is None else jnp.asarray(
        ext_force, dtype)
    m = jnp.zeros((X, Y, Z, 3), dtype) if ext_moment is None else jnp.asarray(
        ext_moment, dtype)
    if fixed_mask is None:
        fixed_mask = body.dof_fixed != 0
    free = (body.occ & ~fixed_mask)[..., None]

    matvec = linear_operator(body)

    def A(xs):
        u, w = xs
        fu, fw = matvec(u * free, w * free)
        return fu * free, fw * free

    b = (f * free, m * free)
    if maxiter is None:
        maxiter = 20 * X * Y * Z
    sol, _ = jax.scipy.sparse.linalg.cg(A, b, tol=tol, maxiter=maxiter)
    u, w = sol
    ru, rw = A(sol)
    res = jnp.sqrt(
        jnp.sum((ru - b[0]) ** 2) + jnp.sum((rw - b[1]) ** 2)
    )
    return dict(displacement=u * free, rotation=w * free, residual=res)
