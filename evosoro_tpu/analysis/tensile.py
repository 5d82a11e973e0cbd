"""Tensile-test harness — the QVX_TensileTest capability, headless.

The reference GUI sweeps prescribed displacement steps on a specimen and
records the reaction force into a stress–strain curve (reference:
VoxCad/QVX_TensileTest.{h,cpp}; it steps displacement and runs the dynamic
engine to equilibrium per step). Here each displacement step is a static
solve: clamp one face, prescribe displacement on the opposite face, solve
the free DOFs with matrix-free CG (analysis/fea.py), and read the reaction
force off the prescribed face from the same beam-bond operator.
"""

from __future__ import annotations

import jax.numpy as jnp

from evosoro_tpu.analysis.fea import _elastic_loads, linear_operator
from evosoro_tpu.core.types import VoxelBody


def tensile_test(body: VoxelBody, axis: int = 0, strains=None,
                 tol: float = 1e-10, maxiter: int | None = None):
    """Displacement-controlled tension along `axis`.

    The -axis face is clamped; the +axis face is displaced by
    strain · specimen_length per sample. Returns dict with arrays
    `strain`, `force` (reaction on the pulled face, N), `stress`
    (force / undeformed cross-section area, Pa) and `stiffness`
    (dF/dδ of the first sample, N/m).
    """
    import jax

    if strains is None:
        strains = jnp.linspace(0.0, 0.02, 5)[1:]
    strains = jnp.asarray(strains)

    occ = body.occ
    X, Y, Z = occ.shape
    idx = [None, None, None]
    idx[axis] = 0
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                     indexing="ij"), axis=0
    )[axis]
    lo = coords == coords.min()
    hi = coords == coords.max()
    clamp = occ & lo
    pull = occ & hi

    L_total = (int(occ.shape[axis]) - 1) * body.nominal_size
    # cross-section: occupied voxels on the pulled face × voxel area
    area = jnp.sum(pull) * body.nominal_size**2

    matvec = linear_operator(body)
    free = (occ & ~clamp & ~pull)[..., None]

    def solve_one(strain):
        d = strain * L_total
        u_presc = jnp.zeros((X, Y, Z, 3), body.nom_pos.dtype)
        u_presc = u_presc.at[..., axis].add(jnp.where(pull, d, 0.0))
        w_zero = jnp.zeros_like(u_presc)

        # load on free DOFs induced by the prescribed displacements
        fb, mb = matvec(u_presc, w_zero)

        def A(xs):
            u, w = xs
            fu, fw = matvec(u * free, w * free)
            return fu * free, fw * free

        b = (-fb * free, -mb * free)
        sol, _ = jax.scipy.sparse.linalg.cg(
            A, b, tol=tol,
            maxiter=(20 * X * Y * Z if maxiter is None else maxiter),
        )
        u = sol[0] * free + u_presc
        w = sol[1] * free
        # reaction: the elastic load the specimen exerts on the pulled face
        f_int, _ = _elastic_loads(body, u, w)
        reaction = -jnp.sum(jnp.where(pull, f_int[..., axis], 0.0))
        return reaction

    forces = jax.vmap(solve_one)(strains)
    stress = forces / area
    stiffness = forces[0] / (strains[0] * L_total)
    return dict(strain=strains, force=forces, stress=stress,
                stiffness=stiffness)
