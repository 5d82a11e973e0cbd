"""Self-collision: sphere-envelope contact between surface voxels.

TPU-native re-design of the reference collision system
(reference: VX_Sim.cpp:2357-2414 CalcL1Bonds + VXS_BondCollision.cpp:41-59
CalcContactForce + VX_Voxel.cpp:171 CalcNearby):

- The reference lazily rebuilds an O(surface²) candidate *bond list* whenever
  accumulated motion exceeds the collision horizon, then evaluates contact
  forces on the list each step. Dynamic lists don't compile; instead we
  precompute the *static* part on the host once per design — the surface
  voxel index list (surface voxels never change: lattice topology is static)
  and the "nearby in the lattice" pair exclusion (BFS through the bond graph,
  VX_Voxel.cpp:171-214, does not jump gaps) — and evaluate the full masked
  S×S pairwise contact every step. That is a superset of the reference's
  candidate list, so the physics is identical; the extra distance tests are
  dense vectorized FLOPs the VPU eats for free at evosoro scales (S ≲ 600
  even for a hollow 10³ body).

- Contact model (VXS_BondCollision.cpp:41-59): overlap when
  dist < 0.75·(s1+s2); repulsion F = a1·overlap along the center line, no
  moments; a1 = E_comp·A/L with composite E = 2·E1E2/(E1+E2), A = L², and
  L = average nominal size (VX_Bond.cpp:90-141), precomputed per pair.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class CollisionSystem:
    """Static per-design collision tables (pytree; vmap-able)."""

    surf_idx: Any  # (S, 3) int32 lattice coords of surface voxels (padded)
    surf_mask: Any  # (S,) bool — False for pad entries
    pair_a1: Any  # (S, S) contact stiffness E_comp·A/L per pair
    allowed: Any  # (S, S) bool — both real, i≠j, not lattice-nearby

    @property
    def num_surface(self):
        return self.surf_idx.shape[0]


def _lattice_hops(occ: np.ndarray) -> "list[np.ndarray]":
    """BFS frontier expansion helper: 6-neighbor shifts of a bool grid."""
    out = []
    for d in range(3):
        for s in (1, -1):
            out.append(np.roll(occ, s, axis=d))
    return out


def build_collision_system(
    structure: np.ndarray,
    e_mod: np.ndarray,
    lattice_dim: float,
    collision_horizon: float = 2.0,
    pad_to: int | None = None,
    dtype=np.float32,
) -> CollisionSystem:
    """Host-side precompute of the collision tables for one design.

    `collision_horizon` matches the reference SimParams value; exclusion uses
    NumHops = int(horizon·1.5) lattice hops through the *bond graph*
    (reference: VX_Sim.cpp:658; VX_Voxel.cpp:171 "does not jump gaps").
    `pad_to` fixes S so heterogeneous designs batch under vmap.
    """
    structure = np.asarray(structure)
    e_mod = np.asarray(e_mod, dtype=np.float64)
    occ = structure > 0
    X, Y, Z = occ.shape

    # surface voxels: any of the 6 internal bonds missing (VX_Voxel.h:80)
    full_nbrs = np.zeros_like(occ, dtype=np.int32)
    for d in range(3):
        for s in (1, -1):
            shifted = np.zeros_like(occ)
            src = [slice(None)] * 3
            dst = [slice(None)] * 3
            if s == 1:
                src[d], dst[d] = slice(0, -1), slice(1, None)
            else:
                src[d], dst[d] = slice(1, None), slice(0, -1)
            shifted[tuple(dst)] = occ[tuple(src)]
            full_nbrs += shifted.astype(np.int32)
    surface = occ & (full_nbrs < 6)
    idx = np.argwhere(surface).astype(np.int32)  # (S0, 3)
    S0 = idx.shape[0]
    S = int(pad_to) if pad_to is not None else S0
    if S < S0:
        raise ValueError(f"pad_to={S} < number of surface voxels {S0}")

    surf_idx = np.zeros((S, 3), dtype=np.int32)
    surf_idx[:S0] = idx
    surf_mask = np.zeros((S,), dtype=bool)
    surf_mask[:S0] = True

    # lattice-nearby exclusion: BFS through occupied 6-neighbor bonds.
    num_hops = int(collision_horizon * 1.5)
    flat_id = np.full(occ.shape, -1, dtype=np.int64)
    occ_idx = np.argwhere(occ)
    flat_id[tuple(occ_idx.T)] = np.arange(len(occ_idx))
    n_occ = len(occ_idx)
    # reach[v] = set of occupied voxels within num_hops bond hops of v.
    # Sparse boolean powers of the lattice adjacency: the bond graph has
    # ≤3·n edges, so csr products are ~O(n·deg^hops) — this runs per
    # individual per generation in the evaluator, dense n² powers don't.
    rows_a, cols_a = [], []
    for d in range(3):
        here = occ_idx[:, d] < occ.shape[d] - 1
        nbr = occ_idx.copy()
        nbr[:, d] += 1
        ok = here & (flat_id[tuple(np.clip(nbr, 0, np.array(occ.shape) - 1).T)] >= 0)
        a = flat_id[tuple(occ_idx[ok].T)]
        b = flat_id[tuple(nbr[ok].T)]
        rows_a += [a, b]
        cols_a += [b, a]
    try:
        import scipy.sparse as sp

        rows_cat = np.concatenate(rows_a) if rows_a else np.zeros(0, np.int64)
        cols_cat = np.concatenate(cols_a) if cols_a else np.zeros(0, np.int64)
        adj = sp.csr_matrix(
            (np.ones(len(rows_cat), dtype=bool), (rows_cat, cols_cat)),
            shape=(n_occ, n_occ),
        )
        reach = sp.identity(n_occ, dtype=bool, format="csr")
        for _ in range(num_hops):
            reach = (reach + reach @ adj).astype(bool)
        reach = reach.toarray()
    except ImportError:  # dense fallback
        adj = np.zeros((n_occ, n_occ), dtype=bool)
        for a, b in zip(rows_a, cols_a):
            adj[a, b] = True
        reach = np.eye(n_occ, dtype=bool)
        for _ in range(num_hops):
            reach = reach | (reach @ adj)

    surf_flat = flat_id[tuple(idx.T)]  # (S0,) indices into occ arrays
    nearby = reach[np.ix_(surf_flat, surf_flat)]  # (S0, S0)

    allowed = np.zeros((S, S), dtype=bool)
    real = np.outer(surf_mask[:S0], surf_mask[:S0])
    allowed[:S0, :S0] = real & ~nearby
    np.fill_diagonal(allowed, False)

    # pair contact stiffness a1 = E_comp·A/L = E_comp·L (A=L², L_bond=L)
    e_surf = np.zeros((S,), dtype=np.float64)
    e_surf[:S0] = e_mod[tuple(idx.T)]
    e1 = e_surf[:, None]
    e2 = e_surf[None, :]
    denom = e1 + e2
    e_comp = np.where(denom > 0, 2.0 * e1 * e2 / np.where(denom > 0, denom, 1.0), 0.0)
    pair_a1 = (e_comp * float(lattice_dim)).astype(dtype)
    pair_a1 = np.where(allowed, pair_a1, 0.0).astype(dtype)

    # host (numpy) arrays out: the tables are built per individual per
    # generation on the evaluator host path, and eager jnp.asarray on a
    # tunneled TPU backend costs an RPC round trip per field; batch
    # callers stack these and pay one transfer at the jitted launch
    return CollisionSystem(
        surf_idx=surf_idx,
        surf_mask=surf_mask,
        pair_a1=pair_a1,
        allowed=allowed,
    )


def pad_collision_system(cs: CollisionSystem, S: int) -> CollisionSystem:
    """Zero-pad a CollisionSystem's surface dimension to S so heterogeneous
    designs stack/vmap in one batch (pad entries are fully masked)."""
    S0 = cs.surf_idx.shape[0]
    if S0 == S:
        return cs
    if S0 > S:
        raise ValueError(f"cannot shrink collision system {S0} -> {S}")
    pad = S - S0
    # numpy when given numpy (the host-prep path must not issue eager
    # device ops); jnp inputs (inside jit) still flow through jnp.pad
    xp = np if isinstance(cs.pair_a1, np.ndarray) else jnp
    return CollisionSystem(
        surf_idx=xp.pad(cs.surf_idx, ((0, pad), (0, 0))),
        surf_mask=xp.pad(cs.surf_mask, (0, pad)),
        pair_a1=xp.pad(cs.pair_a1, ((0, pad), (0, pad))),
        allowed=xp.pad(cs.allowed, ((0, pad), (0, pad))),
    )


def attach_collision_system(body, collision_horizon: float = 2.0,
                            pad_to: int | None = None):
    """Return `body` with its CollisionSystem built and attached."""
    cs = build_collision_system(
        np.asarray(body.mat),
        np.asarray(body.e_mod),
        float(body.nominal_size),
        collision_horizon=collision_horizon,
        pad_to=pad_to,
        dtype=np.asarray(body.nom_pos).dtype,
    )
    return body.replace(collision=cs)


def collision_forces(pos, scale, colsys: CollisionSystem):
    """Dense (X,Y,Z,3) contact force field for the current voxel poses.

    For each ordered surface pair (i, j): overlap = 0.75·(sᵢ+sⱼ) − |pⱼ−pᵢ|;
    force on i = −a1·overlap·(pⱼ−pᵢ)/|pⱼ−pᵢ| when overlap > 0
    (reference: VXS_BondCollision.cpp:41-59; accumulated per owner exactly
    once by summing over j)."""
    i0, i1, i2 = colsys.surf_idx[:, 0], colsys.surf_idx[:, 1], colsys.surf_idx[:, 2]
    ps = pos[i0, i1, i2]  # (S, 3)
    sc = scale[i0, i1, i2]  # (S,)

    diff = ps[None, :, :] - ps[:, None, :]  # pⱼ − pᵢ at [i, j]
    dist2 = jnp.sum(diff * diff, axis=-1)
    safe = jnp.maximum(dist2, 1e-30)
    dist = jnp.sqrt(safe)
    nom = 0.75 * (sc[:, None] + sc[None, :])
    overlap = nom - dist
    active = colsys.allowed & (overlap > 0.0)
    mag = jnp.where(active, colsys.pair_a1 * overlap / dist, 0.0)
    f = -jnp.sum(mag[..., None] * diff, axis=1)  # (S, 3), force on i
    f = jnp.where(colsys.surf_mask[:, None], f, 0.0)

    dense = jnp.zeros_like(pos)
    return dense.at[i0, i1, i2].add(f)
