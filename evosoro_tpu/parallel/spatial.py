"""Spatially-sharded rollouts: lattice slabs over a device mesh with halo
exchange.

The reference never shards a single simulation (each fits one process —
SURVEY.md §2.4); this is the TPU-native capability for lattices beyond one
chip's HBM/VMEM. The (X, Y, Z) grid is sharded along X over a named mesh
axis; the 6-neighbor beam-bond stencil (reference: VX_Sim.cpp:1763 Integrate)
needs one voxel slab of (pos, quat, scale) and one slab of boundary-bond
state from each X-neighbor per step — exchanged with `lax.ppermute`
(collective-permute over ICI), the structural analog of context-parallel
ring attention for this workload (SURVEY.md §5 "long-context").

Scheme (one-slab halo, recompute-boundary):
- each device owns slabs [lo, hi); per step it builds an extended local
  state [lo-1, hi+1) by ppermuting boundary slabs, runs the *unmodified*
  `core.step.sim_step` on the extended arrays, and keeps the interior.
  The boundary bond (lo-1 → lo) is recomputed identically on both owners,
  so its damping-frame memory stays consistent without extra traffic.
- the divergence latch is `pmax`-reduced each step so all shards freeze a
  diverged rollout together (a shard that trips the latch freezes its own
  interior the same step — one step earlier than its peers — matching the
  reference's whole-sim abort semantics, VX_Sim.cpp:1774-1777).
- fitness reductions (CoM capture, NormFinalDist) are mass-weighted `psum`s.

Global lattice edges keep their False bond masks through the halo exchange,
so the wrap-around slabs ppermute delivers at the world boundary are always
masked out — no special-casing.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, SimState, VoxelBody


def supports_spatial(body: VoxelBody, sim: SimParams, env: EnvParams) -> bool:
    """Feature envelope of the spatial sharding scheme. Excluded features
    couple distant voxels inside one step (self-collision's S×S gather,
    env-source global scans) or reduce global per-step state the scheme
    does not yet exchange (equilibrium mode's KE history)."""
    return (
        body.collision is None
        and body.mesh_drag is None
        and env.sources is None
        and not sim.equilibrium_mode
        and not env.needle_in_haystack
        and not env.falling_prohibited
    )


# per-field lattice-X axis position, by top-level dataclass field name.
# (X,Y,Z[,c]) fields -> 0; (3,X,Y,Z[,c]) per-direction fields -> 1;
# (2,3,X,Y,Z) volume-effects carries -> 2; scalars/None -> no sharding.
_FIELD_X_AXIS = {
    # SimState
    "pos": 0, "quat": 0, "linmom": 0, "angmom": 0, "scale": 0,
    "last_scale": 0, "small_angle": 1, "last_pos2": 1, "last_angle1": 1,
    "last_angle2": 1, "max_strain": 1, "strain_offset": 1,
    "ts_sum": 2, "cs_area": 2,
    "time": None, "diverged": None, "ke_history": None,
    "total_strain_e": None, "max_vox_vel": None, "devo": 0,
    # VoxelBody
    "occ": 0, "mat": 0, "nom_pos": 0, "nominal_size": None,
    "mass": 0, "mass_inv": 0, "inertia": 0, "inertia_inv": 0,
    "first_moment": 0, "e_mod": 0, "poisson": 0, "cte": 0,
    "u_static": 0, "u_dynamic": 0, "lin_stiffness": 0, "two_sq_mexs": 0,
    "two_sq_iexsss": 0, "phase_offset": 0, "final_phase_offset": 0,
    "temp_amp_damp": 0, "final_temp_amp_damp": 0, "initial_voxel_size": 0,
    "final_voxel_size": 0, "growth_time": 0, "start_growth_time": 0,
    "dof_fixed": 0, "external_force": 0, "external_disp": 0,
    "external_tdisp": 0, "bond_mask": 1, "bond_homogeneous": 1,
    "bond_e": 1, "bond_e1": 1, "bond_e2": 1, "bond_a1": 1, "bond_a2": 1,
    "bond_b1": 1, "bond_b2": 1, "bond_b3": 1,
    "d_a1m1": 1, "d_a1m2": 1, "d_a2i1": 1, "d_a2i2": 1, "d_b1m1": 1,
    "d_b1m2": 1, "d_b2fm1": 1, "d_b2fm2": 1, "d_b3i1": 1, "d_b3i2": 1,
    "collision": None, "mesh_drag": None, "plastic_mod": 0, "yield_stress": 0,
    "mat_temp_phase": 0, "mat_model_vox": 0,
    "stiffness_plasticity_rate": 0, "kp": 0, "ki": 0, "antiwindup": 0,
    "bond_u": 1, "bond_eh": 1,
}


def _field_axis(path) -> int:
    """X-axis index for a leaf (-1 = unsharded), from its outermost dataclass
    field name. DevoState per-voxel fields are (X,Y,Z); its window-speed
    bookkeeping is scalar."""
    names = [n for n in (getattr(e, "name", None) for e in path)
             if n is not None]
    if not names:
        return -1
    if names[0] == "devo" and len(names) > 1:
        return -1 if names[1].startswith("win_") else 0
    ax = _FIELD_X_AXIS.get(names[0], None)
    return -1 if ax is None else ax


def _axes_tree(tree):
    """Pytree of X-axis indices (-1 = unsharded) matching `tree`'s leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, a: _field_axis(path), tree
    )


def _spec_tree(tree, axis: str):
    def spec(path, a):
        ax = _field_axis(path)
        if ax < 0:
            return P()
        return P(*([None] * ax), axis)

    return jax.tree_util.tree_map_with_path(spec, tree)


def _pvary(x, axis):
    """Mark a replicated value device-varying. jax >= 0.8 renames
    jax.lax.pvary to jax.lax.pcast(..., to='varying'); use whichever this
    jax provides without tripping the deprecation."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        try:
            return pcast(x, axis, to="varying")
        except TypeError:
            pass
    return jax.lax.pvary(x, axis)


def _halo_extend(tree, axes, axis_name: str, n_dev: int, w: int = 1):
    """Concatenate each array with its X-neighbors' `w` boundary slabs:
    local (Xl, ...) -> (Xl+2w, ...). Unsharded leaves pass through.
    Width 1 covers the bond stencil; volume effects need width 2 (the bond
    stress reads the neighbor's voxel-pass strains, which read *its*
    neighbors' bond strains — reference: VXS_Voxel.cpp:543-632)."""
    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def ext(a, ax):
        if ax < 0:
            return a
        last = jax.lax.slice_in_dim(a, a.shape[ax] - w, a.shape[ax], axis=ax)
        first = jax.lax.slice_in_dim(a, 0, w, axis=ax)
        from_left = jax.lax.ppermute(last, axis_name, right_perm)
        from_right = jax.lax.ppermute(first, axis_name, left_perm)
        return jnp.concatenate([from_left, a, from_right], axis=ax)

    return jax.tree_util.tree_map(ext, tree, axes)


def _interior(tree, axes, w: int = 1):
    def trim(a, ax):
        if ax < 0:
            return a
        return jax.lax.slice_in_dim(a, w, a.shape[ax] - w, axis=ax)

    return jax.tree_util.tree_map(trim, tree, axes)


@struct.dataclass
class SpatialRolloutResult:
    """Reduced outputs of a spatially-sharded rollout (the locomotion subset
    of core.rollout.RolloutResult; full statistics need only more psums)."""

    final_state: SimState  # sharded along the mesh axis
    ini_cm: Any
    final_cm: Any
    final_dist: Any  # |ΔCoM_xy| / lattice_dim (VX_SimGA.cpp:36)
    final_dist_y: Any
    diverged: Any


def spatial_rollout(
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    dt,
    mesh: Mesh,
    axis: str = "space",
    state: SimState | None = None,
) -> SpatialRolloutResult:
    """Run one rollout with the lattice sharded along `axis` of `mesh`.

    `body` X dim must divide by the mesh axis size. Returns reduced fitness
    plus the still-sharded final state. Compose with `jax.vmap` outside for
    a batch axis, or use a 2D mesh (batch × space).
    """
    if not supports_spatial(body, sim, env):
        raise ValueError("configuration outside the spatial-sharding envelope")
    n_dev = mesh.shape[axis]
    X = body.occ.shape[0]
    if X % n_dev:
        raise ValueError(f"lattice X={X} not divisible by mesh axis {n_dev}")

    if state is None:
        state = init_state(
            body,
            volume_effects=sim.volume_effects_enabled,
            ballistic_devo=False,
        )

    halo_w = 2 if sim.volume_effects_enabled else 1
    if X // n_dev < halo_w:
        raise ValueError(
            f"local slab {X // n_dev} thinner than halo width {halo_w}"
        )
    body_spec = _spec_tree(body, axis)
    state_spec = _spec_tree(state, axis)
    body_axes = _axes_tree(body)
    state_axes = _axes_tree(state)
    total_mass = jnp.sum(body.mass)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(state_spec, body_spec),
        out_specs=(
            state_spec,
            P(), P(), P(), P(), P(),
        ),
    )
    def run(local_state, local_body):
        ext_body = _halo_extend(local_body, body_axes, axis, n_dev, w=halo_w)

        # scalar state summaries start replicated but are recomputed from
        # shard-local data inside the scan — mark them device-varying so the
        # scan carry types line up (pmean/pmax below restores replication)
        local_state = local_state.replace(
            total_strain_e=_pvary(local_state.total_strain_e, axis),
            max_vox_vel=_pvary(local_state.max_vox_vel, axis),
            ke_history=_pvary(local_state.ke_history, axis),
            cur_dt=(_pvary(local_state.cur_dt, axis)
                    if local_state.cur_dt is not None else None),
            # time advances by the (pmax-agreed) dynamic dt under volume
            # effects, which marks it varying inside the scan
            time=(_pvary(local_state.time, axis)
                  if local_state.cur_dt is not None else local_state.time),
        )

        def local_cm(st):
            m = local_body.mass[..., None]
            s = jnp.sum(st.pos * m, axis=(0, 1, 2))
            return jax.lax.psum(s, axis) / total_mass

        def step_fn(carry, _):
            st, ini_cm, captured = carry
            cm_now = local_cm(st)
            capture = (~captured) & (st.time > sim.init_cm_time)
            ini_cm = jnp.where(capture, cm_now, ini_cm)
            captured = captured | capture

            ext_state = _halo_extend(st, state_axes, axis, n_dev, w=halo_w)
            new_ext = sim_step(
                ext_state, ext_body, sim, env, dt,
                # volume effects recompute dt per step from the max bond
                # frequency — shards must agree on the GLOBAL max
                dt_reduce=lambda f: jax.lax.pmax(f, axis),
            )
            new_st = _interior(new_ext, state_axes, w=halo_w)
            # all shards must agree on the divergence latch
            new_st = new_st.replace(
                diverged=jax.lax.pmax(new_st.diverged.astype(jnp.int32), axis)
                > 0
            )
            return (new_st, ini_cm, captured), ()

        if local_state.cur_dt is not None:
            # the dynamic-dt time makes capture flags varying as well
            carry0 = (
                local_state,
                _pvary(local_cm(local_state), axis),
                _pvary(jnp.zeros((), bool), axis),
            )
        else:
            carry0 = (local_state, local_cm(local_state), jnp.zeros((), bool))
        (final, ini_cm, _), _ = jax.lax.scan(
            step_fn, carry0, None, length=num_steps
        )

        # per-shard energy/velocity summaries -> replicated outputs. These
        # feed only the (spatially-unsupported) quiescence stop conditions
        # and equilibrium mode; boundary bonds appear in two shards' local
        # sums, so pmean here is a summary, not an exact global energy.
        final = final.replace(
            ke_history=jax.lax.pmean(final.ke_history, axis),
            total_strain_e=jax.lax.pmean(final.total_strain_e, axis),
            max_vox_vel=jax.lax.pmax(final.max_vox_vel, axis),
        )
        if final.cur_dt is not None:
            # dynamic-dt carries are identical on every shard (the in-step
            # pmax agrees on the bound); pmax just restores replication
            final = final.replace(
                cur_dt=jax.lax.pmax(final.cur_dt, axis),
                time=jax.lax.pmax(final.time, axis),
            )
            ini_cm = jax.lax.pmax(ini_cm, axis)

        final_cm = local_cm(final)
        delta = final_cm - ini_cm
        dsq = delta[0] ** 2 + delta[1] ** 2
        dist = jnp.where(
            dsq > 0, jnp.sqrt(jnp.where(dsq > 0, dsq, 1.0)), 0.0
        ) / body.nominal_size
        return (
            final,
            ini_cm,
            final_cm,
            dist,
            delta[1] / body.nominal_size,
            final.diverged,
        )

    # place inputs according to the specs before entering
    state = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), state, state_spec
    )
    body = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(jnp.asarray(a), NamedSharding(mesh, s)),
        body, body_spec,
    )
    final, ini_cm, final_cm, dist, dist_y, diverged = jax.jit(run)(state, body)
    return SpatialRolloutResult(
        final_state=final,
        ini_cm=ini_cm,
        final_cm=final_cm,
        final_dist=dist,
        final_dist_y=dist_y,
        diverged=diverged,
    )
