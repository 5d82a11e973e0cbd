"""Self-collision: sphere-envelope contact between surface voxels
(reference semantics: VXS_BondCollision.cpp:41-59, VX_Sim.cpp:2357-2414)."""

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.collision import (
    attach_collision_system,
    build_collision_system,
    collision_forces,
)
from evosoro_tpu.core.materials import build_body, palette_from_list
from evosoro_tpu.core.rollout import init_state, rollout
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def _two_block_body():
    """Two single voxels separated by one empty cell along x."""
    structure = np.zeros((3, 1, 1), dtype=np.int32)
    structure[0, 0, 0] = 1
    structure[2, 0, 0] = 1
    pal = palette_from_list(evosoro_default_palette())
    body = build_body(structure, pal, lattice_dim=0.01)
    return attach_collision_system(body)


def test_surface_and_exclusion_tables():
    structure = np.zeros((4, 1, 1), dtype=np.int32)
    structure[:2, 0, 0] = 1  # bonded pair
    structure[3, 0, 0] = 1  # separate voxel
    cs = build_collision_system(structure, np.full((4, 1, 1), 1e7), 0.01)
    assert int(cs.surf_mask.sum()) == 3  # all three are surface voxels
    # bonded neighbors (0,1) are lattice-nearby → excluded
    allowed = np.asarray(cs.allowed)
    mask = np.asarray(cs.surf_mask)
    idx = {tuple(r): i for i, r in enumerate(np.asarray(cs.surf_idx)) if mask[i]}
    i01 = idx[(0, 0, 0)], idx[(1, 0, 0)]
    i3 = idx[(3, 0, 0)]
    assert not allowed[i01[0], i01[1]]
    # voxel 3 is 2 empty-gap away from voxel 1: no bond path → allowed
    assert allowed[i01[1], i3] and allowed[i3, i01[1]]
    assert not allowed[i3, i3]


def test_no_force_when_separated():
    body = _two_block_body()
    st = init_state(body)
    f = collision_forces(st.pos, st.scale, body.collision)
    assert float(jnp.max(jnp.abs(f))) == 0.0


def test_repulsion_when_overlapping():
    body = _two_block_body()
    st = init_state(body)
    # move the right voxel to within the 1.5-voxel contact envelope
    pos = st.pos.at[2, 0, 0, 0].set(st.pos[0, 0, 0, 0] + 0.012)
    f = collision_forces(pos, st.scale, body.collision)
    fx_left = float(f[0, 0, 0, 0])
    fx_right = float(f[2, 0, 0, 0])
    assert fx_left < 0 and fx_right > 0  # pushed apart
    np.testing.assert_allclose(fx_left, -fx_right, rtol=1e-6)
    # magnitude = a1·overlap = E_comp·L·(0.015 − 0.012)
    e = 5e6
    a1 = e * 0.01  # homogeneous pair → E_comp = E
    np.testing.assert_allclose(fx_right, a1 * 0.003, rtol=1e-5)
    # empty cell gets no force
    assert float(jnp.max(jnp.abs(f[1]))) == 0.0


def test_padded_system_forces_identical():
    """Surface padding (the evaluator's heterogeneous-design stacking) must
    not change forces: pad entries are fully masked."""
    from evosoro_tpu.core.collision import pad_collision_system

    body = _two_block_body()
    st = init_state(body)
    pos = st.pos.at[2, 0, 0, 0].set(st.pos[0, 0, 0, 0] + 0.012)
    f0 = collision_forces(pos, st.scale, body.collision)
    padded = pad_collision_system(body.collision, body.collision.num_surface + 5)
    f1 = collision_forces(pos, st.scale, padded)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_stacked_systems_vmap():
    """Stacked padded CollisionSystems (the batched evaluator layout) give
    the same per-design forces under vmap."""
    import jax as _jax

    from evosoro_tpu.core.collision import pad_collision_system

    bodies = [_two_block_body(), _two_block_body()]
    sts = [init_state(b) for b in bodies]
    pos = [s.pos.at[2, 0, 0, 0].set(s.pos[0, 0, 0, 0] + 0.012) for s in sts]
    s_max = max(b.collision.num_surface for b in bodies) + 3
    stacked = _jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[pad_collision_system(b.collision, s_max) for b in bodies],
    )
    f_batch = _jax.vmap(collision_forces)(
        jnp.stack(pos), jnp.stack([s.scale for s in sts]), stacked
    )
    f_single = collision_forces(pos[0], sts[0].scale, bodies[0].collision)
    np.testing.assert_allclose(np.asarray(f_batch[0]), np.asarray(f_single),
                               rtol=1e-6, atol=0)


def test_rollout_with_collisions_stays_finite():
    body = _two_block_body()
    sim = SimParams(
        stop_condition_value=0.05, init_cm_time=0.0, self_collisions_enabled=True
    )
    env = EnvParams()
    res = jax.jit(lambda: rollout(body, sim, env, num_steps=50))()
    assert not bool(res.diverged)
    assert np.all(np.isfinite(np.asarray(res.final_state.pos)))


def test_fused_collision_compact_matches_dense():
    """The surface-compacted pair pass (one-hot MXU gather/scatter,
    EVOSORO_TPU_COLL_COMPACT=1) must be physics-identical to the dense
    (Vp, Vp) pass: one-hot matmuls at HIGHEST precision are exact."""
    import os

    import jax
    import jax.numpy as jnp

    from evosoro_tpu.core.materials import build_body, calc_max_dt, \
        palette_from_list
    from evosoro_tpu.core.rollout import init_state
    from evosoro_tpu.core.types import EnvParams, SimParams, \
        evosoro_default_palette
    from evosoro_tpu.ops.fused_rollout import fused_rollout

    rng = np.random.default_rng(4)
    structure = rng.integers(0, 5, size=(5, 5, 5)).astype(np.int32)
    structure[2, 2, 0] = 3
    body = attach_collision_system(build_body(
        structure, palette_from_list(evosoro_default_palette()),
        phase_offset=rng.uniform(-1, 1, size=structure.shape)))
    sim = SimParams(init_cm_time=0.0, self_collisions_enabled=True)
    env = EnvParams()
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (8,) + x.shape), state)

    old = os.environ.get("EVOSORO_TPU_COLL_COMPACT")
    try:
        os.environ.pop("EVOSORO_TPU_COLL_COMPACT", None)
        dense, _ = fused_rollout(batched, body, sim, env, num_steps=50,
                                 dt=dt, interpret=True)
        os.environ["EVOSORO_TPU_COLL_COMPACT"] = "1"
        comp, _ = fused_rollout(batched, body, sim, env, num_steps=50,
                                dt=dt, interpret=True)
    finally:
        if old is None:
            os.environ.pop("EVOSORO_TPU_COLL_COMPACT", None)
        else:
            os.environ["EVOSORO_TPU_COLL_COMPACT"] = old
    np.testing.assert_allclose(np.asarray(comp.pos), np.asarray(dense.pos),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(comp.linmom),
                               np.asarray(dense.linmom),
                               rtol=1e-5, atol=1e-8)


def test_collision_batch_block_ladder():
    """The VMEM ladder that keeps per-individual pair fields fused up to
    2304 lanes (8 -> 4 -> 2 -> 1, rungs set by on-chip compile probes
    at multi-program batches where input windows double-buffer), and
    respects a narrower request."""
    from evosoro_tpu.ops.fused_rollout import collision_batch_block

    assert collision_batch_block(128) == 8
    assert collision_batch_block(1024) == 8
    assert collision_batch_block(1152) == 4
    assert collision_batch_block(1536) == 4
    assert collision_batch_block(1792) == 2
    assert collision_batch_block(2048) == 1
    assert collision_batch_block(2304) == 1
    assert collision_batch_block(1024, requested=4) == 4
    assert collision_batch_block(2304, requested=8) == 1
