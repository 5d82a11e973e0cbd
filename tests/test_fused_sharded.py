"""Fused Pallas rollout under a device mesh (the production multi-chip
path): shard_map over the batch axis, one kernel grid per device. Validated
on the 8-virtual-CPU-device mesh in interpreter mode against the unsharded
kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.ops.fused_rollout import fused_rollout
from evosoro_tpu.parallel.mesh import make_mesh, shard_batch, sharded_fused_rollout

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device mesh"
)


def test_sharded_fused_matches_unsharded():
    rng = np.random.default_rng(2)
    n = 4
    structure = rng.integers(0, 5, size=(n, n, n)).astype(np.int32)
    structure[n // 2, n // 2, 0] = 3
    phase = rng.uniform(-1, 1, size=(n, n, n))
    body = build_body(structure, palette_from_list(evosoro_default_palette()),
                      phase_offset=phase)
    sim = SimParams()
    env = EnvParams()
    dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
    state = init_state(body)
    B = 64  # 8 per device × 8 devices
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), state
    )
    steps = 10

    ref_state, ref_stats = fused_rollout(
        batched, body, sim, env, num_steps=steps, dt=dt, interpret=True
    )

    mesh = make_mesh()
    sharded = shard_batch(batched, mesh)
    out_state, out_stats = sharded_fused_rollout(
        sharded, body, sim, env, num_steps=steps, dt=dt, mesh=mesh,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.pos), np.asarray(ref_state.pos), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out_state.linmom), np.asarray(ref_state.linmom),
        rtol=0, atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(out_stats.diverged), np.asarray(ref_stats.diverged)
    )
    # outputs really are sharded over the mesh
    shards = out_state.pos.sharding
    assert shards.is_fully_replicated is False
