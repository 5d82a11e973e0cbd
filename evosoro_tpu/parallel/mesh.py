"""Device-mesh sharding of rollout batches.

The reference's "distributed backend" is one OS process per individual plus
filesystem polling (reference: tools/evaluation.py:89-90, 101-211). Here the
same population/candidate parallelism is SPMD: the rollout batch is sharded
over a named ``"rollout"`` mesh axis (ICI within a slice, DCN across hosts via
`jax.distributed.initialize`), fitness reductions ride XLA collectives, and
the host only orchestrates generations/solves.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (DCN). No-op on a single host.

    Replaces the reference's "distribution" via shared filesystem
    (SURVEY.md §2.4) with jax.distributed — call once per host before any
    device access.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices: Sequence | None = None, axis_name: str = "rollout") -> Mesh:
    """1D mesh over all (or the given) devices; the rollout batch axis."""
    devices = np.array(list(devices) if devices is not None else jax.devices())
    return Mesh(devices, axis_names=(axis_name,))


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "rollout") -> Any:
    """Put a pytree of batch-leading arrays with dim 0 sharded over the mesh."""

    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (e.g. a VoxelBody) on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def sharded_rollout_fn(
    rollout_fn: Callable,
    mesh: Mesh,
    axis_name: str = "rollout",
    donate: bool = True,
):
    """Jit `rollout_fn(batched_state, *args) -> result` with the batch dim
    sharded over the mesh. XLA inserts the collectives for any cross-batch
    reductions inside `rollout_fn` (psum over ICI/DCN)."""
    in_shardings = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        rollout_fn,
        in_shardings=(in_shardings,),
        donate_argnums=(0,) if donate else (),
    )


def sharded_fused_rollout(
    batched_state,
    body,
    sim,
    env,
    num_steps: int,
    dt,
    mesh: Mesh,
    axis_name: str = "rollout",
    interpret: bool = False,
    batch_block: int = 8,
):
    """Fused Pallas rollout data-parallel over a device mesh.

    pallas_call has no SPMD partitioning rule, so sharded inputs under plain
    jit would force a gather; the production multi-chip path wraps the
    kernel in `shard_map` — each device runs its own grid over its local
    batch shard (B/n_dev must divide by `batch_block`), and any cross-batch
    fitness reductions downstream ride XLA collectives. Returns
    (new_state, FastRolloutStats) with batch-sharded leaves.

    Known-benign CPU-only warning: with `interpret=True` (the virtual-device
    dryrun/test path) the kernel is inlined as plain HLO and XLA's algebraic
    simplifier logs "likely stuck in a circular simplification loop ... on
    computation main.N_spmd" — it hits its 50-run fixed-point cap
    ping-ponging on the dynamic-update-slice-of-broadcast output stores the
    interpreter emits inside the step while-loop (verified r4 by matching
    the named computation in an --xla_dump_to dump to this module and
    watching the rewrites under TF_CPP_VMODULE=algebraic_simplifier=2).
    Compilation still terminates (the cap bounds it) and results are exact.
    On real TPU meshes the kernel is a Mosaic custom-call that the
    simplifier treats as opaque, so the pattern cannot arise in production
    and there is no pod compile-time risk."""
    try:
        from jax import shard_map
    except ImportError:  # jax < 0.7 layout
        from jax.experimental.shard_map import shard_map

    from evosoro_tpu.ops.fused_rollout import fused_rollout

    def local_fn(local_state):
        return fused_rollout(
            local_state, body, sim, env, num_steps=num_steps, dt=dt,
            interpret=interpret, batch_block=batch_block,
        )

    spec_of = lambda x: P(axis_name, *([None] * (x.ndim - 1)))  # noqa: E731
    in_specs = (jax.tree_util.tree_map(spec_of, batched_state),)
    out_specs = jax.eval_shape(local_fn, batched_state)
    out_specs = jax.tree_util.tree_map(spec_of, out_specs)
    return shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(batched_state)


def scaling_report(
    fn: Callable,
    make_batch: Callable[[int], Any],
    device_counts: Sequence[int] | None = None,
    reps: int = 3,
    axis_name: str = "rollout",
) -> dict:
    """Measure solves/s scaling efficiency over growing sub-meshes.

    `make_batch(n_items)` builds a batch; per device count d, a batch of
    `base * d` items runs so per-device work is constant (weak scaling, the
    regime of BASELINE.md's ≥85% target). Returns {devices: throughput}.
    """
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(all_devices)]
    base = None
    results = {}
    for d in device_counts:
        mesh = make_mesh(all_devices[:d], axis_name)
        batch = make_batch(d)
        if base is None:
            base = jax.tree_util.tree_leaves(batch)[0].shape[0] // d or 1
        batch = shard_batch(batch, mesh, axis_name)
        jfn = jax.jit(fn)
        out = jfn(batch)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        n_items = jax.tree_util.tree_leaves(batch)[0].shape[0]
        results[d] = n_items / dt
    if 1 in results:
        results["efficiency"] = {
            d: results[d] / (d * results[1]) for d in device_counts if d != 1
        }
    return results
