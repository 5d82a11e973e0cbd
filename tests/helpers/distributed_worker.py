"""Worker for the multi-process jax.distributed test (one OS process per
"host"). Each process owns 2 virtual CPU devices; the 2-process job forms a
4-device global mesh, shards a rollout batch over it, and process 0 writes
the gathered per-rollout fitness to OUT_PATH.

Invoked by tests/test_distributed.py:
  python distributed_worker.py <coordinator> <num_procs> <proc_id> <out_path>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import jax  # noqa: E402

coordinator, num_procs, proc_id, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

from evosoro_tpu.parallel.mesh import distributed_init  # noqa: E402

distributed_init(coordinator_address=coordinator, num_processes=num_procs,
                 process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from evosoro_tpu.core.materials import (  # noqa: E402
    build_body, calc_max_dt, palette_from_list,
)
from evosoro_tpu.core.rollout import init_state, rollout  # noqa: E402
from evosoro_tpu.core.types import (  # noqa: E402
    EnvParams, SimParams, evosoro_default_palette,
)
from evosoro_tpu.parallel.mesh import make_mesh  # noqa: E402

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs, len(jax.devices())

B, N, STEPS = 8, 3, 10
rng = np.random.default_rng(0)
structure = rng.integers(1, 5, size=(N, N, N)).astype(np.int32)
phases = rng.uniform(-1, 1, size=(B, N, N, N))
body = build_body(structure, palette_from_list(evosoro_default_palette()))
sim = SimParams()
env = EnvParams()
dt = calc_max_dt(body) * sim.dt_frac

mesh = make_mesh()  # all 4 global devices
sharding = NamedSharding(mesh, P("rollout", None, None, None))
# each process feeds its local shard of the globally-identical batch
phases_global = jax.make_array_from_callback(
    phases.shape, sharding, lambda idx: phases[idx]
)


@jax.jit
def run(ph):
    def one(p):
        b = build_body(structure, palette_from_list(evosoro_default_palette()),
                       phase_offset=p)
        st = init_state(b)
        res = rollout(b, sim, env, num_steps=STEPS, dt=dt, state=st)
        return res.final_dist

    return jax.vmap(one)(ph)


out = run(phases_global)
# gather: each process concatenates its addressable shard rows (the 1-D mesh
# orders devices by process, so process-order tiling == global order)
local = np.concatenate([
    np.asarray(s.data)
    for s in sorted(out.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
])
vals = np.asarray(multihost_utils.process_allgather(local, tiled=True))
assert vals.shape == (B,), vals.shape

if proc_id == 0:
    with open(out_path, "w") as f:
        json.dump({"final_dist": [float(v) for v in vals]}, f)
print("worker", proc_id, "done")
