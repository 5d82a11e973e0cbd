"""Self-collision cost benchmark (VERDICT r2 missing #2 / weak #6).

Measures on the real chip:
- fused-kernel throughput on the headline 10^3 workload WITH self-collision
  enabled (dense Vp x Vp pair field, MXU contraction) vs without
- the jnp path's masked S x S collision cost for growing surface counts
  (the O(S^2) superset-of-candidates table, core/collision.py)

Writes COLLBENCH.json at the repo root.

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      PALLAS_AXON_REMOTE_COMPILE=1 python tools/bench_collision.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.collision import attach_collision_system
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.ops.fused_rollout import fused_rollout, supports


def _time(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def fused_with_collisions(batch=256, n=10, steps=200):
    rng = np.random.default_rng(0)
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    # porous so a real surface + legitimate cross-gap contacts exist
    structure[rng.random(structure.shape) < 0.3] = 0
    structure[n // 2, n // 2, n // 2] = 1
    phase = rng.uniform(-1, 1, size=(n, n, n))
    body = build_body(structure, palette_from_list(evosoro_default_palette()),
                      phase_offset=phase)
    sim = SimParams()
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state
    )
    n_occ = int((structure > 0).sum())

    def run(b, s):
        out, _ = fused_rollout(batched, b, s, env, num_steps=steps, dt=dt)
        return out.pos

    # the collision-free run is ~10x shorter per call, so chip-sharing
    # jitter dominates mean timings — take the best of many more reps
    t_plain = _time(run, body, sim, reps=10)
    body_c = attach_collision_system(body)
    sim_c = sim.replace(self_collisions_enabled=True)
    assert supports(body_c, sim_c, env)
    os.environ.pop("EVOSORO_TPU_COLL_COMPACT", None)
    t_coll = _time(run, body_c, sim_c)
    # r5: surface-compacted pair pass (one-hot MXU gather to Sp lanes)
    os.environ["EVOSORO_TPU_COLL_COMPACT"] = "1"
    t_compact = _time(run, body_c, sim_c)
    os.environ.pop("EVOSORO_TPU_COLL_COMPACT", None)
    S = int(np.asarray(body_c.collision.surf_mask).sum())
    return {
        "batch": batch, "grid": n, "steps": steps, "occupied": n_occ,
        "surface_voxels": S,
        "voxel_steps_per_sec_plain": batch * n_occ * steps / t_plain,
        "voxel_steps_per_sec_with_collision": batch * n_occ * steps / t_coll,
        "voxel_steps_per_sec_with_collision_compact":
            batch * n_occ * steps / t_compact,
        "collision_overhead_x": t_coll / t_plain,
        "collision_compact_overhead_x": t_compact / t_plain,
        "compact_speedup_x": t_coll / t_compact,
    }


def jnp_collision_scaling():
    """Per-step cost of the masked S x S contact pass alone vs surface size
    (jnp path; quantifies the no-spatial-culling bound)."""
    from evosoro_tpu.core.collision import collision_forces

    rows = {}
    for n in (6, 8, 10, 14):
        structure = np.zeros((n, n, n), dtype=np.int32)
        structure[:, :, :] = 1
        structure[1:-1, 1:-1, 1:-1] = 0  # hollow shell → maximal surface
        body = attach_collision_system(build_body(
            structure, palette_from_list(evosoro_default_palette())))
        st = init_state(body)
        f = jax.jit(lambda p, s: collision_forces(p, s, body.collision))
        t = _time(f, st.pos, st.scale, reps=10)
        S = int(np.asarray(body.collision.surf_mask).sum())
        rows[S] = t
    return {str(k): v for k, v in rows.items()}


def main():
    assert jax.devices()[0].platform == "tpu"
    out = {
        "metric": "collision_bench",
        "fused": fused_with_collisions(),
        "jnp_pairwise_pass_seconds_by_surface_count": jnp_collision_scaling(),
        "note": ("the masked S x S pass is a physics-identical superset of "
                 "the reference's lazily-rebuilt candidate list; at evosoro "
                 "scales (S <= ~600) it is dense VPU work. Costs grow O(S^2) "
                 "— spatial culling would only matter beyond ~10^4 surface "
                 "voxels, far above any reference workload. r4: in-kernel "
                 "mag switched to the rsqrt form (one transcendental vs "
                 "sqrt+div) for ~1.3x; AABB-culled 128-lane tile evaluation "
                 "was prototyped 3 ways and MEASURED SLOWER than dense on "
                 "this workload (tile ops run at ~half dense's per-element "
                 "rate, each pl.when + scalar VMEM read costs ~0.5us, and "
                 "the porous 10^3 body keeps 15/36 tiles hot with ~100 "
                 "permanent rest contacts) — see _pair_contact_forces "
                 "docstring for the numbers. r5: the surface-compacted "
                 "one-hot MXU gather/scatter pass (verdict weak #3's "
                 "untried idea) also MEASURED SLOWER (compact_speedup_x "
                 "row): two HIGHEST-precision MXU passes per step cost "
                 "more than the 1.8x saved pair elements at Sp/Vp=0.75; "
                 "it stays an opt-in (EVOSORO_TPU_COLL_COMPACT=1) and the "
                 "dense pass stays the default."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COLLBENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
