"""FALLBACK.json: make the fused-vs-jnp evaluator cliff visible
(VERDICT r4 weak #5), and record that two of the three former fallback
configs now run FUSED (r5):

- deformed-mesh facet drag (fluid): in-kernel corner-lattice stencil vs
  the jnp gather/scatter path it used to fall back to
- MDL_DATA point-table palettes: per-individual streamed side tables vs
  the jnp path
- the one REMAINING fallback: self-collision bodies above 1024 lanes
  (per-individual dense pair fields outgrow VMEM) — jnp throughput
  recorded so the cliff height is known

Run:  PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
      python tools/bench_fallback.py
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

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state, rollout
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import (
    MDL_DATA,
    EnvParams,
    Material,
    SimParams,
    evosoro_default_palette,
)
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


def _jnp_run(body, sim, env, batched, dt, steps):
    def one(s):
        def step(s, _):
            return sim_step(s, body, sim, env, dt), ()
        s, _ = jax.lax.scan(step, s, None, length=steps)
        return s

    f = jax.jit(jax.vmap(one))
    return _time(lambda b: f(b).pos, batched)


def mesh_drag_cliff(batch=128, n=10, steps=200):
    from evosoro_tpu.envs.drag import attach_mesh_drag

    rng = np.random.default_rng(0)
    s = np.zeros((n + 1, n + 1, n + 1), dtype=np.int32)
    s[:n, :n, :n] = rng.integers(1, 5, size=(n, n, n))
    phase = rng.uniform(-1, 1, size=s.shape)
    body = attach_mesh_drag(build_body(
        s, palette_from_list(evosoro_default_palette()),
        phase_offset=phase))
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(fluid_environment=True, gravity_enabled=False,
                    floor_enabled=False, aggregate_drag_coefficient=375.0)
    assert supports(body, sim, env)
    dt = calc_max_dt(body) * sim.dt_frac
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)
    n_occ = int((s > 0).sum())

    def run_fused(b):
        out, _ = fused_rollout(b, body, sim, env, num_steps=steps, dt=dt)
        return out.pos

    t_fused = _time(run_fused, batched)
    t_jnp = _jnp_run(body, sim, env, batched, dt, steps)
    # voxel-face approximation for context (the cheap in-kernel model)
    body_nm = body.replace(mesh_drag=None)

    def run_face(b):
        out, _ = fused_rollout(b, body_nm, sim, env, num_steps=steps, dt=dt)
        return out.pos

    t_face = _time(run_face, batched)
    vs = batch * n_occ * steps
    return dict(
        batch=batch, occupied=n_occ, steps=steps,
        grid=[n + 1, n + 1, n + 1],
        fused_mesh_voxel_steps_per_sec=vs / t_fused,
        jnp_mesh_voxel_steps_per_sec=vs / t_jnp,
        fused_voxel_face_voxel_steps_per_sec=vs / t_face,
        fused_over_jnp_x=t_jnp / t_fused,
        mesh_over_face_cost_x=t_fused / t_face,
    )


def mdl_data_cliff(batch=128, n=10, steps=200):
    mats = [
        Material(1, "Data_Soft", mat_model=MDL_DATA, cte=0.0,
                 ss_strain=(0.0, 0.001, 0.05, 0.5),
                 ss_stress=(0.0, 5e3, 2e5, 8e5)),
        Material(2, "Data_Hard", mat_model=MDL_DATA, cte=0.0,
                 ss_strain=(0.0, 0.001, 0.05, 0.5),
                 ss_stress=(0.0, 5e5, 2e6, 8e6)),
        Material(3, "Data_Active_+", mat_model=MDL_DATA, cte=0.01,
                 ss_strain=(0.0, 0.002, 0.1),
                 ss_stress=(0.0, 1e4, 4e5)),
        Material(4, "Data_Active_-", mat_model=MDL_DATA, cte=-0.01,
                 ss_strain=(0.0, 0.002, 0.1),
                 ss_stress=(0.0, 1e4, 4e5)),
    ]
    rng = np.random.default_rng(1)
    s = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=s.shape)
    body = build_body(s, palette_from_list(mats), phase_offset=phase)
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams()
    assert supports(body, sim, env)
    dt = calc_max_dt(body) * sim.dt_frac
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)
    n_occ = int((s > 0).sum())

    def run_fused(b):
        out, _ = fused_rollout(b, body, sim, env, num_steps=steps, dt=dt)
        return out.pos

    t_fused = _time(run_fused, batched)
    t_jnp = _jnp_run(body, sim, env, batched, dt, steps)
    vs = batch * n_occ * steps
    return dict(
        batch=batch, occupied=n_occ, steps=steps,
        fused_voxel_steps_per_sec=vs / t_fused,
        jnp_voxel_steps_per_sec=vs / t_jnp,
        fused_over_jnp_x=t_jnp / t_fused,
    )


def big_collision_fallback(batch=32, n=12, steps=100):
    """>1024-lane self-collision — the cliff r5 closed by narrowing the
    kernel batch block (8 -> 4/2) so per-individual dense pair fields
    stay inside VMEM up to 2048 lanes (evaluation.py _dispatch_batch).
    Measures the evaluator's own fused kernel (per-individual pair
    fields at the narrowed block) against the jnp path it used to fall
    back to."""
    from evosoro_tpu.core.collision import (
        attach_collision_system,
        build_collision_system,
    )
    from evosoro_tpu.evo.evaluation import make_fused_evaluator
    # the ops package re-exports a FUNCTION named fused_rollout, which
    # shadows the submodule on attribute-style imports — go via sys.modules
    import evosoro_tpu.ops.fused_rollout  # noqa: F401
    fr = sys.modules["evosoro_tpu.ops.fused_rollout"]

    rng = np.random.default_rng(2)
    s = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    s[rng.random(s.shape) < 0.3] = 0
    phase = rng.uniform(-1, 1, size=s.shape)
    pal = palette_from_list(evosoro_default_palette())
    body = attach_collision_system(build_body(s, pal, phase_offset=phase))
    sim = SimParams(self_collisions_enabled=True)
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)
    n_occ = int((s > 0).sum())
    t_jnp = _jnp_run(body, sim, env, batched, dt, steps)
    vs = batch * n_occ * steps
    Vp = -(-n ** 3 // 128) * 128
    bb = fr.collision_batch_block(Vp)

    # the evaluator's fused path: per-individual (bb, Vp, Vp) pair blocks
    L = 0.01
    fn = make_fused_evaluator(
        pal, (n, n, n), steps, ("phase_offset",), L, sim, env,
        with_collision=True, batch_block=bb)
    e_vox = np.asarray(pal.elastic_mod)[s]
    colsys = build_collision_system(s, e_vox, L)
    col_packed = jnp.asarray(np.broadcast_to(
        np.asarray(fr.pack_collision(colsys, Vp, (n, n, n))),
        (batch, Vp, Vp)))
    structures = jnp.asarray(np.broadcast_to(s, (batch, n, n, n)))
    phases = jnp.asarray(np.broadcast_to(
        phase.astype(np.float32), (batch, n, n, n)))
    env_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(
            jnp.asarray(x, jnp.float32), (batch,) + np.shape(x)), env)
    stop_time = float(dt) * steps * 2.0

    def run_fused(st, ph, cp):
        return fn(st, {"phase_offset": ph}, None, env_b, stop_time, cp)[
            "norm_final_dist"]

    t_fused = _time(run_fused, structures, phases, col_packed)
    return dict(
        batch=batch, occupied=n_occ, steps=steps, lanes=Vp,
        batch_block=bb,
        fused_voxel_steps_per_sec=vs / t_fused,
        jnp_voxel_steps_per_sec=vs / t_jnp,
        fused_over_jnp_x=t_jnp / t_fused,
        note=("r5: per-individual pair fields above 1024 lanes ride a "
              "NARROWED batch block (4/2/1) instead of leaving the fused "
              "path; >4096 lanes still fall back to jnp"),
    )


def main():
    assert jax.devices()[0].platform == "tpu"
    out = {
        "metric": "evaluator_fallback_cliff",
        "mesh_drag_fluid": mesh_drag_cliff(),
        "mdl_data": mdl_data_cliff(),
        "collision_1792_lanes":
            big_collision_fallback(batch=32, n=12),
        "collision_2304_lanes":
            big_collision_fallback(batch=8, n=13),
        "note": ("r5 closed the mesh-drag, MDL_DATA and big-collision "
                 "fallbacks: all now run in the fused kernel (rows above "
                 "measure the closed cliffs; collision up to 2304 lanes — "
                 "a 13^3 body — via narrowed batch blocks 4/2/1, rungs "
                 "set by on-chip compile probes with double-buffered "
                 "windows). evaluate_all logs a warning whenever a "
                 "generation still leaves the fused path (now only "
                 ">2304-lane collision)."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FALLBACK.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


