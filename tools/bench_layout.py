"""Compare rollout-batch layouts on the real chip: batch-leading (vmap axis 0)
vs batch-minor (vmap axis -1).

TPU vector layout maps the last two array dims to (sublane, lane) = (8, 128).
Batch-leading leaves xyz/quat components (3- or 4-wide) in the lane dim —
>30x lane padding waste. Batch-minor puts the 1024-wide rollout batch in the
lane dim so every elementwise op runs at full VPU width; the 3D stencil rolls
ride the cheap major dims. This experiment picks the production layout for
bench.py / the evaluator.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette


def make(batch_axis: int, BATCH: int, N: int):
    rng = np.random.default_rng(0)
    structure = rng.integers(1, 5, size=(N, N, N)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(N, N, N))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sim = SimParams()
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac
    state = init_state(body)
    if batch_axis == 0:
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), state
        )
    else:
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[..., None], x.shape + (BATCH,)), state
        )
    n_occ = int(np.sum(np.asarray(structure) > 0))
    return batched, body, sim, env, dt, n_occ


def bench_axis(batch_axis: int, BATCH=1024, N=10, STEPS=200, reps=3):
    batched, body, sim, env, dt, n_occ = make(batch_axis, BATCH, N)

    @jax.jit
    def run(state_batch):
        def one(s):
            def step(s, _):
                return sim_step(s, body, sim, env, dt), ()

            s, _ = jax.lax.scan(step, s, None, length=STEPS)
            return s

        return jax.vmap(one, in_axes=batch_axis, out_axes=batch_axis)(state_batch)

    out = run(batched)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(batched)
    jax.block_until_ready(out)
    dt_wall = (time.perf_counter() - t0) / reps
    vs = BATCH * n_occ * STEPS / dt_wall
    return vs


if __name__ == "__main__":
    for ax, nm in ((0, "batch-leading"), (-1, "batch-minor")):
        vs = bench_axis(ax)
        print(f"{nm:>14}: {vs:,.0f} voxel-steps/s")
