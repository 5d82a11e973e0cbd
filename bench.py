"""Headline benchmark: batched soft-body rollout throughput on one chip.

Workload: BASELINE.json config — many concurrent 10-voxel-cube (10x10x10
bounding box) rollouts with thermal actuation, floor contact and gravity, the
same physics the reference runs one-process-per-robot on CPU
(reference: voxelyzeMain/main.cpp:89-131). Metric = occupied-voxel timesteps
per second per chip.

Baseline: the reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against the reference C++ engine's single-core throughput on this
machine when available (tools/bench_reference.py writes
/tmp/evosoro_ref_bench.json), else a conservative literature-informed estimate
of Voxelyze at ~1e6 voxel-steps/s/core for this workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
    from evosoro_tpu.core.rollout import init_state
    from evosoro_tpu.core.step import sim_step
    from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette

    # --- workload: batch of 10^3 bounding-box robots ---
    on_tpu = jax.devices()[0].platform == "tpu"
    BATCH = 1024 if on_tpu else 16
    N = 10
    STEPS = 200 if on_tpu else 20

    rng = np.random.default_rng(0)
    structure = rng.integers(1, 5, size=(N, N, N)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(N, N, N))
    palette = palette_from_list(evosoro_default_palette())
    body = build_body(structure, palette, phase_offset=phase)
    sim = SimParams()
    env = EnvParams()
    dt = calc_max_dt(body) * sim.dt_frac

    state = init_state(body)
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), state
    )

    # the fused multi-step Pallas kernel (ops/fused_rollout.py) keeps the
    # whole rollout state VMEM-resident — the production path on TPU
    # (5.7x the jnp scan on this workload). The jnp scan remains the
    # reference/general path and the CPU fallback.
    from evosoro_tpu.ops.fused_rollout import fused_rollout, supports

    use_fused = on_tpu and supports(body, sim, env)

    if use_fused:
        def run(state_batch):
            out, _ = fused_rollout(
                state_batch, body, sim, env, num_steps=STEPS, dt=dt
            )
            return out
    else:
        @jax.jit
        def run(state_batch):
            def one(s):
                def step(s, _):
                    return sim_step(s, body, sim, env, dt), ()

                s, _ = jax.lax.scan(step, s, None, length=STEPS)
                return s

            return jax.vmap(one)(state_batch)

    # warmup/compile
    out = run(batched)
    jax.block_until_ready(out)

    # best of several timing groups: the axon RPC tunnel adds jittery
    # per-launch latency (~±6% observed) that a locally-attached chip
    # doesn't have
    groups = []
    for _ in range(4):
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(batched)
        jax.block_until_ready(out)
        groups.append((time.perf_counter() - t0) / reps)
    elapsed = min(groups)
    elapsed_mean = sum(groups) / len(groups)

    n_occupied = int(np.sum(np.asarray(structure) > 0))
    voxel_steps = BATCH * n_occupied * STEPS
    vs_per_sec = voxel_steps / elapsed
    vs_per_sec_mean = voxel_steps / elapsed_mean

    # --- baseline: measured reference C++ throughput ---
    # freshly measured record first (tools/reference_engine.py writes it),
    # then the committed measurement of this exact 10^3 workload on the
    # bench host (383,704 voxel-steps/s single-core), then a literature
    # estimate as last resort.
    baseline = 1.0e6  # voxel-steps/s, single-core Voxelyze estimate
    here = os.path.dirname(os.path.abspath(__file__))
    for ref_path in ("/tmp/evosoro_ref_bench.json",
                     os.path.join(here, "tools", "ref_bench_record.json")):
        if os.path.exists(ref_path):
            try:
                with open(ref_path) as f:
                    baseline = float(json.load(f)["voxel_steps_per_sec"])
                break
            except Exception:
                pass

    print(
        json.dumps(
            {
                "metric": "voxel_steps_per_sec_per_chip",
                "value": round(vs_per_sec, 1),
                "unit": "voxel-steps/s",
                "vs_baseline": round(vs_per_sec / baseline, 3),
                # methodology: value = best of 4 groups of 3 reps (the RPC
                # tunnel adds ~±6% per-launch jitter); mean recorded too so
                # rounds stay comparable
                "value_mean": round(vs_per_sec_mean, 1),
                "timing": "best_of_4_groups_of_3",
            }
        )
    )


if __name__ == "__main__":
    main()
