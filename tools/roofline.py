"""Roofline / MFU accounting for the fused rollout kernel (BASELINE.json
"kernels at speed-of-light per chip").

Three measurements, one JSON line:

1. **flops_per_voxel_step** — static op count of one physics step, from a
   jaxpr walk of `core.step.sim_step` on the bench body (the fused kernel
   replicates the same math op-for-op; ops on non-occupied padded lanes are
   counted too, because the hardware executes them). Elementwise ops count 1
   flop/element, FMA-able pairs are NOT fused (conservative: overcounts
   peak-achievable fraction never), transcendentals (sin/cos/sqrt/div)
   reported separately since they retire at lower rate than adds/muls.
2. **vpu_peak_flops** — measured, not quoted: a Pallas micro-kernel of 8
   independent FMA chains on full (8,128) tiles, timed on the chip. This is
   the empirical VPU speed-of-light for f32 multiply-add throughput.
3. **achieved** — the headline bench workload (1024 robots x 10^3 bounding
   box x 200 steps through the fused kernel), voxel-steps/s x
   flops-per-voxel-step = achieved flops/s.

fraction_of_vpu_peak = achieved / peak. The kernel is VPU-bound (its only
MXU work is the optional collision contraction), so the VPU peak is the
right speed-of-light denominator.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
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

# ---------------------------------------------------------------------------
# 1. static flop count of one step
# ---------------------------------------------------------------------------

_ELEMENTWISE_1 = {
    "add", "sub", "mul", "max", "min", "neg", "abs", "and", "or", "not",
    "xor", "select_n", "ge", "gt", "le", "lt", "eq", "ne", "floor",
    "round", "sign", "clamp", "integer_pow",
}
_TRANSCENDENTAL = {"div", "sqrt", "rsqrt", "sin", "cos", "tan", "exp",
                   "log", "pow", "atan2", "acos", "asin", "logistic"}


def _count_jaxpr(jaxpr, counts):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        for sub in (v for v in eqn.params.values()):
            pass
        if prim in ("pjit", "custom_jvp_call", "custom_vjp_call",
                    "closed_call", "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                _count_jaxpr(getattr(inner, "jaxpr", inner), counts)
            continue
        if prim == "scan":
            inner = eqn.params["jaxpr"]
            n = eqn.params["length"]
            sub_counts = {"ew": 0, "trans": 0, "red": 0, "dot": 0}
            _count_jaxpr(inner.jaxpr, sub_counts)
            for k in counts:
                counts[k] += n * sub_counts[k]
            continue
        if prim == "while":
            inner = eqn.params["body_jaxpr"]
            _count_jaxpr(inner.jaxpr, counts)  # one iteration (lower bound)
            continue
        out_elems = sum(
            int(np.prod(v.aval.shape)) for v in eqn.outvars
            if hasattr(v.aval, "shape")
        )
        if prim in _ELEMENTWISE_1:
            counts["ew"] += out_elems
        elif prim in _TRANSCENDENTAL:
            counts["trans"] += out_elems
        elif prim in ("reduce_sum", "reduce_max", "reduce_min", "reduce_and",
                      "reduce_or", "argmax", "argmin"):
            in_elems = int(np.prod(eqn.invars[0].aval.shape))
            counts["red"] += in_elems
        elif prim == "dot_general":
            a = eqn.invars[0].aval.shape
            b = eqn.invars[1].aval.shape
            counts["dot"] += 2 * int(np.prod(a)) * int(
                np.prod(b)) // max(
                int(np.prod(eqn.params["dimension_numbers"][0][0] and [
                    a[d] for d in eqn.params["dimension_numbers"][0][0]
                ] or [1])), 1)


def count_step_flops(n=10, seed=0):
    from evosoro_tpu.core.materials import (
        build_body, calc_max_dt, palette_from_list,
    )
    from evosoro_tpu.core.rollout import init_state
    from evosoro_tpu.core.step import sim_step
    from evosoro_tpu.core.types import (
        EnvParams, SimParams, evosoro_default_palette,
    )

    rng = np.random.default_rng(seed)
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
    phase = rng.uniform(-1, 1, size=(n, n, n))
    body = build_body(structure, palette_from_list(evosoro_default_palette()),
                      phase_offset=phase)
    sim = SimParams()
    env = EnvParams()
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    state = init_state(body)
    jaxpr = jax.make_jaxpr(lambda s: sim_step(s, body, sim, env, dt))(state)
    counts = {"ew": 0, "trans": 0, "red": 0, "dot": 0}
    _count_jaxpr(jaxpr.jaxpr, counts)
    V = int(np.prod(structure.shape))
    n_occ = int((structure > 0).sum())
    total = sum(counts.values())
    return {
        "grid_voxels": V,
        "occupied_voxels": n_occ,
        "flops_per_step_total": total,
        "flops_per_grid_voxel_step": total / V,
        "flops_per_occupied_voxel_step": total / n_occ,
        "breakdown": counts,
    }


# ---------------------------------------------------------------------------
# 2. measured VPU peak (f32 FMA micro-kernel)
# ---------------------------------------------------------------------------

def measure_vpu_peak(iters=20000, rows=8, cols=256, grid=4096):
    """Empirical f32 multiply-add speed-of-light: 16 independent FMA chains
    on native-tile-sized arrays small enough to stay register/VMEM-resident
    (large per-chain blocks turn the loop bandwidth-bound and measure VMEM,
    not the ALUs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHAINS = 16

    def kernel(x_ref, o_ref):
        x = x_ref[:, :]
        accs = [x * (1.0 + 1e-7 * k) for k in range(CHAINS)]
        a = 1.0000001
        b = 1e-9

        def body(i, accs):
            return tuple(acc * a + b for acc in accs)

        accs = jax.lax.fori_loop(0, iters, body, tuple(accs))
        out = accs[0]
        for acc in accs[1:]:
            out = out + acc
        o_ref[:, :] = out

    x = jnp.ones((rows, cols), jnp.float32)
    spec = pl.BlockSpec((rows, cols), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(grid,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
    )(x))
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = f(x)
    jax.block_until_ready(out)
    dt_s = (time.perf_counter() - t0) / reps
    flops = 2.0 * rows * cols * CHAINS * iters * grid  # FMA = 2 flops
    return flops / dt_s


# ---------------------------------------------------------------------------
# 3. achieved
# ---------------------------------------------------------------------------

def measure_achieved(n=10, batch=1024, steps=200, seed=0):
    from evosoro_tpu.core.materials import (
        build_body, calc_max_dt, palette_from_list,
    )
    from evosoro_tpu.core.rollout import init_state
    from evosoro_tpu.core.types import (
        EnvParams, SimParams, evosoro_default_palette,
    )
    from evosoro_tpu.ops.fused_rollout import fused_rollout

    rng = np.random.default_rng(seed)
    structure = rng.integers(1, 5, size=(n, n, n)).astype(np.int32)
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
    out, _ = fused_rollout(batched, body, sim, env, num_steps=steps, dt=dt)
    jax.block_until_ready(out.pos)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out, _ = fused_rollout(batched, body, sim, env, num_steps=steps,
                               dt=dt)
    jax.block_until_ready(out.pos)
    elapsed = (time.perf_counter() - t0) / reps
    n_occ = int((structure > 0).sum())
    V = int(np.prod(structure.shape))
    return {
        "occupied_voxel_steps_per_sec": batch * n_occ * steps / elapsed,
        "grid_voxel_steps_per_sec": batch * V * steps / elapsed,
    }


def main():
    on_tpu = jax.devices()[0].platform == "tpu"
    flops = count_step_flops()
    out = {"metric": "fused_kernel_roofline", "flop_count": flops}
    if on_tpu:
        peak = measure_vpu_peak()
        ach = measure_achieved()
        achieved_flops = (
            ach["grid_voxel_steps_per_sec"]
            * flops["flops_per_grid_voxel_step"]
        )
        out.update(
            vpu_peak_flops_measured=peak,
            achieved=ach,
            achieved_flops_per_sec=achieved_flops,
            fraction_of_vpu_peak=achieved_flops / peak,
        )
    else:
        out["note"] = "not on TPU: only the static flop count is produced"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
