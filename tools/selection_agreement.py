"""Population-scale fused-vs-jnp selection agreement (VERDICT r4 weak #7).

The fused kernel tracks the jnp stencil to ~5e-5 m/100 steps on chaotic
scenarios (ONCHIP_PARITY.json); at production horizons the two paths are
different trajectories entirely. What matters for evolution is whether
SELECTION survives: this driver evaluates the SAME population of
evolved-shape walkers on both on-chip paths at the full production horizon
and records fitness rank agreement (Spearman/Kendall, top-k overlap) to
SELECTAGREE.json — the DRAGDIV.json template applied to kernel drift.

Run:  PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
      python tools/selection_agreement.py [--pop 32] [--size 10] [--time 5.0]
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _rank(a):
    order = np.argsort(np.argsort(a))
    return order.astype(np.float64)


def spearman(a, b):
    ra, rb = _rank(a), _rank(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else 1.0

def kendall(a, b):
    n = len(a)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = np.sign(a[i] - a[j]) * np.sign(b[i] - b[j])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    tot = n * (n - 1) // 2
    return float((conc - disc) / tot) if tot else 1.0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--pop", type=int, default=32)
    ap.add_argument("--size", type=int, default=10)
    ap.add_argument("--time", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--no-collision", action="store_true")
    ap.add_argument("--jnp-chunk", type=int, default=8,
                    help="dispatch the jnp arm in slices of this many "
                         "individuals (0 = one launch); keeps each device "
                         "launch inside the axon tunnel's budget")
    args = ap.parse_args()

    import jax

    assert jax.devices()[0].platform == "tpu", "run on the real chip"

    from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
    from evosoro_tpu.evo.evaluation import evaluate_all
    from evosoro_tpu.evo.networks import CPPN
    from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
    from evosoro_tpu.utils.phenotype_mappers import make_material_tree

    size = (args.size, args.size, args.size)

    class _Genotype(Genotype):
        def __init__(self):
            super().__init__(orig_size_xyz=size)
            self.add_network(CPPN(output_node_names=[
                "shape", "muscleOrTissue", "muscleType", "tissueType"]))
            self.to_phenotype_mapping.add_map(
                name="material", tag="<Data>", func=make_material_tree,
                dependency_order=["shape", "muscleOrTissue", "muscleType",
                                  "tissueType"], output_type=int)
            self.to_phenotype_mapping.add_output_dependency(
                name="shape", dependency_name=None, requirement=None,
                material_if_true=None, material_if_false="0")
            self.to_phenotype_mapping.add_output_dependency(
                name="muscleOrTissue", dependency_name="shape",
                requirement=True, material_if_true=None,
                material_if_false=None)
            self.to_phenotype_mapping.add_output_dependency(
                name="tissueType", dependency_name="muscleOrTissue",
                requirement=False, material_if_true="1",
                material_if_false="2")
            self.to_phenotype_mapping.add_output_dependency(
                name="muscleType", dependency_name="muscleOrTissue",
                requirement=True, material_if_true="3",
                material_if_false="4")

    class _Phenotype(Phenotype):
        def is_valid(self):
            for name, details in self.genotype.to_phenotype_mapping.items():
                if np.isnan(details["state"]).any():
                    return False
                if name == "material":
                    state = details["state"]
                    if np.sum(state > 0) < 20:
                        return False
                    if np.sum((state == 3) | (state == 4)) < 8:
                        return False
            return True

    def make_pop():
        random.seed(args.seed)
        np.random.seed(args.seed)
        objectives = ObjectiveDict()
        objectives.add_objective(name="fitness", maximize=True,
                                 tag="<NormFinalDist>")
        objectives.add_objective(name="age", maximize=False, tag=None)
        return Population(objectives, _Genotype, _Phenotype,
                          pop_size=args.pop)

    sim = Sim(dt_frac=0.9, simulation_time=args.time,
              fitness_eval_init_time=0.4)
    if args.no_collision:
        sim.self_collisions_enabled = 0
    env = Env(time_between_traces=0)

    import time as _time

    fits = {}
    wall = {}
    for mode in ("1", "0"):  # fused first (faster compile feedback)
        os.environ["EVOSORO_TPU_FUSED_EVAL"] = mode
        pop = make_pop()
        pop.already_evaluated = {}
        t0 = _time.time()
        if mode == "0" and args.jnp_chunk > 0:
            # the jnp scan path with collision at the full horizon in ONE
            # 32-wide launch overruns the axon tunnel's per-launch budget
            # (observed: TPU worker restart mid-execution); dispatch it in
            # short slices — same program per slice, same physics
            from evosoro_tpu.evo.evaluation import _dispatch_batch
            from evosoro_tpu.evo.logging import PrintLog

            plog = PrintLog()
            inds = [i for i in pop if i.phenotype.is_valid()]
            for i in pop:
                if not i.phenotype.is_valid():
                    for rank, goal in pop.objective_dict.items():
                        if goal["name"] != "age":
                            setattr(i, goal["name"], goal["worst_value"])
            for s in range(0, len(inds), args.jnp_chunk):
                _dispatch_batch(sim, env, pop,
                                inds[s:s + args.jnp_chunk], plog)
        else:
            evaluate_all(sim, env, pop)
        wall[mode] = _time.time() - t0
        fits[mode] = np.array([ind.fitness for ind in pop])
        print(f"mode={'fused' if mode == '1' else 'jnp'} "
              f"wall={wall[mode]:.1f}s fitness={fits[mode]}")

    valid = np.isfinite(fits["1"]) & np.isfinite(fits["0"]) \
        & (fits["1"] != -np.inf) & (fits["0"] != -np.inf)
    a, b = fits["1"][valid], fits["0"][valid]
    order_a = np.argsort(-a)
    order_b = np.argsort(-b)
    topk = {}
    for k in (4, 8):
        topk[str(k)] = int(len(set(order_a[:k]) & set(order_b[:k])))
    out = {
        "metric": "fused_vs_jnp_selection_agreement",
        "pop": args.pop,
        "valid": int(valid.sum()),
        "grid": list(size),
        "sim_time_s": args.time,
        "self_collision": not args.no_collision,
        "steps_approx": int(args.time / 6.4e-5),
        "spearman": spearman(a, b),
        "kendall": kendall(a, b),
        "top_k_overlap": topk,
        "max_abs_fitness_delta": float(np.abs(a - b).max()),
        "mean_abs_fitness_delta": float(np.abs(a - b).mean()),
        "fitness_scale": float(np.abs(a).max()),
        "wall_s": {"fused": wall["1"], "jnp": wall["0"]},
        "fitness_fused": a.tolist(),
        "fitness_jnp": b.tolist(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SELECTAGREE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("written", path)
    print(json.dumps({k: out[k] for k in
                      ("spearman", "kendall", "top_k_overlap")}))


if __name__ == "__main__":
    main()
