"""EVOBENCH: end-to-end evolution generations/hour on the chip
(VERDICT r4 weak #4).

All committed TPU numbers so far were kernel/solver benches on pre-packed
identical bodies; this driver runs the REAL evolution loop — CPPN mutation,
phenotype mapping, md5 dedup, per-design collision-table builds, one sharded
fused dispatch per generation, Pareto selection — for several generations
and records wall s/gen split into host prep vs device rollout vs
selection/mutation, for two configs:

- basic:  examples/basic.py shape (pop 15, 6^3, 5 s, collision ON —
          the reference default SelfColEnabled=1, base.py:24)
- scaled: pop 1024, 10^3, collision ON (the production-scale config)

Reference economics to beat: one ~60 s OS process PER INDIVIDUAL per
generation (reference tools/evaluation.py:107-119).

Run:  PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
      python tools/evobench.py [--config basic|scaled] [--gens 3]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _build(config: str, pop_size, ind_size, sim_time):
    from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
    from evosoro_tpu.evo.networks import CPPN
    from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
    from evosoro_tpu.utils.functional import count_occurrences
    from evosoro_tpu.utils.phenotype_mappers import make_material_tree

    class MyGenotype(Genotype):
        def __init__(self):
            super().__init__(orig_size_xyz=ind_size)
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

    class MyPhenotype(Phenotype):
        def is_valid(self, min_percent_full=0.3, min_percent_muscle=0.1):
            for name, details in self.genotype.to_phenotype_mapping.items():
                if np.isnan(details["state"]).any():
                    return False
                if name == "material":
                    state = details["state"]
                    n = np.prod(self.genotype.orig_size_xyz)
                    if np.sum(state > 0) < n * min_percent_full:
                        return False
                    if count_occurrences(state, [3, 4]) < n * 0.1:
                        return False
            return True

    sim = Sim(dt_frac=0.9, simulation_time=sim_time,
              fitness_eval_init_time=sim_time / 5.0)
    env = Env(time_between_traces=0)
    objectives = ObjectiveDict()
    objectives.add_objective(name="fitness", maximize=True,
                             tag="<NormFinalDist>")
    objectives.add_objective(name="age", maximize=False, tag=None)
    pop = Population(objectives, MyGenotype, MyPhenotype, pop_size=pop_size)
    return sim, env, pop


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="basic",
                    choices=("basic", "scaled"))
    ap.add_argument("--gens", type=int, default=3)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"

    if args.config == "basic":
        pop_size, ind_size, sim_time = 15, (6, 6, 6), 5.0
    else:
        pop_size, ind_size, sim_time = 1024, (10, 10, 10), 5.0

    random.seed(args.seed)
    np.random.seed(args.seed)
    sim, env, pop = _build(args.config, pop_size, ind_size, sim_time)

    from evosoro_tpu.evo import evaluation as ev
    from evosoro_tpu.evo.algorithms import ParetoOptimization
    from evosoro_tpu.evo.logging import PrintLog

    opt = ParetoOptimization(sim, env, pop)
    pl = PrintLog()

    gens = []
    # generation 0: initial population evaluation
    t0 = time.time()
    ev.evaluate_all(sim, env, pop)
    t_eval = time.time() - t0
    t1 = time.time()
    opt.select(pop)  # gen 0: dominance stats only (algorithms.py run())
    t_sel = time.time() - t1
    gens.append(dict(gen=0, evaluated=len(pop), eval_s=t_eval,
                     select_mutate_s=t_sel, total_s=t_eval + t_sel,
                     dispatch=dict(ev.LAST_DISPATCH_TIMING)))
    print(json.dumps(gens[-1]))

    for g in range(1, args.gens + 1):
        tg = time.time()
        pop.update_ages()
        t_m0 = time.time()
        children = opt.mutate(pop, print_log=pl)
        pop.append(children)
        pop.add_random_individual()
        t_mut = time.time() - t_m0
        t_e0 = time.time()
        ev.evaluate_all(sim, env, pop)
        t_eval = time.time() - t_e0
        n_pool = len(pop)  # pre-trim selection pool (pop + children + random)
        t_s0 = time.time()
        # trim like the library loop does (algorithms.py:209-222) — without
        # the assignment the pool doubles every generation
        pop.individuals = opt.select(pop)
        t_sel = time.time() - t_s0
        gens.append(dict(gen=g, evaluated=n_pool, eval_s=t_eval,
                         mutate_s=t_mut,
                         select_mutate_s=t_sel + t_mut,
                         total_s=time.time() - tg,
                         dispatch=dict(ev.LAST_DISPATCH_TIMING)))
        print(json.dumps(gens[-1]))

    # steady-state = generations after the first two (gen0 + gen1 carry the
    # jit compiles); fall back to the last generation
    steady = gens[2:] or gens[-1:]
    mean_total = float(np.mean([g["total_s"] for g in steady]))
    mean_dev = float(np.mean([g["dispatch"].get("device_s", 0.0)
                              for g in steady]))
    mean_host = float(np.mean([g["dispatch"].get("host_prep_s", 0.0)
                               for g in steady]))
    out = dict(
        metric="evolution_generations_per_hour",
        config=args.config,
        pop=pop_size, grid=list(ind_size), sim_time_s=sim_time,
        self_collision=True,
        on_tpu=on_tpu,
        gens=gens,
        steady_state=dict(
            s_per_gen=mean_total,
            generations_per_hour=3600.0 / mean_total if mean_total else 0.0,
            device_s=mean_dev,
            host_prep_s=mean_host,
            host_prep_frac=mean_host / mean_total if mean_total else 0.0,
            other_s=mean_total - mean_dev - mean_host,
        ),
        # the reference evaluates ONE individual per ~sim-wall-time OS
        # process (60 s budget/individual, tools/evaluation.py:107-119)
        reference_s_per_gen_estimate=pop_size * 60.0,
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVOBENCH.json")
    # keep both configs in one artifact
    existing = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    existing[args.config] = out
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print("written", path)
    print(json.dumps(out["steady_state"]))


if __name__ == "__main__":
    main()
