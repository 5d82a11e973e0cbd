"""Continuous-trait evolution on land: phase offsets, stiffness, frequency.

TPU-native equivalent of the reference's land_continuous experiment
(reference: examples/land_continuous.py): two CPPNs evolve (a) per-voxel
actuation phase offsets plus a global actuation frequency expressed as an
Env override (env_kws), and (b) morphology plus a continuous per-voxel
stiffness that overrides the palette elastic modulus (the land_water fork's
per-voxel E capability, reference: VX_Object.cpp:1474).

Run:  python examples/land_continuous.py [--gens N] [--pop N] [--cpu]
"""

import argparse
import math
import random
from functools import partial

import numpy as np

import _bootstrap  # noqa: F401

from evosoro_tpu.evo.algorithms import ParetoOptimization
from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
from evosoro_tpu.evo.networks import CPPN
from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
from evosoro_tpu.utils.functional import (
    count_occurrences,
    rescaled_positive_sigmoid,
)
from evosoro_tpu.utils.phenotype_mappers import make_material_tree

IND_SIZE = (6, 6, 5)
SIM_TIME = 5.0
INIT_TIME = 1.0
DT_FRAC = 0.9
MIN_ELASTIC_MOD = 0.01e6
MAX_ELASTIC_MOD = 1e6
MAX_FREQUENCY = 4.0
SEED = 1


def frequency_func(x):
    """Global frequency from the CPPN's per-voxel output
    (reference: examples/land_continuous.py:69-70)."""
    return MAX_FREQUENCY * 2.5 / (np.mean(1 / x) + 1.5)


class MyGenotype(Genotype):
    def __init__(self):
        super().__init__(orig_size_xyz=IND_SIZE)
        self.add_network(CPPN(output_node_names=["phase_offset", "frequency"]))
        self.to_phenotype_mapping.add_map(
            name="phase_offset", tag="<PhaseOffset>",
            func=partial(rescaled_positive_sigmoid, x_min=0,
                         x_max=2 * math.pi),
        )
        self.to_phenotype_mapping.add_map(
            name="frequency", tag="<TempPeriod>",
            env_kws={"frequency": frequency_func},
        )
        self.add_network(
            CPPN(output_node_names=["shape", "muscleOrTissue", "stiffness"])
        )
        self.to_phenotype_mapping.add_map(
            name="stiffness", tag="<Stiffness>",
            func=partial(rescaled_positive_sigmoid, x_min=MIN_ELASTIC_MOD,
                         x_max=MAX_ELASTIC_MOD),
            params=[MIN_ELASTIC_MOD, MAX_ELASTIC_MOD],
            param_tags=["MinElasticMod", "MaxElasticMod"],
        )
        self.to_phenotype_mapping.add_map(
            name="material", tag="<Data>", func=make_material_tree,
            dependency_order=["shape", "muscleOrTissue"], output_type=int,
        )
        self.to_phenotype_mapping.add_output_dependency(
            name="shape", dependency_name=None, requirement=None,
            material_if_true=None, material_if_false="0")
        self.to_phenotype_mapping.add_output_dependency(
            name="muscleOrTissue", dependency_name="shape", requirement=True,
            material_if_true="3", material_if_false="1")


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
                if count_occurrences(state, [3, 4]) < n * min_percent_muscle:
                    return False
        return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=3)
    ap.add_argument("--pop", type=int, default=8)
    ap.add_argument("--dir", default="land_continuous_data")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    random.seed(SEED)
    np.random.seed(SEED)

    my_sim = Sim(dt_frac=DT_FRAC, simulation_time=SIM_TIME,
                 fitness_eval_init_time=INIT_TIME)
    my_env = Env(sticky_floor=0, time_between_traces=0)

    objectives = ObjectiveDict()
    objectives.add_objective(name="fitness", maximize=True,
                             tag="<normAbsoluteDisplacement>")
    objectives.add_objective(name="age", maximize=False, tag=None)
    objectives.add_objective(
        name="num_voxels", maximize=False, tag=None,
        node_func=np.count_nonzero, output_node_name="material")
    objectives.add_objective(
        name="energy", maximize=False, tag=None,
        node_func=partial(count_occurrences, keys=[3, 4]),
        output_node_name="material")

    pop = Population(objectives, MyGenotype, MyPhenotype, pop_size=args.pop)
    optimizer = ParetoOptimization(my_sim, my_env, pop)
    optimizer.run(max_hours_runtime=1, max_gens=args.gens,
                  num_random_individuals=1, directory=args.dir,
                  name="LandContinuous", checkpoint_every=2, save_vxa_every=2)
    best = max(pop, key=lambda ind: ind.fitness)
    print(f"best fitness after {args.gens} gens: {best.fitness:.4f}")


if __name__ == "__main__":
    main()
