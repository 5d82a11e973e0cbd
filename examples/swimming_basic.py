"""Aquatic locomotion: evolve swimmer morphologies under facet drag.

TPU-native equivalent of the reference's swimming experiment
(reference: examples/swimming_basic.py, built on the land_water engine fork):
a fluid environment disables gravity and floor (neutral buoyancy) and applies
quadratic drag on exposed surfaces (reference: land_water VX_Sim.cpp:1516-1600);
the same CPPN material tree as basic.py evolves body plans that swim.
The evaluator simulates the parity-validated deformed-mesh facet drag by
default; pass Env(drag_model='voxel_face') for the ~10x-faster fused-kernel
face approximation (DRAGDIV.json quantifies the difference).

Run:  python examples/swimming_basic.py [--gens N] [--pop N] [--cpu]
"""

import argparse
import random
from functools import partial

import numpy as np

import _bootstrap  # noqa: F401

from evosoro_tpu.evo.algorithms import ParetoOptimization
from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
from evosoro_tpu.evo.networks import CPPN
from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
from evosoro_tpu.utils.functional import count_occurrences
from evosoro_tpu.utils.phenotype_mappers import make_material_tree

IND_SIZE = (6, 6, 6)
SIM_TIME = 5.0
INIT_TIME = 1.0
DT_FRAC = 0.9
# drag = 0.5 * C_drag * rho_water (reference: examples/swimming_basic.py:69-70)
AGGREGATE_DRAG_COEF = 0.5 * 1.5 * 1000.0
SEED = 1


class MyGenotype(Genotype):
    def __init__(self):
        super().__init__(orig_size_xyz=IND_SIZE)
        self.add_network(
            CPPN(output_node_names=["shape", "muscleOrTissue", "muscleType",
                                    "tissueType"])
        )
        self.to_phenotype_mapping.add_map(
            name="material", tag="<Data>", func=make_material_tree,
            dependency_order=["shape", "muscleOrTissue", "muscleType",
                              "tissueType"], output_type=int,
        )
        self.to_phenotype_mapping.add_output_dependency(
            name="shape", dependency_name=None, requirement=None,
            material_if_true=None, material_if_false="0")
        self.to_phenotype_mapping.add_output_dependency(
            name="muscleOrTissue", dependency_name="shape", requirement=True,
            material_if_true=None, material_if_false=None)
        self.to_phenotype_mapping.add_output_dependency(
            name="tissueType", dependency_name="muscleOrTissue",
            requirement=False, material_if_true="1", material_if_false="2")
        self.to_phenotype_mapping.add_output_dependency(
            name="muscleType", dependency_name="muscleOrTissue",
            requirement=True, material_if_true="3", material_if_false="4")


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
    ap.add_argument("--dir", default="swimming_data")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    random.seed(SEED)
    np.random.seed(SEED)

    my_sim = Sim(dt_frac=DT_FRAC, simulation_time=SIM_TIME,
                 fitness_eval_init_time=INIT_TIME)
    my_env = Env(sticky_floor=0, time_between_traces=0)
    my_env.add_param("fluid_environment", 1, "<FluidEnvironment>")
    my_env.add_param("aggregate_drag_coefficient", AGGREGATE_DRAG_COEF,
                     "<AggregateDragCoefficient>")
    my_env.fluid_environment = 1
    my_env.aggregate_drag_coefficient = AGGREGATE_DRAG_COEF

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
                  name="SwimmingBasic", checkpoint_every=2, save_vxa_every=2)
    best = max(pop, key=lambda ind: ind.fitness)
    print(f"best swimmer fitness after {args.gens} gens: {best.fitness:.4f}")


if __name__ == "__main__":
    main()
