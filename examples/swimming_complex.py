"""Complex swimmers: evolve phase, frequency, stiffness AND morphology in water.

TPU-native equivalent of the reference's swimming_complex experiment
(reference: examples/swimming_complex.py): the land_continuous genotype
(per-voxel phase offsets, global frequency env override, continuous per-voxel
stiffness, CPPN material tree) evaluated in the fluid-drag environment.

Run:  python examples/swimming_complex.py [--gens N] [--pop N] [--cpu]
"""

import argparse
import random
from functools import partial

import numpy as np

import _bootstrap  # noqa: F401

from evosoro_tpu.evo.algorithms import ParetoOptimization
from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
from evosoro_tpu.evo.softbot import Population
from evosoro_tpu.utils.functional import count_occurrences

from land_continuous import MyGenotype, MyPhenotype  # shared genotype

SIM_TIME = 5.0
INIT_TIME = 1.0
DT_FRAC = 0.9
AGGREGATE_DRAG_COEF = 0.5 * 1.5 * 1000.0
SEED = 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=3)
    ap.add_argument("--pop", type=int, default=8)
    ap.add_argument("--dir", default="swimming_complex_data")
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
                  name="SwimmingComplex", checkpoint_every=2,
                  save_vxa_every=2)
    best = max(pop, key=lambda ind: ind.fitness)
    print(f"best complex swimmer after {args.gens} gens: {best.fitness:.4f}")


if __name__ == "__main__":
    main()
