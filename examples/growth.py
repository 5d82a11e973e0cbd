"""Developmental-growth experiment: evolve initial/final voxel sizes.

The TPU-native equivalent of the reference's growth experiment
(reference: examples/growth.py): a fixed all-muscle morphology whose
per-voxel initial and final sizes are CPPN outputs; voxels grow linearly
over their lifetime (reference: VXS_Voxel.cpp:263-289) and the growth
amplitude caps actuation. Fitness is NormFinalDist; supports checkpoint
resume exactly like the reference.

Run:  python examples/growth.py [--gens N] [--pop N] [--cpu]
"""

import argparse
import os
import random

import numpy as np

import _bootstrap  # noqa: F401

from evosoro_tpu.evo.algorithms import ParetoOptimization
from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
from evosoro_tpu.evo.checkpointing import continue_from_checkpoint
from evosoro_tpu.evo.networks import CPPN
from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
from evosoro_tpu.utils.functional import count_negative, count_positive

IND_SIZE = (5, 5, 4)
SIM_TIME = 10.0
INIT_TIME = 0.5
DT_FRAC = 0.5
MIN_TEMP_FACT = 0.4
GROWTH_AMPLITUDE = 0.8
SEED = 1


class MyGenotype(Genotype):
    """Two CPPNs: per-voxel <InitialVoxelSize> and <FinalVoxelSize>
    (reference: examples/growth.py:67-78)."""

    def __init__(self):
        super().__init__(orig_size_xyz=IND_SIZE)
        self.add_network(CPPN(output_node_names=["initial_size"]))
        self.to_phenotype_mapping.add_map(
            name="initial_size", tag="<InitialVoxelSize>",
            logging_stats=[np.median, np.mean, np.std, count_negative,
                           count_positive],
        )
        self.add_network(CPPN(output_node_names=["final_size"]))
        self.to_phenotype_mapping.add_map(
            name="final_size", tag="<FinalVoxelSize>",
            logging_stats=[np.median, np.mean, np.std, count_negative,
                           count_positive],
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=3)
    ap.add_argument("--pop", type=int, default=8)
    ap.add_argument("--dir", default="growth_data")
    ap.add_argument("--extra-gens", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    random.seed(SEED)
    np.random.seed(SEED)

    my_sim = Sim(dt_frac=DT_FRAC, simulation_time=SIM_TIME,
                 min_temp_fact=MIN_TEMP_FACT, fitness_eval_init_time=INIT_TIME)
    my_env = Env()
    my_env.add_param("growth_amplitude", GROWTH_AMPLITUDE, "<GrowthAmplitude>")

    objectives = ObjectiveDict()
    objectives.add_objective(name="fitness", maximize=True,
                             tag="<NormFinalDist>")
    objectives.add_objective(name="age", maximize=False, tag=None)

    if not os.path.isfile(os.path.join(args.dir, "pickledPops/Gen_0.pickle")):
        pop = Population(objectives, MyGenotype, Phenotype, pop_size=args.pop)
        optimizer = ParetoOptimization(my_sim, my_env, pop)
        optimizer.run(max_hours_runtime=1, max_gens=args.gens,
                      num_random_individuals=1, directory=args.dir,
                      name="Growth", checkpoint_every=1, save_vxa_every=1)
    else:
        # resume exactly like the reference (examples/growth.py:121-129)
        continue_from_checkpoint(
            directory=args.dir, additional_gens=args.extra_gens,
            max_hours_runtime=1, checkpoint_every=1, save_vxa_every=1,
        )


if __name__ == "__main__":
    main()
