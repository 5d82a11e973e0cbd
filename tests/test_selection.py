"""Pareto selection machinery.

`calc_dominance` was vectorized in r5 (the reference's nested python pair
loops cost ~250 s/generation at a 3000-individual selection pool); this
file pins the vectorized form to a direct transliteration of the reference
loops (evosoro tools/softbot.py:515-543), including the two subtle bits:
full ties penalize only the lower id, and worst-fitness individuals get
the 2*pop_size self-id padding.
"""

import random

import numpy as np
import pytest

from evosoro_tpu.evo.base import ObjectiveDict
from evosoro_tpu.evo.networks import CPPN
from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
from evosoro_tpu.utils.phenotype_mappers import make_material_tree


class _Genotype(Genotype):
    def __init__(self):
        super().__init__(orig_size_xyz=(3, 3, 3))
        self.add_network(CPPN(output_node_names=["shape"]))
        self.to_phenotype_mapping.add_map(
            name="material", tag="<Data>", func=make_material_tree,
            dependency_order=["shape"], output_type=int)
        self.to_phenotype_mapping.add_output_dependency(
            name="shape", dependency_name=None, requirement=None,
            material_if_true="3", material_if_false="0")


class _Phenotype(Phenotype):
    def is_valid(self):
        return True


def _naive_calc_dominance(pop):
    """Reference transliteration (softbot.py:515-543): returns
    {id: dominated_by list} without mutating the population."""
    inds = sorted(pop.individuals, key=lambda i: i.id)
    dominated_by = {ind.id: [] for ind in inds}
    for ind in inds:
        for other in inds:
            if other.id != ind.id:
                if pop.dominated_in_multiple_objectives(ind, other) and (
                    ind.id not in dominated_by[other.id]
                ):
                    dominated_by[ind.id] += [other.id]
        if ind.fitness == pop.objective_dict[0]["worst_value"]:
            dominated_by[ind.id] += [ind.id] * (pop.pop_size * 2)
    return dominated_by


@pytest.mark.parametrize("seed", [0, 7])
def test_calc_dominance_matches_reference_loops(seed):
    random.seed(seed)
    np.random.seed(seed)
    objectives = ObjectiveDict()
    objectives.add_objective(name="fitness", maximize=True,
                             tag="<NormFinalDist>")
    objectives.add_objective(name="age", maximize=False, tag=None)
    pop = Population(objectives, _Genotype, _Phenotype, pop_size=12)
    # grow the pool past pop_size like a real selection step, with plenty
    # of ties (quantized fitness), a worst-value case, and varied ages
    rng = np.random.default_rng(seed)
    for i, ind in enumerate(pop):
        ind.fitness = float(np.round(rng.uniform(0, 1) * 4) / 4)
        ind.age = int(rng.integers(0, 3))
    pop[0].fitness = pop.objective_dict[0]["worst_value"]
    pop[1].fitness = pop[2].fitness
    pop[1].age = pop[2].age  # full tie pair

    expected = _naive_calc_dominance(pop)
    pop.calc_dominance()
    for ind in pop:
        assert sorted(ind.dominated_by) == sorted(expected[ind.id]), ind.id
        assert ind.pareto_level == len(expected[ind.id])
    nd = sum(1 for ind in pop if len(expected[ind.id]) == 0)
    assert pop.non_dominated_size == nd


def test_pareto_selection_fills_levels():
    random.seed(1)
    np.random.seed(1)
    from evosoro_tpu.evo.selection import pareto_selection

    objectives = ObjectiveDict()
    objectives.add_objective(name="fitness", maximize=True,
                             tag="<NormFinalDist>")
    objectives.add_objective(name="age", maximize=False, tag=None)
    pop = Population(objectives, _Genotype, _Phenotype, pop_size=8)
    rng = np.random.default_rng(1)
    for ind in pop:
        ind.fitness = float(rng.uniform(0, 1))
        ind.age = int(rng.integers(0, 3))
    kept = pareto_selection(pop)
    assert len(kept) >= pop.pop_size
    # every level-0 individual must be kept
    front = [i for i in pop if i.pareto_level == 0]
    kept_ids = {i.id for i in kept}
    assert all(i.id in kept_ids for i in front) or len(front) > pop.pop_size
