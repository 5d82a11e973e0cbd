"""Pareto (AFPO-style) selection operators.

Capability parity with the reference's tools/selection.py: level-fill pareto
selection with log-scaled stochastic ranking inside an overflowing level
(selection.py:5-73), plus the pairwise tournament variant (:76-118).
"""

from __future__ import annotations

import math
import random


def pareto_selection(population):
    """Fill the next population best pareto level first
    (reference: selection.py:5-73)."""
    new_population = []
    population.calc_dominance()
    population.sort_by_objectives()

    pareto_level = 0
    while len(new_population) < population.pop_size:
        this_level = [
            ind for ind in population if len(ind.dominated_by) == pareto_level
        ]
        size_left = population.pop_size - len(new_population)

        if this_level:
            if size_left >= len(this_level):
                new_population += this_level
            else:
                # log-scaled stochastic preference for higher-ranked members
                # of the overflowing level (reference: selection.py:52-62)
                new_population += [this_level[0]]
                while len(new_population) < population.pop_size:
                    random_num = random.random()
                    log_level_length = math.log(len(this_level))
                    for i in range(1, len(this_level)):
                        if (
                            math.log(i) / log_level_length
                            <= random_num
                            < math.log(i + 1) / log_level_length
                            and this_level[i] not in new_population
                        ):
                            new_population += [this_level[i]]
                            continue
        pareto_level += 1

    for ind in population:
        ind.selected = 1 if ind in new_population else 0

    return new_population


def pareto_tournament_selection(population):
    """Random pairwise elimination down to pop_size or the pareto front
    (reference: selection.py:76-118)."""
    population.calc_dominance()
    random.shuffle(population.individuals)
    print("The nondominated size is", population.non_dominated_size)

    while (
        len(population) > population.pop_size
        and len(population) > population.non_dominated_size
    ):
        inds = random.sample(range(len(population)), 2)
        ind0, ind1 = population[inds[0]], population[inds[1]]
        if population.dominated_in_multiple_objectives(ind0, ind1):
            population.pop(inds[0])
        elif population.dominated_in_multiple_objectives(ind1, ind0):
            population.pop(inds[1])

    population.sort_by_objectives()
    return population.individuals
