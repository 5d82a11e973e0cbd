"""Mutation operators producing new children.

Capability parity with the reference's tools/mutation.py: clone a parent,
select networks, retry mutations until the phenotype actually changes and is
valid (up to max_mutation_attempts), support evolved per-voxel mutation rates
for direct encodings (mutation.py:7-158).
"""

from __future__ import annotations

import copy
import inspect
import random

import numpy as np


def create_new_children_through_mutation(
    pop,
    print_log=None,
    new_children=None,
    mutate_network_probs=None,
    max_mutation_attempts=1500,
):
    """Create pop_size children by mutating clones of survivors
    (reference: mutation.py:7-152)."""
    if new_children is None:
        new_children = []

    random.shuffle(pop.individuals)

    while len(new_children) < pop.pop_size:
        for ind in pop:
            clone = copy.deepcopy(ind)

            required = 0 if mutate_network_probs is None else mutate_network_probs.count(1)

            selection = []
            while np.sum(selection) <= required:
                if mutate_network_probs is None:
                    selection = np.random.random(len(clone.genotype)) < 1 / float(
                        len(clone.genotype)
                    )
                else:
                    selection = np.random.random(len(clone.genotype)) < mutate_network_probs
                for idx in range(len(selection)):
                    if clone.genotype[idx].freeze:
                        selection[idx] = False

            selected_networks = np.arange(len(clone.genotype))[selection].tolist()

            for rank, goal in pop.objective_dict.items():
                setattr(
                    clone, "parent_{}".format(goal["name"]), getattr(clone, goal["name"])
                )
            clone.parent_genotype = ind.genotype
            clone.parent_id = clone.id

            for name, details in clone.genotype.to_phenotype_mapping.items():
                details["old_state"] = copy.deepcopy(details["state"])

            for selected_net_idx in selected_networks:
                mutation_counter = 0
                done = False
                while not done:
                    mutation_counter += 1
                    candidate = copy.deepcopy(clone)

                    for _ in range(
                        candidate.genotype[selected_net_idx].num_consecutive_mutations
                    ):
                        if not clone.genotype[selected_net_idx].direct_encoding:
                            # pick exactly one CPPN mutation operator by zeroing
                            # all kwargs but one (reference: mutation.py:86-90)
                            sig = inspect.signature(
                                candidate.genotype[selected_net_idx].mutate
                            )
                            mut_func_args = [0 for _ in sig.parameters]
                            choice = random.choice(range(len(mut_func_args)))
                            mut_func_args[choice] = 1
                            variation_type, variation_degree = candidate.genotype[
                                selected_net_idx
                            ].mutate(*mut_func_args)
                        else:
                            # direct encoding, optionally with an evolved
                            # per-voxel mutation-rate network (:92-103)
                            rate = None
                            for net in clone.genotype:
                                if "mutation_rate" in net.output_node_names:
                                    rate = net.values
                            if (
                                "mutation_rate"
                                not in candidate.genotype[selected_net_idx].output_node_names
                            ):
                                variation_type, variation_degree = candidate.genotype[
                                    selected_net_idx
                                ].mutate(rate)
                            else:
                                variation_type, variation_degree = candidate.genotype[
                                    selected_net_idx
                                ].mutate()

                    if variation_degree != "":
                        candidate.variation_type = "{0}({1})".format(
                            variation_type, variation_degree
                        )
                    else:
                        candidate.variation_type = str(variation_type)
                    candidate.genotype.express()

                    if candidate.genotype[selected_net_idx].allow_neutral_mutations:
                        done = True
                        # candidate is a fresh unaliased copy — adopting it
                        # directly is equivalent to the reference's re-copy
                        clone = candidate
                        break

                    for name, details in candidate.genotype.to_phenotype_mapping.items():
                        new = details["state"]
                        old = details["old_state"]
                        changes = np.array(new != old, dtype=bool)
                        if np.any(changes) and candidate.phenotype.is_valid():
                            done = True
                            clone = candidate
                            break

                    if mutation_counter > max_mutation_attempts:
                        if print_log is not None:
                            print_log.message(
                                f"Couldn't find a successful mutation in "
                                f"{max_mutation_attempts} attempts! Skipping this network."
                            )
                        break

                if not clone.genotype[selected_net_idx].direct_encoding:
                    for output_node in clone.genotype[selected_net_idx].output_node_names:
                        clone.genotype[selected_net_idx].graph.nodes[output_node][
                            "old_state"
                        ] = ""

            # children start unevaluated (reference: mutation.py:143-146)
            for rank, goal in pop.objective_dict.items():
                if goal["tag"] is not None:
                    setattr(clone, goal["name"], goal["worst_value"])

            clone.id = pop.max_id
            pop.max_id += 1
            new_children.append(clone)

    return new_children


def genome_wide_mutation(pop, print_log=None):
    """Mutate every network of every parent (reference: mutation.py:155-157)."""
    mutate_network_probs = [1 for _ in range(len(pop[0].genotype))]
    return create_new_children_through_mutation(
        pop, print_log, mutate_network_probs=mutate_network_probs
    )
