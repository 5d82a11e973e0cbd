"""Genotype→phenotype expression, individuals, populations.

Capability parity with the reference's evosoro/softbot.py. The recursive
CPPN DAG evaluation over the whole voxel grid (reference: softbot.py:98-117)
is kept host-side in numpy: grids are tiny (≤10³) and expression happens once
per mutation — the TPU is reserved for the physics rollouts.
"""

from __future__ import annotations

import hashlib
from copy import deepcopy

import numpy as np

from evosoro_tpu.evo.networks import Network
from evosoro_tpu.utils.functional import dominates, sigmoid, xml_format


class GenotypeToPhenotypeMap:
    """Associates network outputs with simulation inputs
    (reference: softbot.py:120-259)."""

    def __init__(self):
        self.mapping = dict()
        self.dependencies = dict()

    def items(self):
        return [(key, self.mapping[key]) for key in self.mapping]

    def __contains__(self, key):
        try:
            return key in self.mapping
        except TypeError:
            return False

    def __len__(self):
        return len(self.mapping)

    def __getitem__(self, key):
        return self.mapping[key]

    def __deepcopy__(self, memo):
        """One-level copy of the mapping/dependency dicts, sharing the
        leaf values. 'state'/'old_state' arrays are only ever rebound
        (express() assigns fresh arrays; make_material_tree's in-place
        writes target the fresh -999 array express() just bound), so
        sharing them across copies is safe and skips the dominant cost
        of cloning individuals in the mutation retry loop."""
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        new.mapping = {k: dict(d) for k, d in self.mapping.items()}
        new.dependencies = {k: dict(d) for k, d in self.dependencies.items()}
        for key, val in self.__dict__.items():
            if key not in ("mapping", "dependencies"):
                new.__dict__[key] = deepcopy(val, memo)
        return new

    def add_map(
        self,
        name,
        tag,
        func=sigmoid,
        output_type=float,
        dependency_order=None,
        params=None,
        param_tags=None,
        env_kws=None,
        logging_stats=np.mean,
    ):
        """Associate a network output `name` with a simulation input.

        `tag` is the VXC tag for IO round-trips (None = computed in Python
        only); `env_kws` instead maps statistics of the output onto Env
        attributes (reference: softbot.py:155-222).
        """
        if (dependency_order is not None) and not isinstance(dependency_order, list):
            dependency_order = [dependency_order]
        if params is not None:
            assert param_tags is not None
            if not isinstance(params, list):
                params = [params]
        if param_tags is not None:
            assert params is not None
            if not isinstance(param_tags, list):
                param_tags = [param_tags]
            param_tags = [xml_format(t) for t in param_tags]
        if (env_kws is not None) and not isinstance(env_kws, dict):
            env_kws = {env_kws: np.mean}
        if (logging_stats is not None) and not isinstance(logging_stats, list):
            logging_stats = [logging_stats]
        if tag is not None:
            tag = xml_format(tag)

        self.mapping[name] = {
            "tag": tag,
            "func": func,
            "dependency_order": dependency_order,
            "state": None,
            "old_state": None,
            "output_type": output_type,
            "params": params,
            "param_tags": param_tags,
            "env_kws": env_kws,
            "logging_stats": logging_stats,
        }

    def add_output_dependency(
        self,
        name,
        dependency_name,
        requirement,
        material_if_true=None,
        material_if_false=None,
    ):
        """Boolean material-tree dependency (reference: softbot.py:224-249)."""
        self.dependencies[name] = {
            "depends_on": dependency_name,
            "requirement": requirement,
            "material_if_true": material_if_true,
            "material_if_false": material_if_false,
            "state": None,
        }

    def get_dependency(self, name, output_bool):
        """Recursive chain of boolean requirements (reference: :251-259)."""
        if self.dependencies[name]["depends_on"] is not None:
            dependency = self.dependencies[name]["depends_on"]
            requirement = self.dependencies[name]["requirement"]
            return np.logical_and(
                self.get_dependency(dependency, True) == requirement,
                self.dependencies[name]["state"] == output_bool,
            )
        return self.dependencies[name]["state"] == output_bool


class Genotype:
    """A list of networks plus the mapping to phenotype
    (reference: softbot.py:10-117)."""

    def __init__(self, orig_size_xyz=(6, 6, 6)):
        self.networks = []
        self.all_networks_outputs = []
        self.to_phenotype_mapping = GenotypeToPhenotypeMap()
        self.orig_size_xyz = orig_size_xyz

    def __iter__(self):
        return iter(self.networks)

    def __len__(self):
        return len(self.networks)

    def __getitem__(self, n):
        return self.networks[n]

    def __deepcopy__(self, memo):
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        new.__dict__.update(deepcopy(self.__dict__, memo))
        return new

    def add_network(self, network, freeze=False, num_consecutive_mutations=1):
        assert isinstance(network, Network)
        network.freeze = freeze
        network.num_consecutive_mutations = num_consecutive_mutations
        self.networks += [network]
        self.all_networks_outputs.extend(network.output_node_names)

    def express(self):
        """Evaluate every network over the grid and fill the phenotype map
        (reference: softbot.py:65-96)."""
        for network in self:
            if not network.direct_encoding:
                for name in network.graph.nodes():
                    network.graph.nodes[name]["evaluated"] = False
                network.set_input_node_states(self.orig_size_xyz)
                for name in network.output_node_names:
                    network.graph.nodes[name]["state"] = np.zeros(self.orig_size_xyz)
                    network.graph.nodes[name]["state"] = self.calc_node_state(
                        network, name
                    )

        for network in self:
            for name in network.output_node_names:
                if name in self.to_phenotype_mapping:
                    if not network.direct_encoding:
                        self.to_phenotype_mapping[name]["state"] = network.graph.nodes[
                            name
                        ]["state"]
                    else:
                        self.to_phenotype_mapping[name]["state"] = network.values

        for name, details in self.to_phenotype_mapping.items():
            if name not in self.all_networks_outputs:
                details["state"] = (
                    np.ones(self.orig_size_xyz, dtype=details["output_type"]) * -999
                )
                if details["dependency_order"] is not None:
                    for dep_name in details["dependency_order"]:
                        self.to_phenotype_mapping.dependencies[dep_name]["state"] = None

        for name, details in self.to_phenotype_mapping.items():
            if details["dependency_order"] is not None:
                details["state"] = details["func"](self)

    def calc_node_state(self, network, node_name):
        """Recursive DAG evaluation (reference: softbot.py:98-117)."""
        node = network.graph.nodes[node_name]
        if node["evaluated"]:
            return node["state"]
        node["evaluated"] = True

        new_state = np.zeros(self.orig_size_xyz)
        for node1, node2 in network.graph.in_edges(node_name):
            new_state = new_state + self.calc_node_state(network, node1) * (
                network.graph.edges[node1, node2]["weight"]
            )
        node["state"] = new_state

        if node_name in self.to_phenotype_mapping:
            if self.to_phenotype_mapping[node_name]["dependency_order"] is None:
                return self.to_phenotype_mapping[node_name]["func"](new_state)
        return node["function"](new_state)

    def phenotype_md5(self):
        """Content hash of all mapped output states — the evaluation dedup
        key (reference: read_write_voxelyze.py:404-407)."""
        h = hashlib.md5()
        for name, details in sorted(self.to_phenotype_mapping.items()):
            if details["state"] is not None:
                h.update(name.encode())
                h.update(np.ascontiguousarray(details["state"]).tobytes())
        return h.hexdigest()


class Phenotype:
    """Physical manifestation of the genotype (reference: softbot.py:262-299)."""

    def __init__(self, genotype):
        self.genotype = genotype
        self.genotype.express()

    def __deepcopy__(self, memo):
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        new.__dict__.update(deepcopy(self.__dict__, memo))
        return new

    def is_valid(self):
        """NaN guard on every network output (reference: softbot.py:284-299)."""
        for network in self.genotype:
            for name in network.output_node_names:
                if not network.direct_encoding and np.isnan(
                    network.graph.nodes[name]["state"]
                ).any():
                    return False
                if network.direct_encoding and np.isnan(network.values).any():
                    return False
        return True


class SoftBot:
    """One individual (reference: softbot.py:302-349)."""

    def __init__(self, max_id, objective_dict, genotype_cls, phenotype_cls):
        self.genotype = genotype_cls()
        self.phenotype = phenotype_cls(self.genotype)

        self.id = max_id
        self.md5 = "none"
        self.dominated_by = []
        self.pareto_level = 0
        self.selected = 0
        self.variation_type = "newly_generated"
        self.parent_genotype = self.genotype
        self.parent_id = -1
        self.age = 0

        self.objective_dict = objective_dict
        for rank, details in objective_dict.items():
            if details["name"] != "age":
                setattr(self, details["name"], details["worst_value"])
            setattr(self, "parent_{}".format(details["name"]), details["worst_value"])

    def __deepcopy__(self, memo):
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        for key, val in self.__dict__.items():
            if key in ("objective_dict", "parent_genotype"):
                # objective_dict is shared population-wide at construction
                # and never mutated; parent_genotype is write-only
                # provenance the mutation driver immediately rebinds to
                # the live parent's genotype — copying either per clone
                # is pure cost.
                new.__dict__[key] = val
            else:
                new.__dict__[key] = deepcopy(val, memo)
        return new


class Population:
    """A population of SoftBots (reference: softbot.py:352-543)."""

    def __init__(self, objective_dict, genotype_cls, phenotype_cls, pop_size=30):
        self.genotype = genotype_cls
        self.phenotype = phenotype_cls
        self.pop_size = pop_size
        self.gen = 0
        self.total_evaluations = 0
        self.already_evaluated = {}
        self.all_evaluated_individuals_ids = []
        self.objective_dict = objective_dict
        self.best_fit_so_far = objective_dict[0]["worst_value"]
        self.individuals = []
        self.lineage_dict = {}
        self.max_id = 0
        self.non_dominated_size = 0

        while len(self) < pop_size:
            self.add_random_individual()

    def __iter__(self):
        return iter(self.individuals)

    def __contains__(self, n):
        try:
            return n in self.individuals
        except TypeError:
            return False

    def __len__(self):
        return len(self.individuals)

    def __getitem__(self, n):
        return self.individuals[n]

    def pop(self, index=None):
        if index is None:
            return self.individuals.pop()
        return self.individuals.pop(index)

    def append(self, individuals):
        if isinstance(individuals, list):
            for ind in individuals:
                if not isinstance(ind, SoftBot):
                    raise TypeError("Non-SoftBot added to the population")
            self.individuals += individuals
        elif isinstance(individuals, SoftBot):
            self.individuals += [individuals]

    def sort(self, key, reverse=False):
        self.individuals.sort(reverse=reverse, key=lambda ind: getattr(ind, key))

    def add_random_individual(self):
        while True:
            ind = SoftBot(self.max_id, self.objective_dict, self.genotype, self.phenotype)
            if ind.phenotype.is_valid():
                self.individuals.append(ind)
                self.max_id += 1
                return

    def update_ages(self):
        for ind in self:
            ind.age += 1
            ind.variation_type = "survived"

    def update_lineages(self):
        """Garbage-collected ancestry map (reference: softbot.py:462-476)."""
        for ind in self:
            if ind.id not in self.lineage_dict:
                if ind.parent_id > -1:
                    self.lineage_dict[ind.id] = [ind.parent_id] + self.lineage_dict[
                        ind.parent_id
                    ]
                else:
                    self.lineage_dict[ind.id] = []
        current_ids = [ind.id for ind in self]
        for key in [k for k in self.lineage_dict if k not in current_ids]:
            del self.lineage_dict[key]

    def sort_by_objectives(self):
        """Stable multi-key sort: id desc → age asc → objectives by rank →
        pareto level (reference: softbot.py:478-497)."""
        import math

        for ind in self:
            if math.isnan(ind.fitness):
                ind.fitness = self.objective_dict[0]["worst_value"]
                print(
                    "FITNESS WAS NAN, RESETTING IT TO:",
                    self.objective_dict[0]["worst_value"],
                )

        self.sort(key="id", reverse=True)
        self.sort(key="age", reverse=False)
        for rank in reversed(range(len(self.objective_dict))):
            if not self.objective_dict[rank]["logging_only"]:
                goal = self.objective_dict[rank]
                self.sort(key=goal["name"], reverse=goal["maximize"])
        self.sort(key="pareto_level", reverse=False)

    def dominated_in_multiple_objectives(self, ind1, ind2):
        """ind1 dominated by ind2 ⇔ ind1 wins on no non-logging objective
        (reference: softbot.py:499-513)."""
        wins = []
        for rank in reversed(range(len(self.objective_dict))):
            if not self.objective_dict[rank]["logging_only"]:
                goal = self.objective_dict[rank]
                wins += [dominates(ind1, ind2, goal["name"], goal["maximize"])]
        return not np.any(wins)

    def calc_dominance(self):
        """Dominance lists + pareto level (reference: :515-543).

        Same semantics as the reference's nested python loops, vectorized
        to numpy pairwise matrices — the loops cost ~250 s/generation at a
        3000-individual selection pool (measured on the pop-1024 EVOBENCH
        config), the matrices cost milliseconds. Matched semantics:
        ind is dominated by other iff ind strictly beats other on NO
        non-logging objective (full ties count), EXCEPT a mutual
        (all-tied) pair only penalizes the lower id — the reference's
        `ind.id not in other_ind.dominated_by` guard under ascending-id
        processing order. NaN objectives lose every comparison, exactly
        like python `>`/`<`."""
        self.sort(key="id", reverse=False)

        self.non_dominated_size = 0
        n = len(self.individuals)
        inds = self.individuals
        ids = np.array([ind.id for ind in inds])

        wins = np.zeros((n, n), dtype=bool)
        for rank in reversed(range(len(self.objective_dict))):
            goal = self.objective_dict[rank]
            if goal["logging_only"]:
                continue
            v = np.array([getattr(ind, goal["name"]) for ind in inds],
                         dtype=np.float64)
            if goal["maximize"]:
                wins |= v[:, None] > v[None, :]
            else:
                wins |= v[:, None] < v[None, :]

        dominated = ~wins  # [i, j]: i beats j nowhere -> i dominated by j
        np.fill_diagonal(dominated, False)
        # mutual (tied) pairs: only the earlier-processed (lower-id) side
        # records the domination
        mutual = dominated & dominated.T
        dominated &= ~(mutual & np.tri(n, n, -1, dtype=bool))

        worst = self.objective_dict[0]["worst_value"]
        for i, ind in enumerate(inds):
            dom_ids = ids[dominated[i]].tolist()
            if ind.fitness == worst:
                dom_ids += [ind.id] * (self.pop_size * 2)
            ind.dominated_by = dom_ids
            ind.pareto_level = len(dom_ids)
            if ind.pareto_level == 0:
                self.non_dominated_size += 1
