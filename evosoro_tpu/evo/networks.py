"""Genotype networks: CPPN graphs and direct encodings.

Capability parity with the reference's evosoro/networks.py (CPPN over
networkx DiGraph with 6 mutation operators; DirectEncoding with per-voxel
Gaussian mutation and X-mirror symmetry), written for modern networkx (3.x)
and vectorized input grids. Uses the global `random`/`np.random` RNGs like
the reference so checkpointing can save/restore generator state
(reference: algorithms.py:35-40).
"""

from __future__ import annotations

from copy import deepcopy
import random

import networkx as nx
import numpy as np

from evosoro_tpu.utils.functional import (
    neg_abs,
    neg_sqrt_abs,
    neg_square,
    normalize,
    sigmoid,
    sqrt_abs,
)


class Network:
    """Base class for genotype networks (reference: networks.py:17-41)."""

    input_node_names: list = []

    def __init__(self, output_node_names):
        self.output_node_names = list(output_node_names)
        # node insertion order is deterministic in nx>=2 dicts, which keeps
        # checkpoint/restore reproducible (the reference needed OrderedDict
        # subclasses for this on networkx<2.0 — networks.py:11-14)
        self.graph = nx.DiGraph()
        self.freeze = False
        self.allow_neutral_mutations = False
        self.num_consecutive_mutations = 1
        self.direct_encoding = False

    def __deepcopy__(self, memo):
        """Structural copy tuned for the mutation retry loop.

        The generic recursive deepcopy of a networkx graph dominates
        evolution host time at scale (~70% of a pop-1024 generation's
        mutation cost). `graph.copy()` rebuilds the structure and copies
        every node/edge attribute dict one level deep, *sharing* the
        attribute values — which is exactly as deep as mutation needs:
        weights/functions/types are rebound (never mutated in place) by
        every mutation operator, and the cached per-voxel 'state' arrays
        are only ever rebound by express()/calc_node_state. The one
        genuinely in-place-mutated array, DirectEncoding.values
        (values[selection] += ...), gets a real copy.
        """
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        for key, val in self.__dict__.items():
            if key == "graph":
                new.graph = val.copy()
            elif isinstance(val, np.ndarray):
                new.__dict__[key] = val.copy()
            else:
                new.__dict__[key] = deepcopy(val, memo)
        return new

    def set_input_node_states(self, *args, **kwargs):
        raise NotImplementedError

    def mutate(self, *args, **kwargs):
        raise NotImplementedError


class CPPN(Network):
    """Compositional Pattern Producing Network (reference: networks.py:44-299).

    Inputs are the voxel coordinates (x, y, z), radial distance d, and bias b,
    each normalized to [-1, 1] over the bounding lattice.
    """

    input_node_names = ["x", "y", "z", "d", "b"]
    activation_functions = [
        np.sin,
        np.abs,
        neg_abs,
        np.square,
        neg_square,
        sqrt_abs,
        neg_sqrt_abs,
    ]

    def __init__(self, output_node_names):
        super().__init__(output_node_names)
        self.set_minimal_graph()
        self.mutate()

    def set_minimal_graph(self):
        """Fully connect inputs to outputs with zero weights."""
        for name in self.input_node_names:
            self.graph.add_node(name, type="input", function=None)
        for name in self.output_node_names:
            self.graph.add_node(name, type="output", function=sigmoid)
        for inp in self.input_node_names:
            for out in self.output_node_names:
                self.graph.add_edge(inp, out, weight=0.0)

    # the input grids depend only on the lattice size; cache them so the
    # mutation retry loop's repeated express() calls don't rebuild the
    # meshgrid every time. Cached arrays are shared read-only: every
    # consumer (calc_node_state, the mappers) rebinds rather than writing
    # in place.
    _input_state_cache: dict = {}

    @classmethod
    def _input_states(cls, orig_size_xyz):
        key = tuple(orig_size_xyz)
        cached = cls._input_state_cache.get(key)
        if cached is None:
            X, Y, Z = orig_size_xyz
            ix, iy, iz = np.meshgrid(
                np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
            )
            input_x = normalize(ix.astype(float))
            input_y = normalize(iy.astype(float))
            input_z = normalize(iz.astype(float))
            input_d = normalize(
                np.sqrt(input_x**2 + input_y**2 + input_z**2)
            )
            input_b = np.ones(key)
            cached = {
                "x": input_x, "y": input_y, "z": input_z,
                "d": input_d, "b": input_b,
            }
            for arr in cached.values():
                arr.setflags(write=False)
            cls._input_state_cache[key] = cached
        return cached

    def set_input_node_states(self, orig_size_xyz):
        """Vectorized input grids (reference loops per voxel: networks.py:69-101)."""
        for name, state in self._input_states(orig_size_xyz).items():
            if name in self.graph.nodes:
                self.graph.nodes[name]["state"] = state
                self.graph.nodes[name]["evaluated"] = True

    def mutate(
        self,
        num_random_node_adds=5,
        num_random_node_removals=0,
        num_random_link_adds=10,
        num_random_link_removals=5,
        num_random_activation_functions=100,
        num_random_weight_changes=100,
    ):
        """Apply the requested numbers of each mutation operator; the
        mutation driver zeroes all but one kwarg to pick a single operator
        (reference: networks.py:103-138, mutation.py:86-90)."""
        variation_degree = None
        variation_type = None

        for _ in range(num_random_node_adds):
            variation_degree = self.add_node()
            variation_type = "add_node"
        for _ in range(num_random_node_removals):
            variation_degree = self.remove_node()
            variation_type = "remove_node"
        for _ in range(num_random_link_adds):
            variation_degree = self.add_link()
            variation_type = "add_link"
        for _ in range(num_random_link_removals):
            variation_degree = self.remove_link()
            variation_type = "remove_link"
        for _ in range(num_random_activation_functions):
            variation_degree = self.mutate_function()
            variation_type = "mutate_function"
        for _ in range(num_random_weight_changes):
            variation_degree = self.mutate_weight()
            variation_type = "mutate_weight"

        self.prune_network()
        return variation_type, variation_degree

    # -- mutation operators (reference: networks.py:144-248) --

    def add_node(self):
        edges = list(self.graph.edges())
        if not edges:
            return "NoEdges"
        node1, node2 = random.choice(edges)
        new_node = self.get_max_hidden_node_index()
        self.graph.add_node(
            new_node, type="hidden", function=random.choice(self.activation_functions)
        )
        self.graph.add_edge(new_node, node2, weight=1.0)
        if self.graph.has_edge(node1, node2):
            weight = self.graph.edges[node1, node2]["weight"]
            self.graph.remove_edge(node1, node2)
            self.graph.add_edge(node1, new_node, weight=weight)
        else:
            self.graph.add_edge(node1, new_node, weight=1.0)
        return ""

    def remove_node(self):
        hidden = [
            n
            for n in self.graph.nodes()
            if n not in self.input_node_names and n not in self.output_node_names
        ]
        if not hidden:
            return "NoHiddenNodes"
        node = random.choice(hidden)
        # reconnect through-paths with multiplied weights to minimize disruption
        for src, _ in list(self.graph.in_edges(node)):
            for _, dst in list(self.graph.out_edges(node)):
                w = (
                    self.graph.edges[src, node]["weight"]
                    * self.graph.edges[node, dst]["weight"]
                )
                self.graph.add_edge(src, dst, weight=w)
        self.graph.remove_node(node)
        return ""

    def add_link(self):
        nodes = list(self.graph.nodes())
        attempt = 0
        while attempt <= 999:
            node1, node2 = random.choice(nodes), random.choice(nodes)
            while not self.new_edge_is_valid(node1, node2) and attempt < 999:
                node1, node2 = random.choice(nodes), random.choice(nodes)
                attempt += 1
            if attempt > 999:
                return ""
            weight = 0.1 if random.random() > 0.5 else -0.1
            self.graph.add_edge(node1, node2, weight=weight)
            if self.has_cycles():
                self.graph.remove_edge(node1, node2)
                attempt += 1
                continue
            return ""
        return ""

    def remove_link(self):
        edges = list(self.graph.edges())
        if not edges:
            return "NoEdges"
        n1, n2 = random.choice(edges)
        self.graph.remove_edge(n1, n2)
        return ""

    def mutate_function(self):
        nodes = list(self.graph.nodes())
        node = random.choice(nodes)
        while node in self.input_node_names:
            node = random.choice(nodes)
        old_fn = self.graph.nodes[node]["function"]
        while self.graph.nodes[node]["function"] == old_fn:
            self.graph.nodes[node]["function"] = random.choice(
                self.activation_functions
            )
        new_name = self.graph.nodes[node]["function"].__name__
        old_name = old_fn.__name__ if old_fn is not None else "none"
        return f"{old_name}-to-{new_name}"

    def mutate_weight(self, mutation_std=0.5):
        edges = list(self.graph.edges())
        if not edges:
            return "NoEdges"
        node1, node2 = random.choice(edges)
        old_weight = self.graph.edges[node1, node2]["weight"]
        new_weight = old_weight
        while new_weight == old_weight:
            new_weight = max(-1.0, min(random.gauss(old_weight, mutation_std), 1.0))
        self.graph.edges[node1, node2]["weight"] = new_weight
        return float(new_weight - old_weight)

    # -- helpers (reference: networks.py:254-299) --

    def prune_network(self):
        """Iteratively drop hidden nodes with no inputs or no outputs."""
        changed = True
        while changed:
            changed = False
            for node in list(self.graph.nodes()):
                if node in self.input_node_names or node in self.output_node_names:
                    continue
                if (
                    self.graph.in_degree(node) == 0
                    or self.graph.out_degree(node) == 0
                ):
                    self.graph.remove_node(node)
                    changed = True

    def has_cycles(self):
        return not nx.is_directed_acyclic_graph(self.graph)

    def get_max_hidden_node_index(self):
        max_index = 0
        for node in self.graph.nodes():
            if self.graph.nodes[node]["type"] == "hidden" and int(node) >= max_index:
                max_index = node + 1
        return max_index

    def new_edge_is_valid(self, node1, node2):
        if node1 == node2:
            return False
        if self.graph.nodes[node1]["type"] == "output":
            return False
        if self.graph.nodes[node2]["type"] == "input":
            return False
        if self.graph.has_edge(node2, node1) or self.graph.has_edge(node1, node2):
            return False
        return True


class DirectEncoding(Network):
    """Raw per-voxel array genotype with Gaussian mutation
    (reference: networks.py:302-371)."""

    def __init__(
        self,
        output_node_name,
        orig_size_xyz,
        lower_bound=-1,
        upper_bound=1,
        func=None,
        symmetric=True,
        p=None,
        scale=None,
        start_val=None,
        mutate_start_val=False,
    ):
        super().__init__([output_node_name])
        self.direct_encoding = True
        self.allow_neutral_mutations = True
        self.size = orig_size_xyz
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.p = p if p is not None else 1 / np.prod(self.size, dtype="f")
        self.scale = scale
        self.func = func
        self.symmetric = symmetric
        self.start_value = start_val

        if start_val is None:
            self.values = np.random.uniform(lower_bound, upper_bound, size=orig_size_xyz)
        else:
            self.values = np.ones(shape=orig_size_xyz) * start_val
            if mutate_start_val:
                self.mutate()

        self.enforce_symmetry()
        if self.func is not None:
            self.values = self.func(self.values)
        self.values = np.clip(self.values, self.lower_bound, self.upper_bound)

    def set_input_node_states(self, *args, **kwargs):
        pass

    def mutate(self, rate=None):
        if rate is None:
            rate = self.p
        scale = self.scale
        if scale is None:
            # meta-mutation: scale tied to current values (reference :353-357)
            scale = np.clip(self.values**0.5, self.start_value**0.5, self.upper_bound)
        selection = np.random.random(self.size) < rate
        change = np.random.normal(scale=scale, size=self.size)
        self.values[selection] += change[selection]
        self.values = np.clip(self.values, self.lower_bound, self.upper_bound)
        self.enforce_symmetry()
        if self.func is not None:
            self.values = self.func(self.values)
        return "gaussian", self.scale

    def enforce_symmetry(self):
        """Mirror the array across the X midplane (reference :368-371)."""
        if self.symmetric:
            reversed_array = self.values[::-1, :, :]
            half = int(self.size[0] / 2.0)
            self.values[:half, :, :] = reversed_array[:half, :, :]
