"""Phenotype post-processing: connected components, material trees.

Capability parity with the reference's material mappers
(tools/utils.py:123-295), re-implemented on vectorized scipy/numpy: the
reference's hand-rolled BFS largest-component search (utils.py:199-263)
becomes `scipy.ndimage.label` with a 6-connected structuring element —
identical result, orders of magnitude faster for 10³ lattices.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

# 6-connectivity (faces only), matching the reference's neighbor set
# (tools/utils.py:250)
_STRUCT_6 = ndimage.generate_binary_structure(3, 1)


def make_one_shape_only(output_state, mask=None):
    """Keep only the largest 6-connected component of mask(output_state).

    Returns an int array with 1 inside the largest component, 0 elsewhere
    (reference behavior: tools/utils.py:199-263).
    """
    if mask is None:
        present = np.greater(output_state, 0)
    else:
        present = mask(output_state)

    one_shape = np.zeros(np.shape(output_state), dtype=np.int32)
    if present.sum() < 2:
        one_shape[present] = 1
        return one_shape

    labels, num = ndimage.label(present, structure=_STRUCT_6)
    if num == 0:
        return one_shape
    sizes = ndimage.sum_labels(present, labels, index=np.arange(1, num + 1))
    largest = 1 + int(np.argmax(sizes))
    one_shape[labels == largest] = 1
    return one_shape


def count_neighbors(output_state, mask=None):
    """Per-voxel count of 6-neighbors present (reference: utils.py:266-295)."""
    if mask is None:
        present = np.greater(output_state, 0)
    else:
        present = mask(output_state)
    present = present.astype(np.int32)
    counts = np.zeros_like(present)
    for axis in range(3):
        for shift in (1, -1):
            rolled = np.roll(present, shift, axis=axis)
            # zero the wrapped slab
            sl = [slice(None)] * 3
            sl[axis] = 0 if shift == 1 else -1
            rolled[tuple(sl)] = 0
            counts += rolled
    return counts.flatten().tolist()


def two_muscles(output_state):
    """Binary threshold into materials {3, 4} (reference: utils.py:123-124)."""
    return np.greater(output_state, 0) + 3


def continuous_material(output_state, *args, **kwargs):
    return make_one_shape_only(output_state) * output_state


def discretize_material(output_state, num_materials=4, *args, **kwargs):
    """Bin a continuous output into material ids 1..num_materials
    (reference: utils.py:131-134)."""
    bins = np.linspace(-1, 1, num=num_materials + 1)
    return make_one_shape_only(output_state) * np.digitize(output_state, bins)


def make_material_tree(this_softbot, *args, **kwargs):
    """Resolve the boolean dependency chain into material ids
    (reference: utils.py:137-159). Mutates mapping state in place and
    returns the largest-component-masked material array."""
    mapping = this_softbot.to_phenotype_mapping
    material = mapping["material"]

    if material["dependency_order"] is not None:
        for dep_name in material["dependency_order"]:
            for network in this_softbot:
                if dep_name in network.graph.nodes():
                    mapping.dependencies[dep_name]["state"] = (
                        network.graph.nodes[dep_name]["state"] > 0
                    )

        for dep_name in reversed(material["dependency_order"]):
            dep = mapping.dependencies[dep_name]
            if dep["material_if_true"] is not None:
                material["state"][mapping.get_dependency(dep_name, True)] = dep[
                    "material_if_true"
                ]
            if dep["material_if_false"] is not None:
                material["state"][mapping.get_dependency(dep_name, False)] = dep[
                    "material_if_false"
                ]

    return make_one_shape_only(material["state"]) * material["state"]


def make_material_tree_single_muscle_patches(this_softbot, *args, **kwargs):
    """Material tree variant with dilated single-muscle patches
    (reference: utils.py:162-196)."""
    mapping = this_softbot.to_phenotype_mapping
    material = mapping["material"]

    for dep_name in material["dependency_order"]:
        for network in this_softbot:
            if dep_name in network.graph.nodes():
                mapping.dependencies[dep_name]["state"] = (
                    network.graph.nodes[dep_name]["state"] > 0
                )

    for dep_name in reversed(material["dependency_order"]):
        dep = mapping.dependencies[dep_name]
        if dep["material_if_true"] is not None:
            tmp = mapping.get_dependency(dep_name, True)
            if dep_name == "muscleType":
                tmp = make_one_shape_only(tmp).astype(bool)
            material["state"][tmp] = dep["material_if_true"]
        if dep["material_if_false"] is not None:
            tmp = mapping.get_dependency(dep_name, False)
            if dep_name == "muscleType":
                tmp = make_one_shape_only(tmp).astype(bool)
                material["state"][ndimage.binary_dilation(tmp)] = "1"
            material["state"][tmp] = dep["material_if_false"]

    return make_one_shape_only(material["state"]) * material["state"]
