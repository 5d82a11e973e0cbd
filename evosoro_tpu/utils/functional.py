"""Scalar/array helper functions for genotype→phenotype mapping.

Same function inventory as the reference's tools/utils.py:7-110 (activation
functions, sigmoids, normalize, natural_sort, dominates) — the CPPN
activation set is part of the genotype search space, so names and semantics
must match for experiment parity.
"""

from __future__ import annotations

import re

import numpy as np


def identity(x):
    return x


def sigmoid(x):
    """tanh-shaped sigmoid in [-1, 1] (reference: tools/utils.py:11-12)."""
    return 2.0 / (1.0 + np.exp(-x)) - 1.0


def positive_sigmoid(x):
    return (1 + sigmoid(x)) * 0.5


def rescaled_positive_sigmoid(x, x_min=0, x_max=1):
    return (x_max - x_min) * positive_sigmoid(x) + x_min


def inverted_sigmoid(x):
    return sigmoid(x) ** -1


def neg_abs(x):
    return -np.abs(x)


def neg_square(x):
    return -np.square(x)


def sqrt_abs(x):
    return np.sqrt(np.abs(x))


def neg_sqrt_abs(x):
    return -sqrt_abs(x)


def mean_abs(x):
    return np.mean(np.abs(x))


def std_abs(x):
    return np.std(np.abs(x))


def count_positive(x):
    return np.sum(np.greater(x, 0))


def count_negative(x):
    return np.sum(np.less(x, 0))


def normalize(x):
    """Shift/scale x into [-1, 1] (reference: tools/utils.py:63-69)."""
    x = np.asarray(x, dtype=float).copy()
    x -= np.min(x)
    mx = np.max(x)
    if mx > 0:
        x /= mx
    x = np.nan_to_num(x)
    return x * 2 - 1


def xml_format(tag):
    """Wrap a tag name in angle brackets if not already."""
    if tag[0] != "<":
        tag = "<" + tag
    if tag[-1:] != ">":
        tag += ">"
    return tag


def natural_sort(items, reverse=False):
    def convert(text):
        return int(text) if text.isdigit() else text.lower()

    def key(k):
        return [convert(c) for c in re.split(r"([0-9]+)", k)]

    return sorted(items, key=key, reverse=reverse)


def dominates(ind1, ind2, attribute_name, maximize):
    """True if ind1 beats ind2 on one attribute (reference: utils.py:105-110)."""
    a, b = getattr(ind1, attribute_name), getattr(ind2, attribute_name)
    return a > b if maximize else a < b


def count_occurrences(x, keys):
    x = np.asarray(x)
    active = np.zeros_like(x, dtype=bool)
    for a in keys:
        active |= x == a
    return active.sum()


def proportion_equal_to(x, keys):
    return np.mean(count_occurrences(x, keys))
