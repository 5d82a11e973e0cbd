"""Evolutionary optimization layer (reference: evosoro L4/L5, SURVEY.md §1)."""

from evosoro_tpu.evo.base import Env, Material, ObjectiveDict, Sim, VoxCadParams  # noqa: F401
from evosoro_tpu.evo.networks import CPPN, DirectEncoding, Network  # noqa: F401
from evosoro_tpu.evo.softbot import (  # noqa: F401
    Genotype,
    GenotypeToPhenotypeMap,
    Phenotype,
    Population,
    SoftBot,
)
