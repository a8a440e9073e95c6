"""Evolutionary NAS: generators, evolver, batched supernet scoring."""

from . import evolver, generators
from .evolver import Individual, PopulationEvolver
from .generators import (crossover_network_def, gen_random_network_def,
                         mutate_network_def, prune_random_one, reduce_constraint)

__all__ = [
    "Individual",
    "PopulationEvolver",
    "crossover_network_def",
    "evolver",
    "gen_random_network_def",
    "generators",
    "mutate_network_def",
    "prune_random_one",
    "reduce_constraint",
]

from .batched_eval import BatchedSupernetEvaluator  # noqa: E402

__all__.append("BatchedSupernetEvaluator")
