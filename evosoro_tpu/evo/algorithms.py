"""Evolutionary optimizers: AFPO-style Pareto optimization and variants.

Capability parity with the reference's tools/algorithms.py: checkpoint every
N gens, wall-clock autosuspend with AUTOSUSPENDED/RUNNING marker files, env
cycling, age update → mutate → immigrate → evaluate → pareto-select loop
(algorithms.py:13-176). Evaluation is the in-process batched TPU backend.
"""

from __future__ import annotations

import os
import pickle
import random
import time
from functools import partial

import numpy as np

from evosoro_tpu.evo.evaluation import evaluate_all
from evosoro_tpu.evo.logging import (
    PrintLog,
    initialize_folders,
    make_gen_directories,
    write_gen_stats,
)
from evosoro_tpu.evo.mutation import (
    create_new_children_through_mutation,
    genome_wide_mutation,
)
from evosoro_tpu.evo.selection import pareto_selection, pareto_tournament_selection


class Optimizer:
    """Base optimizer (reference: algorithms.py:13-43)."""

    def __init__(self, sim, env, evaluation_func=evaluate_all):
        self.sim = sim
        self.env = env if isinstance(env, list) else [env]
        self.evaluate = evaluation_func
        self.curr_env_idx = 0
        self.start_time = None

    def elapsed_time(self, units="s"):
        if self.start_time is None:
            self.start_time = time.time()
        s = time.time() - self.start_time
        return {"s": s, "m": s / 60.0, "h": s / 3600.0}[units]

    def save_checkpoint(self, directory, gen):
        """Pickle [optimizer, python RNG state, numpy RNG state]
        (reference: algorithms.py:35-40)."""
        random_state = random.getstate()
        numpy_random_state = np.random.get_state()
        data = [self, random_state, numpy_random_state]
        with open(
            "{0}/pickledPops/Gen_{1}.pickle".format(directory, gen), "wb"
        ) as handle:
            pickle.dump(data, handle, protocol=pickle.HIGHEST_PROTOCOL)

    def run(self, *args, **kwargs):
        raise NotImplementedError


class PopulationBasedOptimizer(Optimizer):
    """Generation loop (reference: algorithms.py:46-153)."""

    def __init__(self, sim, env, pop, selection_func, mutation_func,
                 evaluation_func=evaluate_all):
        super().__init__(sim, env, evaluation_func)
        self.pop = pop
        self.select = selection_func
        self.mutate = mutation_func
        self.num_env_cycles = 0
        self.autosuspended = False
        self.max_gens = None
        self.directory = None
        self.name = None
        self.num_random_inds = 0

    def update_env(self):
        if self.num_env_cycles > 0:
            switch_every = self.max_gens / float(self.num_env_cycles)
            self.curr_env_idx = int(self.pop.gen / switch_every % len(self.env))
            print(
                " Using environment {0} of {1}".format(
                    self.curr_env_idx + 1, len(self.env)
                )
            )

    def run(
        self,
        max_hours_runtime=29,
        max_gens=3000,
        num_random_individuals=1,
        num_env_cycles=0,
        directory="tests_data",
        name="TestRun",
        max_eval_time=60,
        time_to_try_again=10,
        checkpoint_every=100,
        save_vxa_every=100,
        save_pareto=False,
        save_nets=False,
        save_lineages=False,
        continued_from_checkpoint=False,
    ):
        if self.autosuspended:
            try:
                os.remove(os.path.join(directory, "AUTOSUSPENDED"))
            except FileNotFoundError:
                pass
        self.autosuspended = False
        self.max_gens = max_gens

        print_log = PrintLog()
        print_log.add_timer("evaluation")
        self.start_time = print_log.timers["start"]

        if not continued_from_checkpoint:  # generation zero
            self.directory = directory
            self.name = name
            self.num_random_inds = num_random_individuals
            self.num_env_cycles = num_env_cycles

            initialize_folders(
                self.pop, self.directory, self.name, save_nets, save_lineages=save_lineages
            )
            make_gen_directories(self.pop, self.directory, save_vxa_every, save_nets)
            open(os.path.join(self.directory, "RUNNING"), "w").close()
            self.evaluate(
                self.sim,
                self.env[self.curr_env_idx],
                self.pop,
                print_log,
                save_vxa_every,
                self.directory,
                self.name,
                max_eval_time,
                time_to_try_again,
                save_lineages,
            )
            self.select(self.pop)  # dominance stats only at gen 0
            write_gen_stats(
                self.pop,
                self.directory,
                self.name,
                save_vxa_every,
                save_pareto,
                save_nets,
                save_lineages=save_lineages,
            )

        while self.pop.gen < max_gens:
            if self.pop.gen % checkpoint_every == 0:
                print_log.message(
                    "Saving checkpoint at generation {0}".format(self.pop.gen + 1),
                    timer_name="start",
                )
                self.save_checkpoint(self.directory, self.pop.gen)

            if self.elapsed_time(units="h") > max_hours_runtime:
                self.autosuspended = True
                print_log.message(
                    "Autosuspending at generation {0}".format(self.pop.gen + 1),
                    timer_name="start",
                )
                self.save_checkpoint(self.directory, self.pop.gen)
                open(os.path.join(self.directory, "AUTOSUSPENDED"), "w").close()
                try:
                    os.remove(os.path.join(self.directory, "RUNNING"))
                except FileNotFoundError:
                    pass
                break

            self.pop.gen += 1
            make_gen_directories(self.pop, self.directory, save_vxa_every, save_nets)

            self.pop.update_ages()

            print_log.message("Mutation starts")
            new_children = self.mutate(self.pop, print_log=print_log)
            print_log.message(
                "Mutation ends: successfully generated %d new children."
                % (len(new_children))
            )

            self.pop.append(new_children)
            for _ in range(self.num_random_inds):
                print_log.message("Random individual added to population")
                self.pop.add_random_individual()

            print_log.message("Starting fitness evaluation", timer_name="start")
            print_log.reset_timer("evaluation")
            self.update_env()
            self.evaluate(
                self.sim,
                self.env[self.curr_env_idx],
                self.pop,
                print_log,
                save_vxa_every,
                self.directory,
                self.name,
                max_eval_time,
                time_to_try_again,
                save_lineages,
            )
            print_log.message("Fitness evaluation finished", timer_name="evaluation")

            new_population = self.select(self.pop)

            print_log.message("Saving statistics")
            write_gen_stats(
                self.pop,
                self.directory,
                self.name,
                save_vxa_every,
                save_pareto,
                save_nets,
                save_lineages=save_lineages,
            )

            self.pop.individuals = new_population
            print_log.message("Population size reduced to %d" % len(self.pop))

        if not self.autosuspended:
            print_log.message("Finished {0} generations".format(self.pop.gen + 1))
            print_log.message("DONE!", timer_name="start")
            open(os.path.join(self.directory, "RUN_FINISHED"), "w").close()
            try:
                os.remove(os.path.join(self.directory, "RUNNING"))
            except FileNotFoundError:
                pass


class ParetoOptimization(PopulationBasedOptimizer):
    def __init__(self, sim, env, pop, evaluation_func=evaluate_all):
        super().__init__(
            sim, env, pop, pareto_selection, create_new_children_through_mutation,
            evaluation_func,
        )


class ParetoTournamentOptimization(PopulationBasedOptimizer):
    def __init__(self, sim, env, pop, evaluation_func=evaluate_all):
        super().__init__(
            sim,
            env,
            pop,
            pareto_tournament_selection,
            create_new_children_through_mutation,
            evaluation_func,
        )


class GenomeWideMutationOptimization(PopulationBasedOptimizer):
    def __init__(self, sim, env, pop, evaluation_func=evaluate_all):
        super().__init__(
            sim, env, pop, pareto_selection, genome_wide_mutation, evaluation_func
        )


class SetMutRateOptimization(PopulationBasedOptimizer):
    def __init__(self, sim, env, pop, mut_net_probs, evaluation_func=evaluate_all):
        super().__init__(
            sim,
            env,
            pop,
            pareto_selection,
            partial(create_new_children_through_mutation, mutate_network_probs=mut_net_probs),
            evaluation_func,
        )
