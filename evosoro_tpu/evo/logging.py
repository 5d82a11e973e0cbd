"""Run-directory scaffolding, timers, per-generation statistics.

Capability parity with the reference's tools/logging.py: PrintLog wall-clock
timers (:21-47), run directory layout (:170-210), per-generation TSV of all
individuals including per-output summary stats vs parent (:84-167), champion
file, pareto-front archive, network GML dumps (:290-301).
"""

from __future__ import annotations

import os
import time

import numpy as np


class PrintLog:
    """Timestamped logging with named wall-clock timers
    (reference: logging.py:21-47)."""

    def __init__(self):
        self.timers = {"start": time.time()}

    def add_timer(self, name):
        assert name not in self.timers
        self.timers[name] = time.time()

    def reset_timer(self, name):
        assert name in self.timers
        if name != "start":
            self.timers[name] = time.time()

    def seconds_from(self, timer_name):
        return time.time() - self.timers[timer_name]

    def message(self, content, timer_name=None):
        if timer_name is None:
            print("{}: {}".format(time.strftime("%Y-%m-%d %H:%M:%S"), content))
        else:
            print(
                "{}: {} \t (time from {}: {:.2f} s)".format(
                    time.strftime("%Y-%m-%d %H:%M:%S"),
                    content,
                    timer_name,
                    self.seconds_from(timer_name),
                )
            )


def time_stamp():
    return time.strftime("%Y-%m-%d %H:%M:%S")


def make_header(population, path):
    """TSV header matching record_individuals_data's columns
    (reference: logging.py:49-82)."""
    _file = open(path, "w")
    header_string = "gen\t\tid\t\tdom\t\tparent_id\t\tvariation_type"
    for rank, details in population.objective_dict.items():
        header_string += "\t\t{}".format(details["name"])
        header_string += "\t\tparent_{}".format(details["name"])
    for name, details in population[0].genotype.to_phenotype_mapping.items():
        if details["logging_stats"] is not None:
            for stat in details["logging_stats"]:
                header_string += "\t\t{}_{}".format(stat.__name__, name)
                header_string += "\t\t{}_parent_{}".format(stat.__name__, name)
                header_string += "\t\t{}_parent_diff_{}".format(stat.__name__, name)
    _file.write(header_string + "\n")
    _file.close()


def record_individuals_data(pop, path, num_inds_to_save=None):
    """Append one TSV row per individual (reference: logging.py:84-167)."""
    if num_inds_to_save is None:
        num_inds_to_save = len(pop)
    recording_file = open(path, "a")
    n = 0
    for ind in pop:
        if n < num_inds_to_save:
            objectives_string = ""
            for rank, details in pop.objective_dict.items():
                objectives_string += "\t\t{}".format(getattr(ind, details["name"]))
                objectives_string += "\t\t{}".format(
                    getattr(ind, "parent_{}".format(details["name"]))
                )
            for name, details in ind.genotype.to_phenotype_mapping.items():
                if details["logging_stats"] is not None:
                    for stat in details["logging_stats"]:
                        state = details["state"]
                        old_state = details["old_state"]
                        objectives_string += "\t\t{}".format(stat(state))
                        if old_state is not None and np.shape(old_state) == np.shape(
                            state
                        ):
                            objectives_string += "\t\t{}".format(stat(old_state))
                            objectives_string += "\t\t{}".format(
                                stat(np.asarray(state) - np.asarray(old_state))
                            )
                        else:
                            objectives_string += "\t\tNone\t\tNone"
            recording_file.write(
                "{}\t\t{}\t\t{}\t\t{}\t\t{}{}\n".format(
                    pop.gen,
                    ind.id,
                    len(ind.dominated_by),
                    ind.parent_id,
                    ind.variation_type,
                    objectives_string,
                )
            )
            n += 1
    recording_file.close()


def initialize_folders(population, run_directory, run_name, save_networks=False,
                       save_all_individual_data=True, save_lineages=False):
    """Create the run-directory layout (reference: logging.py:170-210).

    voxelyzeFiles/ and fitnessFiles/ are retained for VXA archiving and
    reference-parity dumps even though evaluation is in-process.
    """
    sub_dirs = [
        "voxelyzeFiles",
        "tempFiles",
        "fitnessFiles",
        "bestSoFar",
        "bestSoFar/fitOnly",
        "bestSoFar/paretoFronts",
        "pickledPops",
    ]
    if save_all_individual_data:
        sub_dirs += ["allIndividualsData"]
    if save_networks:
        sub_dirs += ["network_gml"]
    if save_lineages:
        sub_dirs += ["ancestors"]
    for d in [run_directory] + [os.path.join(run_directory, s) for s in sub_dirs]:
        os.makedirs(d, exist_ok=True)

    if save_all_individual_data:
        path = os.path.join(
            run_directory, "allIndividualsData", "Gen_%04i.txt" % population.gen
        )
        if not os.path.isfile(path):
            make_header(population, path)

    champ_file = os.path.join(run_directory, "bestSoFar", "bestOfGen.txt")
    if not os.path.isfile(champ_file):
        make_header(population, champ_file)


def make_gen_directories(population, run_directory, save_vxa_every, save_networks):
    """Per-generation folders (reference: logging.py:212-225)."""
    print("\n\n")
    print("GENERATION {}".format(population.gen))
    print(
        "Now creating new generation of {} individuals".format(population.pop_size)
    )
    if save_vxa_every > 0 and population.gen % save_vxa_every == 0:
        os.makedirs(
            os.path.join(run_directory, "Gen_%04i" % population.gen), exist_ok=True
        )
    path = os.path.join(
        run_directory, "allIndividualsData", "Gen_%04i.txt" % population.gen
    )
    if not os.path.isfile(path):
        make_header(population, path)


def write_gen_stats(
    population,
    run_directory,
    run_name,
    save_vxa_every,
    save_pareto,
    save_networks,
    save_all_individual_data=True,
    num_inds_to_save=None,
    save_lineages=True,
):
    """Champion row + all-individual rows + optional archives
    (reference: logging.py:228-257)."""
    write_champion_file(population, run_directory)
    if save_all_individual_data:
        record_individuals_data(
            population,
            os.path.join(
                run_directory, "allIndividualsData", "Gen_%04i.txt" % population.gen
            ),
            num_inds_to_save,
        )
    if save_networks and population.gen % save_vxa_every == 0:
        write_networks(population, run_directory)
    if save_lineages:
        population.update_lineages()


def write_champion_file(population, run_directory):
    """Append the best individual's row to bestOfGen.txt."""
    best = max(population, key=lambda ind: ind.fitness)
    path = os.path.join(run_directory, "bestSoFar", "bestOfGen.txt")
    recording_file = open(path, "a")
    objectives_string = ""
    for rank, details in population.objective_dict.items():
        objectives_string += "\t\t{}".format(getattr(best, details["name"]))
        objectives_string += "\t\t{}".format(
            getattr(best, "parent_{}".format(details["name"]))
        )
    recording_file.write(
        "{}\t\t{}\t\t{}\t\t{}\t\t{}{}\n".format(
            population.gen,
            best.id,
            len(best.dominated_by),
            best.parent_id,
            best.variation_type,
            objectives_string,
        )
    )
    recording_file.close()


def write_networks(population, run_directory):
    """Dump each individual's CPPNs as GML (reference: logging.py:290-301)."""
    import networkx as nx

    gen_dir = os.path.join(run_directory, "network_gml", "Gen_%04i" % population.gen)
    os.makedirs(gen_dir, exist_ok=True)
    for ind in population:
        for i, net in enumerate(ind.genotype):
            if not net.direct_encoding:
                g = nx.DiGraph()
                for node, data in net.graph.nodes(data=True):
                    fn = data.get("function")
                    g.add_node(
                        str(node),
                        ntype=data.get("type", ""),
                        function=fn.__name__ if fn is not None else "",
                    )
                for a, b, data in net.graph.edges(data=True):
                    g.add_edge(str(a), str(b), weight=float(data["weight"]))
                nx.write_gml(
                    g,
                    os.path.join(
                        gen_dir, "network--{}--id_{:05d}.txt".format(i, ind.id)
                    ),
                )
