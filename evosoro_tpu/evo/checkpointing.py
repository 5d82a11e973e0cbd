"""Checkpoint resume: unpickle the newest generation and restore RNG state.

Capability parity with the reference's tools/checkpointing.py:10-45,
including the RUNNING/DUPLICATE marker protocol and the EOFError walk-back
to an older checkpoint.
"""

from __future__ import annotations

import glob
import os
import pickle
import random

import numpy as np

from evosoro_tpu.utils.functional import natural_sort


def continue_from_checkpoint(
    directory="tests_data",
    additional_gens=0,
    max_hours_runtime=29,
    max_eval_time=60,
    time_to_try_again=10,
    checkpoint_every=100,
    save_vxa_every=100,
    save_pareto=False,
    save_nets=False,
    save_lineages=False,
):
    """Resume the newest pickled generation (reference: checkpointing.py:10-45)."""
    if os.path.isfile(os.path.join(directory, "RUNNING")):
        # another process is (or appears to be) running this experiment
        open(os.path.join(directory, "DUPLICATE"), "w").close()
        print("Duplicate run; exiting.")
        return None

    # clear partial evaluation artifacts
    for f in glob.glob(os.path.join(directory, "voxelyzeFiles", "*")):
        os.remove(f)

    successful_restart = False
    pickle_idx = 0
    while not successful_restart:
        try:
            pickled_pops = glob.glob(os.path.join(directory, "pickledPops", "*"))
            last_gen = natural_sort(pickled_pops, reverse=True)[pickle_idx]
            with open(last_gen, "rb") as handle:
                [optimizer, random_state, numpy_random_state] = pickle.load(handle)
            successful_restart = True
        except EOFError:
            # corrupted newest pickle: walk back one generation (:32-36)
            pickle_idx += 1
            continue

    random.setstate(random_state)
    np.random.set_state(numpy_random_state)

    max_gens = optimizer.max_gens
    if additional_gens > 0:
        max_gens = optimizer.pop.gen + additional_gens

    optimizer.run(
        continued_from_checkpoint=True,
        max_hours_runtime=max_hours_runtime,
        max_gens=max_gens,
        max_eval_time=max_eval_time,
        time_to_try_again=time_to_try_again,
        checkpoint_every=checkpoint_every,
        save_vxa_every=save_vxa_every,
        save_pareto=save_pareto,
        save_nets=save_nets,
        save_lineages=save_lineages,
    )
    return optimizer
