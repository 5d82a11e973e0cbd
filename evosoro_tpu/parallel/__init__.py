"""Device-mesh parallelism for rollout batches.

The reference's entire distributed backend is one OS process per individual
plus filesystem polling (reference: tools/evaluation.py:89-90, 101-211 —
SURVEY.md §2.4). Here the same population/candidate parallelism is SPMD: the
rollout batch is sharded over a named `"rollout"` mesh axis (ICI within a
slice, DCN across hosts), fitness/cost reductions ride collectives, and the
host only orchestrates generations/solves.
"""

from evosoro_tpu.parallel.mesh import (  # noqa: F401
    distributed_init,
    make_mesh,
    replicate,
    shard_batch,
    sharded_rollout_fn,
    scaling_report,
)
