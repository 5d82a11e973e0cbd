"""True multi-process jax.distributed test (SURVEY §4 implication d).

Spawns 2 OS processes ("hosts"), each with 2 virtual CPU devices, brings up
`parallel.mesh.distributed_init` (DCN analog), runs a rollout batch sharded
over the 4-device global mesh, and asserts the gathered per-rollout fitness
equals the single-process result. This exercises the real multi-controller
path — global array construction from process-local shards, cross-process
collectives inside jit, and the process_allgather collection — that the
8-virtual-device single-process tests cannot.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "helpers",
                      "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_rollout_matches_single(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_path = tmp_path / "dist_out.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # workers must not inherit the axon site hook (it imports jax eagerly
    # with the TPU backend); keep only the repo on PYTHONPATH
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), ".."))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=540)
            outs.append(stdout.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    assert out_path.exists(), outs[0][-2000:]
    dist_vals = np.array(json.load(open(out_path))["final_dist"])

    # single-process reference on the same workload
    import jax

    from evosoro_tpu.core.materials import (
        build_body, calc_max_dt, palette_from_list,
    )
    from evosoro_tpu.core.rollout import rollout
    from evosoro_tpu.core.types import (
        EnvParams, SimParams, evosoro_default_palette,
    )

    B, N, STEPS = 8, 3, 10
    rng = np.random.default_rng(0)
    structure = rng.integers(1, 5, size=(N, N, N)).astype(np.int32)
    phases = rng.uniform(-1, 1, size=(B, N, N, N))
    sim = SimParams()
    envp = EnvParams()
    body0 = build_body(structure, palette_from_list(evosoro_default_palette()))
    dt = calc_max_dt(body0) * sim.dt_frac

    @jax.jit
    def run(ph):
        def one(p):
            b = build_body(
                structure, palette_from_list(evosoro_default_palette()),
                phase_offset=p)
            return rollout(b, sim, envp, num_steps=STEPS, dt=dt).final_dist

        return jax.vmap(one)(ph)

    ref_vals = np.asarray(run(phases))
    # the in-test reference runs under conftest's x64 flag (python-scalar
    # promotion differs at ulp level from the workers' default-f32 config)
    np.testing.assert_allclose(dist_vals, ref_vals, rtol=1e-4, atol=1e-9)
