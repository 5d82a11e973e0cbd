"""Golden-trajectory parity vs the reference land_water fork (the aquatic
engine: facet drag on the deformed surface mesh, neutral buoyancy, the
fork's simpler actuation — SURVEY.md §2.3).

Compares per-voxel positions step-for-step between the fork's C++ engine
(tools/ref_dump_main.cpp linked against _voxcad_land_water) and our engine
with `attach_mesh_drag` at the same dt."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from evosoro_tpu.core.materials import calc_max_dt  # noqa: E402
from evosoro_tpu.core.rollout import init_state  # noqa: E402
from evosoro_tpu.core.step import sim_step  # noqa: E402
from evosoro_tpu.core.types import (  # noqa: E402
    EnvParams,
    SimParams,
    evosoro_default_palette,
)
from evosoro_tpu.envs.drag import attach_mesh_drag  # noqa: E402
from evosoro_tpu.io.vxa import load_vxa, write_vxa  # noqa: E402
from tools.reference_engine import build_dump, run_dump  # noqa: E402

DUMP = build_dump(fork="land_water")
pytestmark = pytest.mark.skipif(
    DUMP is None, reason="land_water reference toolchain unavailable"
)


def _swimmer(n=4, seed=5):
    rng = np.random.default_rng(seed)
    structure = rng.integers(0, 2, size=(n, n, n)).astype(np.int32)
    structure = np.where(structure > 0, 3, 0).astype(np.int32)  # muscle/empty
    structure[:, :, 0] = 3  # connected base plate
    phase = rng.uniform(-1, 1, size=(n, n, n))
    return structure, phase


def _our_positions(vxa, n_steps):
    doc = load_vxa(vxa)
    body = attach_mesh_drag(doc.build_body(dtype=np.float64))
    dt = float(calc_max_dt(body)) * float(doc.sim.dt_frac)
    state = init_state(body)
    step = jax.jit(lambda s: sim_step(s, body, doc.sim, doc.env, dt))
    occ = np.asarray(body.occ)
    # reference voxel order: x-fastest scan of the VXC data
    # (VX_Sim.cpp Import iterates GetStArraySize indices)
    order = np.argwhere(occ.transpose(2, 1, 0)).astype(int)  # (N, [z,y,x])
    rows = []
    for _ in range(n_steps):
        state = step(state)
        p = np.asarray(state.pos)
        rows.append(p[order[:, 2], order[:, 1], order[:, 0]])
    return np.array(rows), dt


def test_landwater_swimmer_trajectory(tmp_path):
    structure, phase = _swimmer()
    sim = SimParams(stop_condition_value=1.0, init_cm_time=0.001)
    env = EnvParams(
        fluid_environment=True,
        aggregate_drag_coefficient=0.5 * 1.5 * 1000.0,  # swimming_basic.py
    )
    vxa = tmp_path / "swimmer.vxa"
    write_vxa(vxa, structure, evosoro_default_palette(), sim=sim, env=env,
              voxel_arrays={"PhaseOffset": phase},
              fitness_file_name="out.xml")

    steps = 400
    times, ref_pos, ref_scale = run_dump(vxa, steps, fork="land_water")
    ours, dt = _our_positions(vxa, min(steps, len(times)))

    n = min(len(ours), len(ref_pos))
    assert n >= 300
    err = np.abs(ours[:n] - ref_pos[:n]).max()
    # bit-level agreement is the bar for the terrestrial engine; the aquatic
    # fork adds the deformed-mesh drag chain (strain-based corners, facet
    # areas/normals) — still sub-micrometer over hundreds of steps on a
    # centimeter-scale body
    assert err < 1e-7, f"max |pos diff| {err}"


def test_landwater_no_gravity_no_floor(tmp_path):
    """Neutral buoyancy: in the fluid environment the reference disables
    gravity and floor (land_water VXS_Voxel.cpp:357, :467) — a passive body
    must not sink."""
    structure = np.full((3, 3, 2), 1, dtype=np.int32)
    sim = SimParams(stop_condition_value=1.0, init_cm_time=0.001)
    env = EnvParams(fluid_environment=True, aggregate_drag_coefficient=100.0)
    vxa = tmp_path / "float.vxa"
    write_vxa(vxa, structure, evosoro_default_palette(), sim=sim, env=env,
              fitness_file_name="out.xml")
    times, ref_pos, _ = run_dump(vxa, 100, fork="land_water")
    ours, _ = _our_positions(vxa, min(100, len(times)))
    n = min(len(ours), len(ref_pos))
    err = np.abs(ours[:n] - ref_pos[:n]).max()
    assert err < 1e-9, f"max |pos diff| {err}"
    # CoM z unchanged (no gravity)
    assert abs(ours[n - 1][:, 2].mean() - ours[0][:, 2].mean()) < 1e-9
