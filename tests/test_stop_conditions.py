"""Stop-condition semantics (reference: VX_Sim.cpp:1398-1510
StopConditionMet; enum VX_Enums.h:55-65). A met condition freezes the
rollout state — time included, so `lifetime`/final_state.time report when
the sim stopped."""

import numpy as np
import jax

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import rollout
from evosoro_tpu.core.types import (
    EnvParams,
    SC_MAX_TIME_STEPS,
    SC_MIN_KE,
    SC_TEMP_CYCLES,
    SimParams,
    evosoro_default_palette,
)


def _column():
    structure = np.zeros((1, 1, 2), dtype=np.int32)
    structure[0, 0, :] = 1
    pal = palette_from_list(evosoro_default_palette())
    return build_body(structure, pal, lattice_dim=0.01)


def test_max_time_steps_freezes_at_count():
    body = _column()
    sim = SimParams(stop_condition_value=50, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    res = jax.jit(lambda: rollout(
        body, sim, env, num_steps=200, dt=dt,
        stop_condition_type=SC_MAX_TIME_STEPS,
    ))()
    # stops once the step counter passes 50 (+1 step of slack for the
    # pre-step check ordering)
    t = float(res.final_state.time)
    assert 50 * dt <= t <= 53 * dt


def test_temp_cycles_stop():
    body = _column()
    sim = SimParams(stop_condition_value=2.0, init_cm_time=0.0)
    env = EnvParams(temp_period=0.01)
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    res = jax.jit(lambda: rollout(
        body, sim, env, num_steps=100, dt=dt,
        stop_condition_type=SC_TEMP_CYCLES,
    ))()
    t = float(res.final_state.time)
    assert 0.02 < t < 0.02 + 3 * dt  # 2 temperature cycles of 0.01 s


def test_min_ke_stops_settled_body():
    """A passive column settles; after the KE history fills (10 samples,
    1000 steps apart) with near-zero energy, SC_MIN_KE freezes the sim."""
    body = _column()
    sim = SimParams(stop_condition_value=1e-4, init_cm_time=0.0)
    env = EnvParams(temp_enabled=False)
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    steps = 12000
    res = jax.jit(lambda: rollout(
        body, sim, env, num_steps=steps, dt=dt,
        stop_condition_type=SC_MIN_KE,
    ))()
    t = float(res.final_state.time)
    # must have stopped well before the full horizon (ring fills at 9000
    # pushes + settling time) but after the ring could possibly fill
    assert t < (steps - 500) * dt
    assert t > 9000 * dt * 0.9
