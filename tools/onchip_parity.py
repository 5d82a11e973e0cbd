"""On-chip fused-kernel vs jnp-scan regression artifact (VERDICT r2 weak #4).

CI runs the fused kernel only in interpreter mode (CPU); a Mosaic compile
change could silently shift on-chip numerics between rounds. This driver runs
BOTH paths on the real TPU for each feature scenario and records the max
absolute position/momentum deviation to ONCHIP_PARITY.json.

Run:    PYTHONPATH=/root/repo:/root/.axon_site \
        PALLAS_AXON_REMOTE_COMPILE=1 python tools/onchip_parity.py
Check:  ... python tools/onchip_parity.py --check
        re-runs all scenarios and FAILS (exit 1) if any exceeds the
        committed bound x CHECK_MARGIN, instead of overwriting the artifact.

Why the drift bands differ by scenario (measured r4, /tmp/drift_probe):
the two paths are algebraically identical but XLA fuses/orders f32 ops
differently. On the `default` dynamic scenario the trajectories are
bit-identical through step 2, a one-ulp (4.7e-10 m) difference appears at
step 4, then amplifies at ~x6/step — the stiff lattice at dt = 0.9x the
stability limit is chaotic — and saturates near the local oscillation
amplitude: 8e-7 @ 8 steps, 3.7e-6 @ 16, 3.4e-5 @ 100. Removing floor and
friction does not change this (no-floor drift is identical, 3.45e-5), so
it is NOT stick/slip ordering; heavily damped / quasi-static scenarios
(volume_effects, mdl_data, collision) stay at 1e-9..5e-7 because the
amplification rate is below 1. The per-scenario committed bound is the
regression reference; drift growing past bound x margin means a real
numerics change, not jitter.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.collision import attach_collision_system
from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import init_state
from evosoro_tpu.core.step import sim_step
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.ops.fused_rollout import fused_rollout, supports

STEPS = 100
BATCH = 8


def _scenario_default(rng):
    s = rng.integers(0, 5, size=(5, 5, 5)).astype(np.int32)
    s[2, 2, 0] = 3
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    return body, SimParams(init_cm_time=0.0), EnvParams(), {}


def _scenario_collision(rng):
    s = np.zeros((4, 1, 1), dtype=np.int32)
    s[:2, 0, 0] = 1
    s[3, 0, 0] = 1
    body = attach_collision_system(
        build_body(s, palette_from_list(evosoro_default_palette()),
                   lattice_dim=0.01))
    sim = SimParams(self_collisions_enabled=True)
    env = EnvParams(gravity_enabled=False, floor_enabled=False,
                    temp_enabled=False)
    st = init_state(body)
    st = st.replace(
        linmom=st.linmom.at[3, 0, 0, 0].set(-2.0 * float(body.mass[3, 0, 0]))
    )
    return body, sim, env, {"state": st}


def _scenario_volume(rng):
    s = rng.integers(1, 5, size=(4, 4, 4)).astype(np.int32)
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    sim = SimParams(volume_effects_enabled=True, init_cm_time=0.0)
    env = EnvParams(temp_amplitude=10.0)
    return body, sim, env, {"state": init_state(body, volume_effects=True)}


def _scenario_fluid(rng):
    s = rng.integers(0, 5, size=(4, 4, 4)).astype(np.int32)
    s[:, :, 0] = 3
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(fluid_environment=True, gravity_enabled=False,
                    floor_enabled=False, aggregate_drag_coefficient=375.0)
    return body, sim, env, {}


def _scenario_fluid_mesh(rng):
    # deformed-mesh facet drag in-kernel (r5): corner-lattice stencil on a
    # shell-padded grid vs envs/drag.py's gather/scatter jnp model
    from evosoro_tpu.envs.drag import attach_mesh_drag

    s = np.zeros((5, 5, 5), dtype=np.int32)
    s[:4, :4, :4] = rng.integers(0, 5, size=(4, 4, 4))
    s[:4, :4, 0] = 3
    body = attach_mesh_drag(
        build_body(s, palette_from_list(evosoro_default_palette()),
                   phase_offset=rng.uniform(-1, 1, size=s.shape)))
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(fluid_environment=True, gravity_enabled=False,
                    floor_enabled=False, aggregate_drag_coefficient=375.0)
    return body, sim, env, {}


def _scenario_bilinear(rng):
    from evosoro_tpu.core.types import MDL_BILINEAR, Material

    soft = [
        Material(m.id, m.name, m.elastic_mod, cte=m.cte,
                 mat_model=MDL_BILINEAR, plastic_mod=m.elastic_mod * 0.01,
                 yield_stress=m.elastic_mod * 1e-4)
        for m in evosoro_default_palette()
    ]
    s = rng.integers(1, 5, size=(4, 4, 4)).astype(np.int32)
    body = build_body(s, palette_from_list(soft),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    return body, SimParams(init_cm_time=0.0), EnvParams(), {}


def _scenario_equilibrium_maxvel(rng):
    s = rng.integers(1, 5, size=(4, 4, 4)).astype(np.int32)
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    sim = SimParams(init_cm_time=0.0, equilibrium_mode=True,
                    max_velocity_enabled=True, max_vox_vel_limit=1e-4)
    return body, sim, EnvParams(), {}


def _scenario_plasticity(rng):
    s = rng.integers(1, 5, size=(4, 4, 4)).astype(np.int32)
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    return body, SimParams(init_cm_time=0.0, plasticity_enabled=True), \
        EnvParams(), {}


def _scenario_mdl_data(rng):
    from evosoro_tpu.core.types import MDL_DATA, Material

    E = 5e6
    mats = [
        Material(1, "d1", mat_model=MDL_DATA, cte=0.02,
                 ss_strain=(0.0, 0.001, 0.05, 0.5),
                 ss_stress=(0.0, E * 0.001, E * 0.0015, E * 0.0017)),
        Material(2, "d2", mat_model=MDL_DATA, cte=-0.02,
                 ss_strain=(0.0, 0.002, 0.1),
                 ss_stress=(0.0, E * 0.004, E * 0.006)),
    ]
    s = rng.integers(1, 3, size=(4, 4, 4)).astype(np.int32)
    body = build_body(s, palette_from_list(mats),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    return body, SimParams(init_cm_time=0.0), \
        EnvParams(temp_amplitude=25.0), {}


def _scenario_bc(rng):
    from evosoro_tpu.core.types import DOF_ALL

    n = 4
    s = np.zeros((n, 2, 2), dtype=np.int32)
    s[:] = 1
    dof = np.zeros((n, 2, 2), dtype=np.int32)
    dof[0] = DOF_ALL
    extf = np.zeros((n, 2, 2, 3))
    extf[-1, :, :, 2] = -0.05
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      lattice_dim=0.01, dof_fixed=dof, external_force=extf)
    return body, SimParams(), EnvParams(temp_enabled=False), {}


def _scenario_features(rng):
    """r4 fitness-feature channels: needle + falling latch + NormDistByVol
    accumulators + windows, all active at once."""
    s = rng.integers(1, 5, size=(4, 4, 4)).astype(np.int32)
    s[2, 2, 3] = 7  # needle
    s[0, 0, 0] = 6  # a foot
    body = build_body(s, palette_from_list(evosoro_default_palette()),
                      phase_offset=rng.uniform(-1, 1, size=s.shape))
    sim = SimParams(init_cm_time=0.0)
    env = EnvParams(needle_in_haystack=True, falling_prohibited=True,
                    norm_dist_by_vol=True, time_between_traces=0.0005,
                    num_trace_steps_in_window=4)
    # the falling latch / windows live in core.rollout's step_fn, not in
    # raw sim_step scans — compare against the rollout-level reference
    return body, sim, env, {"use_rollout": True}


def _scenario_ballistic(rng):
    """Ballistic devo: dynamic per-voxel devo state rebased in-kernel."""
    s = np.zeros((3, 3, 2), dtype=np.int32)
    s[:, :, 0] = 3
    s[:, :, 1] = 1
    L = 0.01
    body = build_body(
        s, palette_from_list(evosoro_default_palette()), lattice_dim=L,
        phase_offset=rng.uniform(-1, 1, size=s.shape) * (s > 0),
        initial_voxel_size=np.full(s.shape, L),
        final_voxel_size=np.full(s.shape, 1.4 * L),
        growth_time=np.full(s.shape, 0.02),
        start_growth_time=np.full(s.shape, 0.002),
    )
    sim = SimParams(init_cm_time=0.001)
    env = EnvParams(growth_amplitude=0.5, num_trace_steps_in_window=4,
                    time_between_traces=0.001, norm_dist_by_vol=True,
                    ballistic_slowdown_fact=1.0, max_slowdown_permitted=-0.5,
                    min_growth_time=0.0)
    st = init_state(body, ballistic_devo=True)
    return body, sim, env, {"state": st, "use_rollout": True}


SCENARIOS = {
    "default": _scenario_default,
    "collision": _scenario_collision,
    "volume_effects": _scenario_volume,
    "fluid_drag": _scenario_fluid,
    "fluid_mesh": _scenario_fluid_mesh,
    "bilinear": _scenario_bilinear,
    "equilibrium_maxvel": _scenario_equilibrium_maxvel,
    "plasticity": _scenario_plasticity,
    "mdl_data": _scenario_mdl_data,
    "bc_regions": _scenario_bc,
    "fitness_features": _scenario_features,
    "ballistic_devo": _scenario_ballistic,
}


# chaotic-saturation jitter: the saturated drift level itself wiggles with
# any legal re-fusion, so enforce bound x margin with an absolute floor of
# one f32 ulp at position scale
CHECK_MARGIN = 3.0
CHECK_FLOOR = 1e-8


def main(check: bool = False):
    assert jax.devices()[0].platform == "tpu", "run on the real chip"
    out = {"metric": "onchip_fused_vs_jnp", "steps": STEPS, "batch": BATCH,
           "scenarios": {}}
    for name, make in SCENARIOS.items():
        rng = np.random.default_rng(3)
        body, sim, env, kw = make(rng)
        assert supports(body, sim, env), name
        dt = jnp.asarray(calc_max_dt(body)) * jnp.asarray(sim.dt_frac)
        state = kw.get("state")
        if state is None:
            state = init_state(body)
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), state
        )

        if kw.get("use_rollout"):
            # features that live in core.rollout's step_fn (falling latch,
            # trace windows, ballistic devo) need the rollout-level ref
            from evosoro_tpu.core.rollout import rollout

            def one(s):
                res = rollout(body, sim, env, num_steps=STEPS, dt=dt,
                              state=s)
                return res.final_state

            ref = jax.jit(jax.vmap(one))(batched)
        else:
            def one(s):
                def step(s, _):
                    return sim_step(s, body, sim, env, dt), ()
                s, _ = jax.lax.scan(step, s, None, length=STEPS)
                return s

            ref = jax.jit(jax.vmap(one))(batched)
        fused, stats = fused_rollout(batched, body, sim, env,
                                     num_steps=STEPS, dt=dt)
        pos_diff = float(np.abs(np.asarray(fused.pos)
                                - np.asarray(ref.pos)).max())
        mom_diff = float(np.abs(np.asarray(fused.linmom)
                                - np.asarray(ref.linmom)).max())
        pos_span = float(np.abs(np.asarray(ref.pos)).max())
        out["scenarios"][name] = {
            "max_abs_pos_diff_m": pos_diff,
            "max_abs_linmom_diff": mom_diff,
            "pos_span_m": pos_span,
            "diverged": bool(np.any(np.asarray(stats.diverged))),
        }
        print(name, out["scenarios"][name])
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ONCHIP_PARITY.json")
    if check:
        with open(path) as f:
            committed = json.load(f)["scenarios"]
        failures = []
        for name, rec in out["scenarios"].items():
            if name not in committed:
                continue  # new scenario: no bound yet
            bound = max(committed[name]["max_abs_pos_diff_m"] * CHECK_MARGIN,
                        CHECK_FLOOR)
            if rec["max_abs_pos_diff_m"] > bound or rec["diverged"]:
                failures.append(
                    f"{name}: {rec['max_abs_pos_diff_m']:.3e} > bound "
                    f"{bound:.3e} (committed "
                    f"{committed[name]['max_abs_pos_diff_m']:.3e})")
        if failures:
            print("ONCHIP PARITY CHECK FAILED:\n  " + "\n  ".join(failures))
            raise SystemExit(1)
        print(f"onchip parity check OK ({len(out['scenarios'])} scenarios "
              f"within committed bound x {CHECK_MARGIN})")
        return
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("written", path)


if __name__ == "__main__":
    main(check="--check" in sys.argv)
