"""In-process batched TPU evaluation of a population.

This replaces the reference's process-per-individual evaluation bridge
(tools/evaluation.py:18-219: one `./voxelyze` subprocess per robot plus
filesystem polling) with ONE jitted, vmapped rollout over the whole
population — the SPMD re-design of the reference's "distributed backend"
(SURVEY.md §2.4). Per-individual crash recovery becomes per-rollout
divergence masks; the md5 dedup cache and objective assignment semantics are
kept (evaluation.py:72-81, 160-177).
"""

from __future__ import annotations

import copy
import time

import jax
import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import rollout
from evosoro_tpu.core.types import evosoro_default_palette

# phenotype-map tags -> build_body kwargs (reference: VX_Object.h:183-258)
_TAG_TO_FIELD = {
    "<Data>": "structure",
    "<PhaseOffset>": "phase_offset",
    "<FinalPhaseOffset>": "final_phase_offset",
    "<TempAmpDamp>": "temp_amp_damp",
    "<FinalTempAmpDamp>": "final_temp_amp_damp",
    "<InitialVoxelSize>": "initial_voxel_size",
    "<FinalVoxelSize>": "final_voxel_size",
    "<GrowthTime>": "growth_time",
    "<StartGrowthTime>": "start_growth_time",
    "<Stiffness>": "stiffness",
}

# result-XML tags -> RolloutResult attributes (reference: VX_SimGA.cpp:140-203)
_OBJECTIVE_TAG_TO_RESULT = {
    "<NormFinalDist>": "norm_final_dist",
    "<normAbsoluteDistance>": "norm_final_dist",
    "<normAbsoluteDisplacement>": "norm_final_dist",
    "<FinalDist>": "final_dist",
    "<finalDistY>": "final_dist_y",
    "<normDistY>": "final_dist_y",
    "<NormRegimeDist>": "norm_regime_dist",
    "<NormFrozenDist>": "norm_frozen_dist",
    "<AnteriorDist>": "anterior_dist",
    "<PosteriorDist>": "posterior_dist",
    "<AnteriorY>": "anterior_y",
    "<PosteriorY>": "posterior_y",
    "<EndOfLifePosteriorY>": "end_of_life_posterior_y",
    "<FallAdjPostY>": "fall_adj_post_y",
    "<NumTouchingFloor>": "num_touching_floor",
    "<NumNonFeetTouchingFloor>": "num_non_feet_touching_floor",
    "<Lifetime>": "lifetime",
    "<FoundNeedleInHaystack>": "found_needle",
    "<PushDist>": "push_dist",
    "<WindowDist>": "norm_window_dist",
}

_compiled_cache: dict = {}


def _palette_digest(palette):
    """Stable identity for a palette baked into a cached trace: hash of the
    per-material scalar arrays' bytes (two palettes differing only in e.g.
    elastic_mod must not share a compiled evaluator)."""
    import hashlib

    h = hashlib.md5()
    for leaf in jax.tree_util.tree_leaves(palette):
        arr = np.asarray(leaf)
        h.update(arr.shape.__repr__().encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def _phenotype_fields(ind, env):
    """Extract build_body kwargs + env overrides from an individual's
    phenotype mapping (mirrors write_voxelyze_file's tag dispatch,
    read_write_voxelyze.py:44-48, 350-397)."""
    fields = {}
    env_overrides = {}
    for name, details in ind.genotype.to_phenotype_mapping.items():
        if details["env_kws"] is not None:
            for env_key, env_func in details["env_kws"].items():
                env_overrides[env_key] = env_func(details["state"])
            continue
        tag = details["tag"]
        if tag in _TAG_TO_FIELD:
            state = details["state"]
            if details["output_type"] is int:
                state = np.asarray(state, dtype=np.int32)
            else:
                state = np.asarray(state, dtype=np.float64)
            fields[_TAG_TO_FIELD[tag]] = state
    return fields, env_overrides


def _np_max_dt(structure, e_mod_default, stiffness, palette_np,
               volume_effects=False):
    """Host-side CalcMaxDt (reference: VX_Sim.cpp:1693-1727) for computing
    the static scan length before tracing. With `volume_effects` the bond
    stiffness for the stability bound is Eh = E/((1-2u)(1+u)) (rest value
    of GetEffectiveStiffness, VXS_Bond.h:34)."""
    occ = structure > 0
    e = palette_np["elastic_mod"][structure]
    if stiffness is not None:
        e = np.where((stiffness > 0) & occ, stiffness, e)
    if volume_effects:
        u = palette_np["poisson"][structure]
        e = e / np.maximum((1.0 - 2.0 * u) * (1.0 + u), 1e-12)
    rho = palette_np["density"][structure]
    max_f2 = 0.0
    for d in range(3):
        occ2 = np.roll(occ, -1, axis=d)
        edge = np.ones_like(occ)
        sl = [slice(None)] * 3
        sl[d] = -1
        edge[tuple(sl)] = False
        mask = occ & occ2 & edge
        if not mask.any():
            continue
        e2 = np.roll(e, -1, axis=d)
        comp_e = np.where(e + e2 > 0, 2.0 * e * e2 / np.maximum(e + e2, 1e-30), 0.0)
        # a1 = E*A/L = E*L (A = L², /L); mass = rho*L³ → a1/m = E/(rho*L²),
        # L cancels out of the relative ordering but not the magnitude
        m1 = rho
        m2 = np.roll(rho, -1, axis=d)
        f2 = np.where(mask, comp_e / np.maximum(m1, 1e-30), 0.0)
        f2b = np.where(mask, comp_e / np.maximum(m2, 1e-30), 0.0)
        max_f2 = max(max_f2, float(f2.max()), float(f2b.max()))
    return max_f2  # caller applies the L² and 2π factors


def make_fused_evaluator(palette, grid_shape, num_steps, field_names,
                         lattice_dim, sim_params, env_flags_src,
                         interpret=False, with_collision=False, mesh=None,
                         fluid_mesh=False, batch_block=8):
    """Batched evaluation through the fused multi-step Pallas kernel
    (ops/fused_rollout.py): per-individual bodies, envs, dt and stop time
    ride per-robot channels, so the whole generation is ONE kernel launch
    with the rollout state VMEM-resident. ~10x the jnp-scan evaluator on
    TPU for the default feature envelope. `with_collision`: the returned fn
    takes a per-individual dense (B, Vp, Vp) pair-stiffness batch (built
    host-side by `_dispatch_batch`) as a 6th argument.

    `mesh`: optional jax.sharding.Mesh with a "rollout" axis. With >1
    device the kernel launch is wrapped in shard_map so each device runs
    its own grid over its local batch shard (pallas_call has no SPMD rule;
    plain-jit sharding would gather) — the packing/metrics stages are
    elementwise over the batch, so GSPMD shards those automatically. The
    batch must divide by n_devices x batch_block.

    `batch_block`: robots per Pallas grid program. 8 is the throughput
    sweet spot; _dispatch_batch narrows it (4/2) for big self-collision
    bodies whose per-individual (batch_block, Vp, Vp) pair blocks would
    outgrow VMEM at 8 — a narrower block beats the ~9-20x jnp cliff."""
    # the env/sim flag set and physics scalars are baked into the kernel
    # closure, so they MUST be part of the cache key — a same-shape
    # experiment with different features (e.g. fluid on/off) is a
    # different kernel
    feature_key = (
        bool(env_flags_src.gravity_enabled),
        bool(env_flags_src.floor_enabled),
        bool(env_flags_src.sticky_floor),
        bool(env_flags_src.temp_enabled),
        bool(env_flags_src.vary_temp_enabled),
        bool(env_flags_src.fluid_environment),
        bool(sim_params.volume_effects_enabled),
        bool(sim_params.equilibrium_mode),
        bool(sim_params.max_velocity_enabled),
        float(sim_params.mid_life_freeze_time),
        float(sim_params.stop_condition_value),
        float(sim_params.init_cm_time),
        float(sim_params.min_temp_fact),
        float(sim_params.dt_frac),
        float(sim_params.slow_damping_z),
        float(sim_params.bond_damping_z),
        float(sim_params.col_damping_z),
        float(sim_params.max_vox_vel_limit),
        bool(sim_params.plasticity_enabled),
        int(np.asarray(palette.mat_model).max()),
        _palette_digest(palette),
        bool(env_flags_src.needle_in_haystack),
        bool(env_flags_src.falling_prohibited),
        bool(env_flags_src.norm_dist_by_vol),
        int(env_flags_src.num_trace_steps_in_window),
        float(env_flags_src.time_between_traces),
        float(env_flags_src.normalization_exponent),
        float(env_flags_src.min_growth_time),
        float(env_flags_src.ballistic_slowdown_fact),
        float(env_flags_src.max_slowdown_permitted),
    )
    from evosoro_tpu.ops import fused_rollout as _fr_key  # noqa: F401
    import sys as _sys
    # sources bake (base, amp, freq, enabled) into the kernel closure via
    # _source_statics — the full tuple must key the cache, not just base_pos
    feature_key = feature_key + (
        _sys.modules["evosoro_tpu.ops.fused_rollout"]._source_statics(
            env_flags_src),)
    mesh_key = None if mesh is None else (
        tuple(mesh.axis_names), tuple(d.id for d in mesh.devices.flat))
    key = ("fused", grid_shape, num_steps, tuple(sorted(field_names)),
           float(lattice_dim), interpret, with_collision, feature_key,
           mesh_key, bool(fluid_mesh), int(batch_block))
    if key in _compiled_cache:
        return _compiled_cache[key]

    from evosoro_tpu.core.constants import DEFAULT_PRECISION
    from evosoro_tpu.core.rollout import init_state
    from evosoro_tpu.ops import fused_rollout as _  # noqa: F401 (module init)
    import sys

    fr = sys.modules["evosoro_tpu.ops.fused_rollout"]

    if sim_params.equilibrium_mode:
        # reference EnableEquilibriumMode damping overrides
        sim_params = sim_params.replace(
            bond_damping_z=0.1, slow_damping_z=0.0,
            max_velocity_enabled=False)

    X, Y, Z = grid_shape
    V = X * Y * Z
    Vp = -(-V // 128) * 128

    # MDL_DATA palettes stream per-individual point tables as an optional
    # (B, 2P+3, Vp) kernel input, mirroring the bilinear/collision streaming
    # (reference honors MDL_DATA in every sim: VX_Object.cpp:1472-1535)
    has_mdl = palette.ss_strain is not None

    scalars = fr.kernel_scalars(lattice_dim, sim_params, env_flags_src)
    flags = dict(
        fr.kernel_env_flags(sim_params, env_flags_src),
        # bilinear/MDL_DATA palettes run the in-kernel nonlinear stress path
        nonlinear=bool(np.any(np.asarray(palette.mat_model) >= 2)),
        mdl_data=has_mdl,
        # deformed-mesh facet drag in-kernel; the caller pads the grid with
        # the one-voxel corner shell (_dispatch_batch)
        fluid_mesh=bool(fluid_mesh),
        # devo code paths follow which per-voxel fields the genome evolves
        # (build_body sets the matching using_* statics from the same kwargs)
        use_init_size="initial_voxel_size" in field_names,
        use_final_size="final_voxel_size" in field_names,
        use_growth_t="growth_time" in field_names,
        use_final_phase="final_phase_offset" in field_names,
        use_final_ad="final_temp_amp_damp" in field_names,
        ballistic=bool(int(env_flags_src.num_trace_steps_in_window) > 0
                       and "final_voxel_size" in field_names),
    )
    dt_frac = float(sim_params.dt_frac)
    init_cm_time = float(sim_params.init_cm_time)
    min_temp_fact = float(sim_params.min_temp_fact)

    def pack_one(structure, voxel_fields, env1, stop_time):
        body = build_body(
            structure, palette, lattice_dim=lattice_dim, **voxel_fields
        )
        dt = calc_max_dt(
            body, sim_params.volume_effects_enabled
        ) * dt_frac
        state = init_state(
            body, volume_effects=sim_params.volume_effects_enabled,
            ballistic_devo=flags["ballistic"],
        )
        sp = fr.pack_state_single(state, Vp)
        bp = fr.pack_body(body, Vp)[0]
        total_mass = jnp.sum(body.mass)
        inv_m = jnp.where(total_mass > 0, 1.0 / total_mass, 0.0)
        row = jnp.zeros((fr.C_STAT,), jnp.float32)
        row = row.at[fr._S_LASTTR].set(-1.0)
        row = row.at[fr._S_LASTWIN].set(-1.0)
        row = row.at[fr._S_DT].set(dt.astype(jnp.float32))
        row = row.at[fr._S_INV_MASS].set(inv_m.astype(jnp.float32))
        row = row.at[fr._S_STOP].set(jnp.asarray(stop_time, jnp.float32))
        q32 = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
        row = row.at[fr._S_TAMP].set(q32(env1.temp_amplitude))
        row = row.at[fr._S_TPER].set(q32(env1.temp_period))
        row = row.at[fr._S_INITCM].set(q32(init_cm_time))
        row = row.at[fr._S_GRAV].set(q32(env1.grav_acc))
        row = row.at[fr._S_MINTF].set(q32(min_temp_fact))
        row = row.at[fr._S_GAMP].set(q32(env1.growth_amplitude))
        row = row.at[fr._S_DRAGC].set(q32(env1.aggregate_drag_coefficient))
        row = row.at[fr._S_KE:fr._S_KE + 6].set(-1.0)
        if has_mdl:
            return sp, bp, row, fr.pack_ss_tables(body, Vp)[0]
        return sp, bp, row, jnp.zeros((0, Vp), jnp.float32)

    flags["collision"] = bool(with_collision)

    # measured on-chip: wider batch blocks gain only ~3% even for 1-2-tile
    # bodies (the per-step op chain pipelines across grid programs), while
    # padding small pops to wider blocks costs real work — keep 8 except
    # where the caller narrows it for VMEM
    def _kernel_call(sp, bp, rows, collision_packed, ss_packed=None):
        return fr._fused_call(
            sp, bp, rows, None, collision_packed, ss_packed,
            num_steps=num_steps,
            grid_shape=grid_shape,
            batch_block=batch_block,
            n_knots=0,
            interpret=interpret,
            scalars=tuple(sorted(scalars.items())),
            flags=tuple(sorted(flags.items())),
            prec=DEFAULT_PRECISION,
        )

    if mesh is not None and np.prod(mesh.devices.shape) > 1:
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.7 layout
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        spec = lambda x: P(ax, *([None] * (x.ndim - 1)))  # noqa: E731

        def _kernel_sharded(sp, bp, rows, collision_packed, ss_packed=None):
            args = (sp, bp, rows, collision_packed, ss_packed)
            in_specs = jax.tree_util.tree_map(spec, args)
            out_specs = (spec(sp), spec(rows))
            return shard_map(
                _kernel_call, mesh=mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False,
            )(*args)

        kernel_dispatch = _kernel_sharded
    else:
        kernel_dispatch = _kernel_call

    @jax.jit
    def fn(structures, voxel_fields, _sim_unused, env_batch, stop_time,
           collision_packed=None):
        sp, bp, rows, ssp = jax.vmap(
            lambda s, v, e: pack_one(s, v, e, stop_time)
        )(structures, voxel_fields, env_batch)
        out_state, out_stats = kernel_dispatch(
            sp, bp, rows, collision_packed, ssp if has_mdl else None)
        return fr.packed_metrics(
            out_state, bp, out_stats, lattice_dim,
            ndbv=flags["ndbv"], falling=flags["falling"],
            needle=flags["needle"], window=flags["window"],
            # the fall-over penalty uses the WORKSPACE z extent — subtract
            # the corner-shell pad layer if present
            grid_z=grid_shape[2] - (1 if fluid_mesh else 0),
        )

    _compiled_cache[key] = fn
    return fn


def make_batched_evaluator(palette, grid_shape, num_steps, field_names,
                           env_fields, with_collision=False,
                           with_mesh_drag=False):
    """Build + cache one jitted batched evaluation function.

    Keyed on (grid shape, steps, which per-voxel fields vary, which env
    scalars vary, collision, mesh drag) — everything else is baked into the
    trace. `with_collision`: the returned fn takes a stacked per-individual
    `CollisionSystem` (surface-padded to a common S) as a 6th argument.
    `with_mesh_drag`: the fn takes a stacked per-individual `MeshDragSystem`
    (tri/vert-padded to common T, V) as the following argument — fluid
    rollouts then use the parity-validated deformed-mesh facet drag
    (land_water VX_Sim.cpp:1516-1600) instead of the kernel's voxel-face
    approximation.
    """
    key = (grid_shape, num_steps, tuple(sorted(field_names)),
           tuple(sorted(env_fields)), with_collision, with_mesh_drag,
           _palette_digest(palette))
    if key in _compiled_cache:
        return _compiled_cache[key]

    def eval_one(structure, voxel_fields, sim, env, stop_time, colsys=None,
                 meshdrag=None):
        body = build_body(
            structure,
            palette,
            lattice_dim=env.lattice_dim,
            **voxel_fields,
        )
        if colsys is not None:
            body = body.replace(collision=colsys)
        if meshdrag is not None:
            body = body.replace(mesh_drag=meshdrag)
        dt = calc_max_dt(body) * sim.dt_frac
        res = rollout(
            body,
            sim,
            env,
            num_steps=num_steps,
            dt=dt,
            stop_time=stop_time,
        )
        return dict(
            norm_final_dist=res.norm_final_dist,
            final_dist_y=res.final_dist_y,
            diverged=res.diverged,
            final_cm=res.final_cm,
            ini_cm=res.ini_cm,
            final_time=res.final_state.time,
            # full fitness surface so featureful experiments (needle,
            # falling, NormDistByVol, windows, afterlife) work on this
            # fallback path too, mirroring the fused packed_metrics keys
            final_dist=res.final_dist,
            norm_regime_dist=res.norm_regime_dist,
            norm_frozen_dist=res.norm_frozen_dist,
            anterior_dist=res.anterior_dist,
            posterior_dist=res.posterior_dist,
            anterior_y=res.anterior_y,
            posterior_y=res.posterior_y,
            end_of_life_posterior_y=res.end_of_life_posterior_y,
            fall_adj_post_y=res.fall_adj_post_y,
            num_touching_floor=res.num_touching_floor,
            num_non_feet_touching_floor=res.num_non_feet_touching_floor,
            lifetime=res.lifetime,
            found_needle=res.found_needle,
            push_dist=res.push_dist,
            norm_window_dist=res.norm_window_dist,
        )

    in_axes = [0, 0, None, 0, None]
    if with_collision:
        in_axes.append(0)
    if with_mesh_drag:
        if not with_collision:
            # keep meshdrag in its keyword slot
            def eval_md(structure, voxel_fields, sim, env, stop_time,
                        meshdrag):
                return eval_one(structure, voxel_fields, sim, env,
                                stop_time, None, meshdrag)

            fn = jax.jit(jax.vmap(eval_md, in_axes=tuple(in_axes + [0])))
            _compiled_cache[key] = fn
            return fn
        in_axes.append(0)
    fn = jax.jit(jax.vmap(eval_one, in_axes=tuple(in_axes)))
    _compiled_cache[key] = fn
    return fn


def evaluate_all(
    sim,
    env,
    pop,
    print_log=None,
    save_vxa_every=0,
    run_directory=None,
    run_name=None,
    max_eval_time=60,
    time_to_try_again=10,
    save_lineages=False,
    batch_pad=8,
    devices=None,
):
    """Evaluate every unevaluated individual in `pop` in one batched TPU
    dispatch. Signature-compatible with the reference's evaluate_all
    (tools/evaluation.py:18) so optimizers are drop-in.

    `sim`/`env` are evo.base.Sim / evo.base.Env experiment containers.

    `devices`: devices to spread the generation over (default: ALL local
    devices — a multi-chip host runs the evolutionary loop sharded without
    user plumbing; pass `[jax.devices()[0]]` to force single-device). The
    fused kernel rides shard_map over a "rollout" mesh axis; small
    populations use only as many devices as they can fill (>=1
    batch_block of 8 rollouts per device).

    `max_eval_time` / `time_to_try_again` are accepted for signature
    compatibility but intentionally unused: they are the reference's
    crashed-subprocess retry/give-up timers (tools/evaluation.py:107-119,
    one OS process + fitness-file polling per robot). In-process batched
    evaluation has no analog failure mode — a sim that the reference would
    "time out" diverges instead, and the divergence latch already assigns
    the worst fitness (same outcome, deterministic).
    """
    start = time.time()
    from evosoro_tpu.evo.logging import PrintLog

    if print_log is None:
        print_log = PrintLog()

    to_eval = []
    for ind in pop:
        ind.md5 = ind.genotype.phenotype_md5()

        if not ind.phenotype.is_valid():
            for rank, goal in pop.objective_dict.items():
                if goal["name"] != "age":
                    setattr(ind, goal["name"], goal["worst_value"])
            print_log.message("Skipping invalid individual")
        elif env.actuation_variance == 0 and ind.md5 in pop.already_evaluated:
            for rank, goal in pop.objective_dict.items():
                if goal["tag"] is not None:
                    setattr(ind, goal["name"], pop.already_evaluated[ind.md5][rank])
        else:
            to_eval.append(ind)

    if to_eval:
        _dispatch_batch(sim, env, pop, to_eval, print_log,
                        batch_pad=batch_pad, devices=devices)

    # bookkeeping identical to the reference path (evaluation.py:160-184)
    for ind in to_eval:
        pop.already_evaluated[ind.md5] = [
            getattr(ind, details["name"])
            for rank, details in pop.objective_dict.items()
        ]
        pop.all_evaluated_individuals_ids += [ind.id]
        pop.total_evaluations += 1
        if ind.fitness > pop.best_fit_so_far:
            pop.best_fit_so_far = ind.fitness
            if run_directory is not None:
                _archive_best(sim, env, ind, run_directory, run_name, pop.gen)

    print_log.message(
        "All evals finished in {:.3f} seconds".format(time.time() - start)
    )
    print_log.message("total_evaluations: {}".format(pop.total_evaluations))
    return pop


# phase timing of the most recent _dispatch_batch, for observability and
# tools/evobench.py's generations/hour breakdown (host prep vs device time)
LAST_DISPATCH_TIMING: dict = {}


def _ladder_count(m: int) -> int:
    """Smallest {1, 1.5}·2^k integer ≥ m — the batch-size ladder (in
    batch_pad units). Same motivation as `_ladder_steps`: every distinct
    padded batch shape is a fresh XLA program; the ladder bounds the
    number of compiled programs at ≤33% padded-lane cost."""
    if m <= 1:
        return 1
    k = int(np.floor(np.log2(m)))
    for c in (2 ** k, 3 * 2 ** (k - 1) if k >= 1 else 2 ** k, 2 ** (k + 1)):
        if c >= m:
            return int(c)
    return int(2 ** (k + 1))


def _ladder_count_down(m: int) -> int:
    """Largest {1, 1.5}·2^k integer ≤ m (≥1) — used to size dispatch
    slices so successive generations' slice shapes repeat exactly."""
    m = max(1, m)
    k = int(np.floor(np.log2(m)))
    c = 3 * 2 ** (k - 1) if k >= 1 else 1
    return int(c) if c <= m else int(2 ** k)


def _ladder_steps(n: int) -> int:
    """Quantize a scan length UP to the {1, 1.25, 1.5, 1.75}·2^k·256
    ladder. The exact worst-case dt drifts with every mutation; an
    unquantized scan length would give the rollout program a fresh jit
    cache key — and a full recompile — almost every generation. The ladder
    costs ≤25% padded steps (stopped rollouts freeze, so padded steps are
    cheap-but-not-free dense compute) and bounds the number of distinct
    compiled programs to a handful per experiment."""
    base = 256
    while base < n:
        base *= 2
    if base == 256:
        return 256
    lo = base // 2
    for m in (1.25, 1.5, 1.75, 2.0):
        v = int(lo * m)
        if v >= n:
            return v
    return base


def _dispatch_batch(sim, env, pop, inds, print_log, batch_pad=8,
                    devices=None, _bucketed=False):
    from evosoro_tpu.core.materials import devo_params_from_vxa
    from evosoro_tpu.core.types import EnvParams, SimParams  # noqa: F401

    _t0 = time.time()
    _tm = LAST_DISPATCH_TIMING
    _tm.clear()

    grid = inds[0].genotype.orig_size_xyz
    sim_params_for_devo = sim.to_sim_params()
    _DEVO_KEYS = ("initial_voxel_size", "final_voxel_size", "growth_time",
                  "start_growth_time")
    # collect per-individual fields
    all_fields = []
    all_env = []
    for ind in inds:
        fields, env_over = _phenotype_fields(ind, env)
        if "structure" not in fields:
            # fixed-topology experiments: all voxels material 3
            # (reference: read_write_voxelyze.py:352-359)
            fields["structure"] = np.full(grid, 3, dtype=np.int32)
        this_env = copy.copy(env)
        for k, v in env_over.items():
            setattr(this_env, k, v)
        if env.actuation_variance > 0:
            # noise injection into muscle CTE per evaluation: the reference
            # writes CTE·(1 + U(0, actuation_variance)) into the palette with
            # an INDEPENDENT uniform draw per muscle material
            # (read_write_voxelyze.py:243, 267); replicate as a per-voxel
            # CTE multiplier field keyed on material id
            scale = np.ones(tuple(grid), dtype=np.float32)
            struct_arr = fields["structure"]
            for m in _experiment_palette(env):
                if m.cte != 0.0:
                    scale[struct_arr == m.id] = 1.0 + np.random.uniform(
                        0, env.actuation_variance
                    )
            fields["cte_scale"] = scale
        env_params = this_env.to_env_params()
        if any(k in fields for k in _DEVO_KEYS):
            # the genome's devo outputs are normalized sigmoids; the engine
            # maps them to physical sizes and absolute times at import
            # (reference: VX_Sim.cpp:878-965; materials.devo_params_from_vxa)
            raw = {k.replace("_", ""): fields.pop(k, None)
                   for k in _DEVO_KEYS}
            fields.update(devo_params_from_vxa(
                raw, sim_params_for_devo, env_params,
                env.lattice_dimension, fields["structure"],
            ))
        all_fields.append(fields)
        all_env.append(env_params)

    field_names = sorted(set().union(*[set(f) for f in all_fields]) - {"structure"})
    B = len(inds)

    palette = palette_from_list(_experiment_palette(env))
    palette_np = {
        "elastic_mod": np.asarray(palette.elastic_mod),
        "density": np.asarray(palette.density),
        "poisson": np.asarray(palette.poisson),
    }
    L = env.lattice_dimension
    vol_on = bool(sim_params_for_devo.volume_effects_enabled)
    stop_time = float(sim.simulation_time)

    def _steps_for(f):
        # per-design scan length: CalcMaxDt is design-dependent
        # (reference: VX_Sim.cpp:1693-1727)
        f2 = _np_max_dt(f["structure"], None, f.get("stiffness"),
                        palette_np, volume_effects=vol_on)
        freq = np.sqrt(f2 / (L * L))
        mdt = ((1.0 / (2 * np.pi * freq)) * sim.dt_frac
               if freq > 0 else 1e-4)
        s = int(np.ceil(stop_time / mdt)) + 1
        if vol_on:
            # in-step dt recomputation can shrink dt under compression
            s = int(np.ceil(s * 1.15))
        return _ladder_steps(s)

    per_steps = [_steps_for(f) for f in all_fields]
    buckets = sorted(set(per_steps))

    # per-launch batch cap: with self-collision on, every individual ships
    # a dense (Vp, Vp) pair field — a 1024-individual 10^3 generation is
    # ~3.5 GB of launch operands, which overruns the axon tunnel's
    # per-launch budget (observed: TPU worker restart mid-execution).
    # Slice generations so one launch stays inside ~EVOSORO_TPU_PAIR_BYTES
    # (default 1 GiB) of pair fields; slices are dispatched back-to-back
    # and jax's async dispatch overlaps transfer with compute.
    import os as _os

    cap = len(inds)
    coll_on = bool(sim_params_for_devo.self_collisions_enabled)
    # kernel lane count, including the one-voxel corner shell the in-kernel
    # mesh-drag stencil pads onto fluid grids further down
    _mesh_pad = int(bool(getattr(all_env[0], "fluid_environment", False))
                    and getattr(env, "drag_model", "mesh") == "mesh")
    Vp_est = -(-int(np.prod([g + _mesh_pad for g in grid])) // 128) * 128
    if coll_on:
        # per-individual dense pair fields ride a (batch_block, Vp, Vp)
        # VMEM block; at batch_block=8 that fits up to Vp=1024 (104.8M
        # scoped VMEM measured, just under v5e's 128M). Bigger bodies
        # narrow the block (up to 2304 lanes at batch_block=1) instead of
        # falling off the fused path — the jnp fallback costs ~2-20x
        # (FALLBACK.json).
        from evosoro_tpu.ops.fused_rollout import collision_batch_block

        batch_pad = collision_batch_block(Vp_est, batch_pad)
        budget = int(_os.environ.get("EVOSORO_TPU_PAIR_BYTES", 2 ** 30))
        cap = max(batch_pad, budget // max(1, Vp_est * Vp_est * 4))

    # launch-DURATION cap: a stiff dt bucket can make one launch run for
    # minutes (137 individuals x 82k steps measured ~70 s device — the
    # tunnel watchdog kills the worker past ~1 min). Bound the estimated
    # voxel-steps per launch; the default assumes the measured
    # with/without-collision kernel rates with ~2x headroom.
    work_cap = int(_os.environ.get(
        "EVOSORO_TPU_LAUNCH_VOXSTEPS",
        1_500_000_000 if coll_on else 12_000_000_000))
    mean_occ = max(1.0, float(np.mean(
        [np.count_nonzero(f["structure"] > 0) for f in all_fields])))

    def _bucket_cap(bval):
        c = max(batch_pad, min(cap, int(work_cap / (mean_occ * bval))))
        # slice sizes ride the batch ladder (in batch_pad units) so the
        # slices of successive generations hit the SAME compiled programs
        return _ladder_count_down(c // batch_pad) * batch_pad

    need_split = (len(buckets) > 1
                  or len(inds) > _bucket_cap(buckets[0]))
    if need_split and not _bucketed:
        # dt-bucketed dispatch: one launch per scan-length bucket, so a
        # single stiff mutant (small dt -> 10x the steps) doesn't make the
        # WHOLE generation ride its scan length — every lane of a shared
        # scan burns full stencil compute even after its rollout freezes.
        # Buckets reuse the same ladder as the jit cache, so each group
        # hits an already-compiled program.
        merged = dict(host_fields_s=0.0, host_collision_s=0.0,
                      host_prep_s=0.0, device_s=0.0, batch=0,
                      batch_padded=0, num_steps=max(per_steps),
                      used_fused=True, buckets=[])
        for bval in buckets:
            group = [ind for ind, s in zip(inds, per_steps) if s == bval]
            bcap = _bucket_cap(bval)
            for lo in range(0, len(group), bcap):
                chunk = group[lo:lo + bcap]
                _dispatch_batch(sim, env, pop, chunk, print_log,
                                batch_pad=batch_pad, devices=devices,
                                _bucketed=True)
                for k in ("host_fields_s", "host_collision_s",
                          "host_prep_s", "device_s"):
                    merged[k] += _tm.get(k, 0.0)
                merged["batch"] += _tm.get("batch", 0)
                merged["batch_padded"] += _tm.get("batch_padded", 0)
                merged["used_fused"] = (merged["used_fused"]
                                        and _tm.get("used_fused", False))
                merged["buckets"].append(
                    dict(num_steps=bval, batch=len(chunk)))
        _tm.clear()
        _tm.update(merged)
        return
    # data-parallel sharding over local devices (the production multi-chip
    # path, SURVEY.md §2.4): only as many shards as the generation can fill
    # with whole batch_blocks
    if devices is None:
        devices = jax.devices()
    n_shards = max(1, min(len(devices), B // batch_pad))
    # batch padded UP the {1, 1.5}·2^k ladder (in batch_pad×n_shards
    # units): generation sizes drift every generation, and every distinct
    # padded batch is a fresh XLA program — the 4-gen basic EVOBENCH run
    # recompiled its rollout programs almost every generation (device_s
    # 2.2→21 s swings). Ladder waste is ≤33% padded lanes; pad rows reuse
    # row 0's design and their results are discarded.
    unit = batch_pad * n_shards
    Bp = _ladder_count(-(-B // unit)) * unit

    structures = np.zeros((Bp,) + tuple(grid), dtype=np.int32)
    voxel_fields = {
        k: np.zeros((Bp,) + tuple(grid), dtype=np.float32) for k in field_names
    }
    for i, f in enumerate(all_fields):
        structures[i] = f["structure"]
        for k in field_names:
            if k in f:
                voxel_fields[k][i] = f[k]
    # pad rows reuse row 0's design (results discarded)
    for i in range(B, Bp):
        structures[i] = structures[0]

    # fluid environments: the PRODUCTION drag model is the parity-validated
    # deformed-mesh facet drag (land_water VX_Sim.cpp:1516-1600, validated
    # <1e-7 m/voxel vs a land_water build in test_landwater_parity.py).
    # `Env(drag_model="voxel_face")` opts into the voxel-face approximation
    # instead (DRAGDIV.json quantifies the trajectory divergence).
    drag_model = getattr(env, "drag_model", "mesh")
    use_mesh_drag = bool(all_env[0].fluid_environment) and drag_model == "mesh"
    if use_mesh_drag:
        # corner-shell padding: the fused kernel computes facet drag as a
        # stencil over corner-lattice points, which needs one empty layer
        # at the +X/+Y/+Z faces (ops/fused_rollout.supports). Pad both
        # paths so flat indices / collision tables stay consistent.
        structures = np.pad(structures, ((0, 0), (0, 1), (0, 1), (0, 1)))
        voxel_fields = {
            k: np.pad(v, ((0, 0), (0, 1), (0, 1), (0, 1)))
            for k, v in voxel_fields.items()
        }
        grid = tuple(g + 1 for g in grid)

    # numpy stack: host prep must not issue eager device ops — on a
    # tunneled TPU backend every eager jnp op is an RPC round trip (the
    # r5 EVOBENCH profile measured ~50 s/generation of pure host-prep
    # eager-dispatch overhead before this was hoisted off-device)
    env_batch = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x, dtype=np.float32) for x in xs]),
        *(all_env + [all_env[0]] * (Bp - B)),
    )

    sim_params = sim.to_sim_params()

    # static scan length: worst case over the (dt-bucketed) batch, on the
    # ladder so the jit cache key is stable across generations
    num_steps = max(per_steps)

    # self-collision: every reference experiment defaults
    # SelfColEnabled=1 (base.py:24, read_write_voxelyze.py:73), so the
    # evaluator must simulate it. The static tables are host-built per
    # design (~0.1 s for a 10³ via sparse BFS) and either stacked as a
    # padded CollisionSystem (jnp path) or packed to dense (B, Vp, Vp)
    # pair fields (fused path).
    _tm["host_fields_s"] = time.time() - _t0
    _t1 = time.time()
    with_collision = bool(sim_params.self_collisions_enabled)
    collision_systems = None
    if with_collision:
        from evosoro_tpu.core.collision import build_collision_system

        e_pal = np.asarray(palette.elastic_mod)
        stiff = voxel_fields.get("stiffness")
        collision_systems = []
        for i in range(Bp):
            if i >= B:
                # pad rows duplicate row 0's design — reuse its tables
                collision_systems.append(collision_systems[0])
                continue
            st_i = structures[i]
            e_vox = e_pal[st_i]
            if stiff is not None:
                # match build_body's per-voxel stiffness override rule
                e_vox = np.where((stiff[i] > 0) & (st_i > 0), stiff[i], e_vox)
            collision_systems.append(build_collision_system(st_i, e_vox, L))

    _tm["host_collision_s"] = time.time() - _t1

    # fused-kernel fast path: default on TPU when the experiment is inside
    # the kernel envelope (EVOSORO_TPU_FUSED_EVAL=0 disables, =1 forces it in
    # interpreter mode off-TPU for testing)
    import os

    from evosoro_tpu.ops.fused_rollout import supports as fused_supports

    force = os.environ.get("EVOSORO_TPU_FUSED_EVAL")
    on_tpu = jax.devices()[0].platform == "tpu"
    # the probe body exists only to ask supports(); build it on the CPU
    # backend — eagerly building it through a tunneled TPU backend costs
    # ~40 s of per-op RPC round trips (r5 EVOBENCH host-prep profile)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        probe_body = build_body(
            structures[0], palette, lattice_dim=L,
            **{k: voxel_fields[k][0] for k in field_names},
        )
    if with_collision:
        probe_body = probe_body.replace(collision=collision_systems[0])
    can_fuse = fused_supports(probe_body, sim_params, all_env[0])
    if with_collision:
        # the evaluator streams PER-INDIVIDUAL dense pair fields as a
        # (batch_block, Vp, Vp) VMEM block; batch_pad was narrowed above
        # (8/4/2/1) to keep the block inside VMEM up to supports()'s
        # 2304-lane bound
        Vp_probe = -(-int(np.prod(grid)) // 128) * 128
        can_fuse = can_fuse and Vp_probe <= 2304
    use_fused = can_fuse and (force == "1" or (on_tpu and force != "0"))
    if not use_fused and on_tpu and force != "0":
        # the jnp-scan fallback runs ~2-20x slower on-chip (FALLBACK.json);
        # tell the user which side of the cliff this generation is on and why
        reasons = []
        if with_collision and -(-int(np.prod(grid)) // 128) * 128 > 2304:
            reasons.append(
                "self-collision with >2304 lanes (per-individual pair "
                "fields outgrow VMEM even at batch_block=1)")
        if not fused_supports(probe_body, sim_params, all_env[0]):
            reasons.append("outside the fused kernel envelope "
                           "(ops.fused_rollout.supports)")
        print_log.message(
            "WARNING: generation leaving the fused TPU path ({}); "
            "expect ~9x lower rollout throughput".format(
                "; ".join(reasons) or "unknown reason"))

    extra_args = ()
    if use_fused:
        if with_collision:
            from evosoro_tpu.ops.fused_rollout import pack_collision

            Vp = -(-int(np.prod(grid)) // 128) * 128
            # pack_collision returns host arrays; np.stack keeps the whole
            # pair-field batch on the host until the ONE jitted launch
            extra_args = (np.stack([
                pack_collision(cs, Vp, tuple(grid))
                for cs in collision_systems
            ]),)
    else:
        if with_collision:
            from evosoro_tpu.core.collision import pad_collision_system

            # bucket the surface padding so drifting s_max across
            # generations doesn't retrigger a full rollout recompile
            s_max = max(cs.surf_idx.shape[0] for cs in collision_systems)
            s_max = -(-s_max // 64) * 64
            extra_args = (jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[pad_collision_system(cs, s_max)
                  for cs in collision_systems],
            ),)
        if use_mesh_drag:
            # the jnp facet path consumes host-built gather/scatter mesh
            # tables (the fused path computes the facets in-kernel as a
            # corner-lattice stencil and needs none)
            from evosoro_tpu.envs.drag import build_mesh_drag

            raw = [build_mesh_drag(structures[i]) for i in range(B)]
            # bucket padding so drifting mesh sizes don't retrigger compiles
            t_max = -(-max(m.num_tris for m in raw) // 256) * 256
            v_max = -(-max(int(m.vert_vox.shape[0]) for m in raw) // 256) * 256
            mesh_systems = [
                build_mesh_drag(structures[i], pad_tris=t_max,
                                pad_verts=v_max)
                for i in range(B)
            ]
            mesh_systems += [mesh_systems[0]] * (Bp - B)
            extra_args = extra_args + (jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *mesh_systems),)

    eval_mesh = None
    if use_fused and n_shards > 1:
        from jax.sharding import Mesh

        eval_mesh = Mesh(np.array(devices[:n_shards]), ("rollout",))

    def _run(n_steps):
        if use_fused:
            fn = make_fused_evaluator(
                palette, tuple(grid), n_steps, tuple(field_names), L,
                sim_params, all_env[0], interpret=not on_tpu,
                with_collision=with_collision, mesh=eval_mesh,
                fluid_mesh=use_mesh_drag, batch_block=batch_pad,
            )
        else:
            fn = make_batched_evaluator(
                palette, tuple(grid), n_steps, tuple(field_names), ("all",),
                with_collision=with_collision,
                with_mesh_drag=use_mesh_drag,
            )
        out = fn(
            jnp.asarray(structures),
            {k: jnp.asarray(v) for k, v in voxel_fields.items()},
            sim_params,
            env_batch,
            stop_time,
            *extra_args,
        )
        return jax.tree_util.tree_map(np.asarray, out)

    _tm["host_prep_s"] = time.time() - _t0
    _tm["batch"] = len(inds)
    _tm["batch_padded"] = int(Bp)
    _tm["num_steps"] = int(num_steps)
    _tm["used_fused"] = bool(use_fused)
    _td = time.time()
    results = _run(num_steps)
    if vol_on:
        # the in-step recomputed dt shrinks under compression; the 15% static
        # scan pad is a heuristic, so verify every live rollout actually
        # reached the stop time and widen the scan if not (the reference
        # loops until the stop condition is met, VX_Sim.cpp main loop)
        for _retry in range(2):
            short = (~results["diverged"][:B]) & (
                results["final_time"][:B] < stop_time * 0.999)
            if not short.any():
                break
            num_steps = int(np.ceil(num_steps * 1.5))
            print_log.message(
                "{} rollouts truncated before stop time under dynamic dt; "
                "re-dispatching with scan length {}".format(
                    int(short.sum()), num_steps))
            results = _run(num_steps)
    _tm["device_s"] = time.time() - _td

    # objective assignment (reference: evaluation.py:160-177)
    for i, ind in enumerate(inds):
        for rank, details in pop.objective_dict.items():
            tag = details["tag"]
            if tag is not None and tag in _OBJECTIVE_TAG_TO_RESULT:
                val = float(results[_OBJECTIVE_TAG_TO_RESULT[tag]][i])
                if bool(results["diverged"][i]):
                    val = details["worst_value"]
                setattr(ind, details["name"], val)
            elif tag is None and details["node_func"] is not None:
                for name, det_ph in ind.genotype.to_phenotype_mapping.items():
                    if name == details["output_node_name"]:
                        setattr(
                            ind, details["name"], details["node_func"](det_ph["state"])
                        )
        print_log.message(
            "id {0} fit = {1} ({2}/{3})".format(ind.id, ind.fitness, i + 1, len(inds))
        )


def _experiment_palette(env):
    """The canonical 7-material palette parameterized by experiment
    stiffnesses (reference: read_write_voxelyze.py:175-344).

    `Env(materials=[Material(...), ...])` overrides the whole palette —
    the hook for experiments on custom material models (bilinear/MDL_DATA,
    reference VX_Object.cpp:1472-1535), which the fused evaluator streams
    as per-individual side tables."""
    mats = getattr(env, "materials", None)
    if mats:
        return list(mats)
    return evosoro_default_palette(
        fat_stiffness=getattr(env, "fat_stiffness", 5e6),
        bone_stiffness=getattr(env, "bone_stiffness", 5e8),
        muscle_stiffness=getattr(env, "muscle_stiffness", 5e6),
    )


def _archive_best(sim, env, ind, run_directory, run_name, gen):
    """Write the new best-so-far design as a .vxa (reference archives the
    input file: evaluation.py:185-192)."""
    import os

    from evosoro_tpu.io.vxa import write_vxa

    os.makedirs(os.path.join(run_directory, "bestSoFar", "fitOnly"), exist_ok=True)
    fields, _ = _phenotype_fields(ind, env)
    structure = fields.pop(
        "structure", np.full(ind.genotype.orig_size_xyz, 3, dtype=np.int32)
    )
    tag_map = {v: k for k, v in _TAG_TO_FIELD.items()}
    voxel_arrays = {
        tag_map[k].strip("<>"): v for k, v in fields.items() if k in tag_map
    }
    path = os.path.join(
        run_directory,
        "bestSoFar",
        "fitOnly",
        "{0}--Gen_{1:04d}--fit_{2:.08f}--id_{3:05d}.vxa".format(
            run_name or "run", gen, ind.fitness, ind.id
        ),
    )
    write_vxa(
        path,
        structure,
        _experiment_palette(env),
        sim=sim.to_sim_params(),
        env=env.to_env_params(),
        voxel_arrays=voxel_arrays,
    )
