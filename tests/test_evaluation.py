"""In-process batched evaluation (the reference's process-per-individual
bridge, tools/evaluation.py, as ONE dispatch): jnp-scan path vs the fused
Pallas-kernel path (forced into interpreter mode on CPU via
EVOSORO_TPU_FUSED_EVAL=1) must assign near-identical fitness."""

import os
import random

import numpy as np
import pytest

from evosoro_tpu.evo.base import Env, ObjectiveDict, Sim
from evosoro_tpu.evo.evaluation import evaluate_all
from evosoro_tpu.evo.networks import CPPN, DirectEncoding
from evosoro_tpu.evo.softbot import Genotype, Phenotype, Population
from evosoro_tpu.utils.phenotype_mappers import make_material_tree

IND_SIZE = (4, 4, 3)


class _Genotype(Genotype):
    """The canonical CPPN material-tree genotype (examples/basic.py) at a
    small grid, plus a direct-encoded phase offset."""

    def __init__(self):
        super().__init__(orig_size_xyz=IND_SIZE)
        self.add_network(
            CPPN(output_node_names=["shape", "muscleOrTissue", "muscleType",
                                    "tissueType"])
        )
        self.to_phenotype_mapping.add_map(
            name="material", tag="<Data>", func=make_material_tree,
            dependency_order=["shape", "muscleOrTissue", "muscleType",
                              "tissueType"], output_type=int,
        )
        self.to_phenotype_mapping.add_output_dependency(
            name="shape", dependency_name=None, requirement=None,
            material_if_true=None, material_if_false="0")
        self.to_phenotype_mapping.add_output_dependency(
            name="muscleOrTissue", dependency_name="shape", requirement=True,
            material_if_true=None, material_if_false=None)
        self.to_phenotype_mapping.add_output_dependency(
            name="tissueType", dependency_name="muscleOrTissue",
            requirement=False, material_if_true="1", material_if_false="2")
        self.to_phenotype_mapping.add_output_dependency(
            name="muscleType", dependency_name="muscleOrTissue",
            requirement=True, material_if_true="3", material_if_false="4")
        self.add_network(DirectEncoding("phase", IND_SIZE, symmetric=False))
        self.to_phenotype_mapping.add_map(
            name="phase", tag="<PhaseOffset>", output_type=float
        )


class _Phenotype(Phenotype):
    def is_valid(self):
        for name, details in self.genotype.to_phenotype_mapping.items():
            if np.isnan(details["state"]).any():
                return False
            if name == "material":
                state = details["state"]
                if np.sum(state > 0) < 4:
                    return False
                if np.sum((state == 3) | (state == 4)) < 2:
                    return False
        return True


def _make_pop(pop_size=8, seed=11):
    random.seed(seed)
    np.random.seed(seed)
    objectives = ObjectiveDict()
    objectives.add_objective(name="fitness", maximize=True,
                             tag="<NormFinalDist>")
    objectives.add_objective(name="age", maximize=False, tag=None)
    return Population(objectives, _Genotype, _Phenotype, pop_size=pop_size)


def _sim_env():
    # bone (5e8 Pa) may appear in the material tree -> dt ~6.4e-5 s; keep
    # the horizon short so the interpreter-mode kernel stays fast
    sim = Sim(dt_frac=0.9, simulation_time=0.01, fitness_eval_init_time=0.002)
    env = Env(time_between_traces=0)
    return sim, env


def _fitnesses(pop):
    return np.array([ind.fitness for ind in pop])


@pytest.fixture()
def _restore_env():
    old = os.environ.get("EVOSORO_TPU_FUSED_EVAL")
    yield
    if old is None:
        os.environ.pop("EVOSORO_TPU_FUSED_EVAL", None)
    else:
        os.environ["EVOSORO_TPU_FUSED_EVAL"] = old


def test_fused_evaluator_matches_jnp(_restore_env):
    sim, env = _sim_env()

    pop_a = _make_pop()
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    evaluate_all(sim, env, pop_a)
    fits_jnp = _fitnesses(pop_a)

    pop_b = _make_pop()  # same seed -> identical genomes
    pop_b.already_evaluated = {}
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"  # fused, interpret on CPU
    evaluate_all(sim, env, pop_b)
    fits_fused = _fitnesses(pop_b)

    assert np.isfinite(fits_jnp).all()
    # at least someone should have moved a little
    assert np.max(np.abs(fits_jnp)) > 0
    np.testing.assert_allclose(fits_fused, fits_jnp, rtol=5e-3, atol=1e-6)


def test_fused_evaluator_fluid_matches_jnp(_restore_env):
    """Fluid (swimming) environments through BOTH evaluator paths: the fused
    path must carry the aggregate drag coefficient into its stats rows
    (regression: a missing _S_DRAGC channel made fused swimmers drag-free).
    drag_model='voxel_face' opts both paths into the kernel's face model
    (the production default 'mesh' routes to the jnp facet-drag path)."""
    sim = Sim(dt_frac=0.9, simulation_time=0.01, fitness_eval_init_time=0.0)
    env = Env(time_between_traces=0, fluid_environment=1,
              aggregate_drag_coefficient=375.0, gravity_enabled=0,
              floor_enabled=0, drag_model="voxel_face")

    pop_a = _make_pop()
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    evaluate_all(sim, env, pop_a)
    fits_jnp = _fitnesses(pop_a)

    pop_b = _make_pop()
    pop_b.already_evaluated = {}
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"
    evaluate_all(sim, env, pop_b)
    fits_fused = _fitnesses(pop_b)

    assert np.isfinite(fits_jnp).all()
    assert np.max(np.abs(fits_jnp)) > 0
    np.testing.assert_allclose(fits_fused, fits_jnp, rtol=5e-3, atol=1e-6)


def test_fluid_default_uses_mesh_drag(_restore_env):
    """The evaluator's production fluid model is the parity-validated
    deformed-mesh facet drag (VERDICT r3 missing #1): with the default
    Env(drag_model='mesh') a fluid experiment must run the facet model —
    since r5 INSIDE the fused kernel (corner-lattice stencil on a shell-
    padded grid) — and the result must match a direct jnp rollout with the
    gather/scatter mesh system attached."""
    import jax.numpy as jnp

    from evosoro_tpu.core.materials import build_body, calc_max_dt, \
        palette_from_list
    from evosoro_tpu.core.rollout import rollout
    from evosoro_tpu.envs.drag import build_mesh_drag
    from evosoro_tpu.evo import evaluation as ev

    sim = Sim(dt_frac=0.9, simulation_time=0.01, fitness_eval_init_time=0.0)
    env = Env(time_between_traces=0, fluid_environment=1,
              aggregate_drag_coefficient=375.0, gravity_enabled=0,
              floor_enabled=0)
    assert env.drag_model == "mesh"

    pop = _make_pop(pop_size=4)
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"  # fused, interpret on CPU
    evaluate_all(sim, env, pop)
    fits = _fitnesses(pop)
    assert np.isfinite(fits).all()
    # a fused fluid-mesh evaluator must be what got compiled (key[9] is the
    # fluid_mesh flag — see make_fused_evaluator's key tuple; the grid
    # carries the +1 corner shell)
    assert any(k[0] == "fused" and k[9] is True and k[1] == (5, 5, 4)
               for k in ev._compiled_cache
               if isinstance(k, tuple) and len(k) > 9), \
        "no fused fluid-mesh evaluator"

    # cross-check one individual against a direct mesh-drag rollout
    ind = next(i for i in pop if i.phenotype.is_valid())
    fields, _ = ev._phenotype_fields(ind, env)
    structure = np.asarray(fields["structure"], dtype=np.int32)
    pal = palette_from_list(ev._experiment_palette(env))
    body = build_body(structure, pal, lattice_dim=env.lattice_dimension,
                      phase_offset=np.asarray(fields["phase_offset"]))
    body = body.replace(mesh_drag=build_mesh_drag(structure))
    from evosoro_tpu.core.collision import attach_collision_system

    if sim.to_sim_params().self_collisions_enabled:
        body = attach_collision_system(body)
    dt = calc_max_dt(body) * sim.to_sim_params().dt_frac
    steps = int(np.ceil(0.01 / float(dt))) + 1
    res = rollout(body, sim.to_sim_params(), env.to_env_params(),
                  num_steps=steps, dt=dt, stop_time=0.01)
    # displacements at this short horizon are ~1e-7 normalized (f32 CoM
    # noise floor); the check is that both paths sit on the same floor
    np.testing.assert_allclose(
        float(res.norm_final_dist), ind.fitness, rtol=5e-3, atol=1e-6)


def test_actuation_variance_independent_per_material(_restore_env, monkeypatch):
    """actuation_variance must draw an INDEPENDENT U(0, av) CTE factor per
    muscle material per evaluation (reference: read_write_voxelyze.py:243,267
    writes a separate random.uniform per palette entry), not one shared
    per-individual jitter."""
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    sim, env = _sim_env()
    env.actuation_variance = 0.5

    draws = []
    orig = np.random.uniform

    def spy(lo, hi, *a, **k):
        v = orig(lo, hi, *a, **k)
        draws.append((lo, hi, v))
        return v

    monkeypatch.setattr(np.random, "uniform", spy)
    pop = _make_pop(4)
    draws.clear()  # ignore draws from population initialization
    evaluate_all(sim, env, pop)

    fits = _fitnesses(pop)
    assert np.isfinite(fits).all()
    av_draws = [d for d in draws if d[0] == 0 and d[1] == 0.5]
    # default palette has three cte != 0 materials (3, 4, 6) → three
    # independent draws per evaluated individual
    assert len(av_draws) >= 3
    assert len(av_draws) % 3 == 0
    vals = [d[2] for d in av_draws]
    assert len(set(vals)) == len(vals), "draws must be independent"


class _GrowthGenotype(Genotype):
    """examples/growth.py's genotype at a small grid: per-voxel initial and
    final sizes as raw CPPN outputs mapped through the import-time devo
    transform (reference: VX_Sim.cpp:878-965)."""

    def __init__(self):
        super().__init__(orig_size_xyz=IND_SIZE)
        self.add_network(CPPN(output_node_names=["initial_size"]))
        self.to_phenotype_mapping.add_map(
            name="initial_size", tag="<InitialVoxelSize>"
        )
        self.add_network(CPPN(output_node_names=["final_size"]))
        self.to_phenotype_mapping.add_map(
            name="final_size", tag="<FinalVoxelSize>"
        )


def test_growth_evaluator_devo_transform(_restore_env):
    """The evaluator must map raw genome devo outputs to physical
    sizes/times (not feed sigmoids as meters); jnp and fused paths agree."""
    sim = Sim(dt_frac=0.9, simulation_time=0.01, fitness_eval_init_time=0.002,
              min_temp_fact=0.4)
    env = Env(time_between_traces=0)
    env.add_param("growth_amplitude", 0.8, "<GrowthAmplitude>")

    def make():
        random.seed(21)
        np.random.seed(21)
        objectives = ObjectiveDict()
        objectives.add_objective(name="fitness", maximize=True,
                                 tag="<NormFinalDist>")
        objectives.add_objective(name="age", maximize=False, tag=None)
        return Population(objectives, _GrowthGenotype, Phenotype,
                          pop_size=8)

    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    pop_a = make()
    evaluate_all(sim, env, pop_a)
    fits_jnp = _fitnesses(pop_a)
    assert np.isfinite(fits_jnp).all()
    # with the transform, nobody diverges into worst fitness
    worst = pop_a.objective_dict[0]["worst_value"]
    assert not np.any(fits_jnp == worst)

    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"
    pop_b = make()
    evaluate_all(sim, env, pop_b)
    fits_fused = _fitnesses(pop_b)
    np.testing.assert_allclose(fits_fused, fits_jnp, rtol=5e-3, atol=1e-6)


def test_evaluator_dedups_by_md5(_restore_env):
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    sim, env = _sim_env()
    pop = _make_pop(pop_size=4, seed=3)
    evaluate_all(sim, env, pop)
    n_evals = pop.total_evaluations
    # re-evaluating the same individuals hits the md5 cache
    for ind in pop:
        ind.fitness = pop.objective_dict[0]["worst_value"]
    evaluate_all(sim, env, pop)
    assert pop.total_evaluations == n_evals


def test_fused_evaluator_mdl_data_matches_jnp(_restore_env):
    """MDL_DATA (point-table) palettes through BOTH evaluator paths
    (VERDICT r4 missing #2): the fused path must stream per-individual
    stress-strain side tables (pack_ss_tables) instead of silently routing
    to the ~9x-slower jnp scan. Palette override via Env(materials=...);
    reference honors MDL_DATA in every sim (VX_Object.cpp:1472-1535)."""
    from evosoro_tpu.core.types import MDL_DATA, Material

    mats = [
        Material(1, "Passive_Soft", 5e6, cte=0.0),
        Material(2, "Data_Hard", mat_model=MDL_DATA, cte=0.0,
                 ss_strain=(0.0, 0.001, 0.05, 0.5),
                 ss_stress=(0.0, 5e5, 2e6, 8e6)),
        Material(3, "Data_Active_+", mat_model=MDL_DATA, cte=0.01,
                 ss_strain=(0.0, 0.002, 0.1),
                 ss_stress=(0.0, 1e4, 4e5)),
        Material(4, "Active_-", 5e6, cte=-0.01),
    ]
    sim = Sim(dt_frac=0.9, simulation_time=0.01, fitness_eval_init_time=0.002)
    env = Env(time_between_traces=0, materials=mats)

    pop_a = _make_pop()
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    evaluate_all(sim, env, pop_a)
    fits_jnp = _fitnesses(pop_a)

    pop_b = _make_pop()
    pop_b.already_evaluated = {}
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"  # fused, interpret on CPU
    evaluate_all(sim, env, pop_b)
    fits_fused = _fitnesses(pop_b)

    assert np.isfinite(fits_jnp).all()
    assert np.max(np.abs(fits_jnp)) > 0
    np.testing.assert_allclose(fits_fused, fits_jnp, rtol=5e-3, atol=1e-6)


def test_fused_evaluator_mesh_fluid_matches_jnp(_restore_env):
    """Mesh-drag fluid through BOTH evaluator paths (VERDICT r4 missing #1):
    the fused corner-lattice stencil vs the jnp gather/scatter facet model,
    identical populations, near-identical fitness."""
    sim = Sim(dt_frac=0.9, simulation_time=0.01, fitness_eval_init_time=0.0)
    env = Env(time_between_traces=0, fluid_environment=1,
              aggregate_drag_coefficient=375.0, gravity_enabled=0,
              floor_enabled=0)
    assert env.drag_model == "mesh"

    pop_a = _make_pop()
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    evaluate_all(sim, env, pop_a)
    fits_jnp = _fitnesses(pop_a)

    pop_b = _make_pop()
    pop_b.already_evaluated = {}
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"
    evaluate_all(sim, env, pop_b)
    fits_fused = _fitnesses(pop_b)

    assert np.isfinite(fits_jnp).all()
    assert np.max(np.abs(fits_jnp)) > 0
    np.testing.assert_allclose(fits_fused, fits_jnp, rtol=5e-3, atol=1e-6)


class _BigGenotype(Genotype):
    """10x10x11-lattice direct encoding: 1100 voxels -> Vp=1152 kernel
    lanes, past the 1024-lane bound where batch_block=8 per-individual
    pair fields outgrow VMEM."""

    SIZE = (10, 10, 11)

    def __init__(self):
        super().__init__(orig_size_xyz=self.SIZE)
        self.add_network(DirectEncoding("material", self.SIZE,
                                        symmetric=False, func=_quantize_mat))
        self.to_phenotype_mapping.add_map(
            name="material", tag="<Data>", output_type=int)
        self.add_network(DirectEncoding("phase", self.SIZE, symmetric=False))
        self.to_phenotype_mapping.add_map(
            name="phase", tag="<PhaseOffset>", output_type=float)


def _quantize_mat(values):
    # mostly-full soft body: materials 1/3/4 only (no bone -> bigger dt,
    # fewer interpreter-mode steps)
    out = np.ones_like(values)
    out[values > 0.0] = 3
    out[values < -0.5] = 4
    return out


class _BigPhenotype(Phenotype):
    def is_valid(self):
        for name, details in self.genotype.to_phenotype_mapping.items():
            if np.isnan(details["state"]).any():
                return False
        return True


def test_fused_evaluator_collision_over_1024_lanes(_restore_env):
    """Self-collision bodies between 1024 and 2048 kernel lanes must STAY
    on the fused path by narrowing batch_block (8 -> 4/2) instead of
    falling off the ~9-20x jnp cliff, and must agree with the jnp
    reference path. (Closes FALLBACK.json's last remaining cliff for
    grids up to 2048 lanes.)"""
    from evosoro_tpu.evo import evaluation as ev

    sim = Sim(dt_frac=0.9, simulation_time=0.004,
              fitness_eval_init_time=0.001)
    assert sim.to_sim_params().self_collisions_enabled
    env = Env(time_between_traces=0)

    def make():
        random.seed(5)
        np.random.seed(5)
        objectives = ObjectiveDict()
        objectives.add_objective(name="fitness", maximize=True,
                                 tag="<NormFinalDist>")
        objectives.add_objective(name="age", maximize=False, tag=None)
        return Population(objectives, _BigGenotype, _BigPhenotype,
                          pop_size=4)

    pop_a = make()
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "0"
    evaluate_all(sim, env, pop_a)
    fits_jnp = _fitnesses(pop_a)

    pop_b = make()
    pop_b.already_evaluated = {}
    os.environ["EVOSORO_TPU_FUSED_EVAL"] = "1"  # fused, interpret on CPU
    evaluate_all(sim, env, pop_b)
    fits_fused = _fitnesses(pop_b)
    assert ev.LAST_DISPATCH_TIMING.get("used_fused") is True
    # the dispatcher must have narrowed the block for the 1152-lane body
    assert ev.LAST_DISPATCH_TIMING.get("batch_padded") == 4

    assert np.isfinite(fits_jnp).all()
    np.testing.assert_allclose(fits_fused, fits_jnp, rtol=5e-3, atol=1e-6)
