"""Config and state containers for the TPU voxel physics core.

Everything dynamic is a flax.struct pytree of dense `(X, Y, Z, ...)` arrays —
structure-of-arrays over the full bounding lattice with an occupancy mask, so
the whole per-timestep update is a fused 3D stencil (no index lists, no
scatter). Batch = `vmap` leading axis.

Parameter provenance (reference files under /root/reference/evosoro/):
- SimParams  ← VXA <Simulator> block (base.py:21-47, VX_Sim.cpp:263-356)
- EnvParams  ← VXA <Environment> block (base.py:50-74, VX_Environment.cpp:123-298)
- Material   ← VXC <Palette><Material> (VX_Object.h:525-660)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

# DOF bit flags (reference: VX_FRegion.h:32-42)
DOF_X, DOF_Y, DOF_Z, DOF_TX, DOF_TY, DOF_TZ = 1, 2, 4, 8, 16, 32
DOF_ALL = 63

# Material models (reference: VX_Object.h MatModel enum)
MDL_LINEAR, MDL_LINEAR_FAIL, MDL_BILINEAR, MDL_DATA = 0, 1, 2, 3

# Failure models (reference: VX_Object.h FailModel enum)
FM_MAXSTRESS, FM_MAXSTRAIN = 0, 1

# Stop conditions (reference: VX_Enums.h:55-65 StopCondition)
(SC_NONE, SC_MAX_TIME_STEPS, SC_MAX_SIM_TIME, SC_TEMP_CYCLES,
 SC_CONST_MAXENERGY, SC_MIN_KE, SC_MIN_MAXMOVE,
 SC_MIN_MAXMOVE_MAX_SIM_TIME, SC_POINTING_ERR) = range(9)

# reference: VX_Sim.h:40 — history depth for quiescence stop conditions;
# checks sample every HISTORY_SIZE/10 steps
HISTORY_SIZE = 10000
MOTION_FLOOR_THR = 5e-8  # reference: VX_Sim.cpp:35


@struct.dataclass
class SimParams:
    """Integration/damping/stop-condition parameters.

    Defaults follow what evosoro's writer emits for every experiment
    (reference: tools/read_write_voxelyze.py:62-117), not the C++ fallbacks.
    Scalars are leaves so MPC can differentiate through them; feature
    switches are static (they select code paths at trace time).
    """

    dt_frac: Any = 0.9
    bond_damping_z: Any = 1.0
    col_damping_z: Any = 0.8
    slow_damping_z: Any = 0.01
    stop_condition_value: Any = 5.0  # seconds of sim time (SC_MAX_SIM_TIME)
    init_cm_time: Any = 1.0  # fitness_eval_init_time: actuation + CoM capture start
    min_temp_fact: Any = 0.1  # lower bound on voxel scale / nominal
    max_vox_vel_limit: Any = 0.1  # in voxel-lengths per timestep (if enabled)
    afterlife_time: Any = 0.0
    mid_life_freeze_time: Any = 0.0
    # parent's lifetime for relative devo onset/termination bounds
    # (reference: VX_Sim.cpp:348 — defaults to StopConditionValue; the
    # sentinel 0.0 means "unset, use stop_condition_value")
    parent_lifetime: Any = 0.0

    # --- parsed-for-parity engine parameters. The reference parses all of
    # these (VX_Sim.cpp:335-351) but its live dynamics never read them:
    # stiffness bounds / variation steps feed only GUI coloring
    # (VXS_SimGLView.cpp:435-502), the PID gains feed the dormant pointing
    # controller (computePointingError's TimeStep call is commented out,
    # VX_Sim.cpp:1062), and error/threshold feed SC_POINTING_ERR. Kept so
    # VXA round-trips and the SC_POINTING_ERR surface are complete. ---
    max_temp_fact_change: Any = 0.00015
    max_stiffness_change: Any = 0.00015
    min_elastic_mod: Any = 5e6
    max_elastic_mod: Any = 5e8
    kp: Any = 3.0  # sim-level PID defaults (VX_Sim.cpp:36-38)
    ki: Any = 0.001
    antiwindup: Any = 0.5
    max_kp: Any = 5.0
    max_ki: Any = 1.0
    max_antiwindup: Any = 1.0
    error_threshold: Any = 0.1
    threshold_time: Any = 2.0

    # static feature switches (reference: VXSFEAT_* flags, VX_Sim.h)
    self_collisions_enabled: bool = struct.field(pytree_node=False, default=False)
    max_velocity_enabled: bool = struct.field(pytree_node=False, default=False)
    volume_effects_enabled: bool = struct.field(pytree_node=False, default=False)
    plasticity_enabled: bool = struct.field(pytree_node=False, default=False)
    equilibrium_mode: bool = struct.field(pytree_node=False, default=False)
    collision_horizon: Any = 2.0


@dataclasses.dataclass(frozen=True)
class NeuralNetParams:
    """Dormant ``<NeuralNet>`` environment block.

    The reference parses these seven tags (VX_Environment.cpp:197-206) and
    never reads them anywhere in the engine — they are record-keeping only,
    like the per-voxel PID fields.  We parse-and-carry them the same way so
    a VXA round-trip preserves the block byte-for-byte.
    """

    updates_per_temp_cycle: float = 0.0
    touch_sensors_enabled: bool = False
    proprioception_sensors_enabled: bool = False
    pacemaker_sensors_enabled: bool = False
    num_hidden_neurons_per_layer: int = 0
    num_hidden_layers: int = 0
    output_smoothing: float = 0.0


@struct.dataclass
class EnvParams:
    """Environment: gravity, floor, thermal actuation drive, fluid.

    (reference: base.py:50-74 defaults; VX_Environment.cpp:123-298 parsing)
    """

    grav_acc: Any = -9.81
    # parsed/serialized for VXA round-trip parity; the reference engine
    # never reads this tag (only tools/read_write_voxelyze.py:144 writes it)
    floor_slope: Any = 0.0
    temp_base: Any = 25.0
    temp_amplitude: Any = 39.0  # base.py temp_amp default
    temp_period: Any = 0.25  # 1/frequency (base.py frequency=4.0)
    growth_amplitude: Any = 0.0
    # development clocks / ballistic development (reference:
    # VX_Environment.cpp:210-227, VXS_Voxel.cpp:342-381)
    min_growth_time: Any = 0.0
    ballistic_slowdown_fact: Any = 0.01
    max_slowdown_permitted: Any = 0.1
    floor_radius: Any = 0.0  # limited circular floor radius (VXS_Voxel.cpp:677-700)
    # aquatic (land_water fork: VX_Environment.cpp:190-191)
    aggregate_drag_coefficient: Any = 0.0
    # traces / volume-normalized fitness (VX_Environment.h TimeBetweenTraces,
    # NormDistByVol exponent; window VX_Sim.cpp:2745-2760)
    time_between_traces: Any = 0.01
    normalization_exponent: Any = 1.0
    num_trace_steps_in_window: int = struct.field(pytree_node=False, default=0)
    norm_dist_by_vol: bool = struct.field(pytree_node=False, default=False)
    falling_prohibited: bool = struct.field(pytree_node=False, default=False)
    needle_in_haystack: bool = struct.field(pytree_node=False, default=False)
    # devo onset/termination bounds measured against the parent's lifetime
    # instead of this sim's stop condition (reference: VX_Environment.cpp:220-221)
    onset_relative: bool = struct.field(pytree_node=False, default=False)
    termination_relative: bool = struct.field(pytree_node=False, default=False)

    gravity_enabled: bool = struct.field(pytree_node=False, default=True)
    floor_enabled: bool = struct.field(pytree_node=False, default=True)
    floor_limited: bool = struct.field(pytree_node=False, default=False)
    temp_enabled: bool = struct.field(pytree_node=False, default=True)
    vary_temp_enabled: bool = struct.field(pytree_node=False, default=True)
    sticky_floor: bool = struct.field(pytree_node=False, default=False)
    fluid_environment: bool = struct.field(pytree_node=False, default=False)
    # lattice pitch in meters (base.py lattice_dimension=0.01)
    lattice_dim: Any = 0.01
    # environmental sources (envs.sources.EnvSources pytree or None;
    # reference: VX_Source, VX_Environment.h:40-130)
    sources: Any = None
    # dormant <NeuralNet> block (NeuralNetParams or None); parsed and
    # serialized, never read by the engine — matching the reference exactly
    neural_net: Any = struct.field(pytree_node=False, default=None)


@dataclasses.dataclass(frozen=True)
class Material:
    """One palette entry (reference: VX_Object.h:525-660 CVXC_Material)."""

    id: int
    name: str = ""
    elastic_mod: float = 1e7
    density: float = 1e6
    poissons_ratio: float = 0.35
    cte: float = 0.0
    u_static: float = 1.0
    u_dynamic: float = 0.5
    mat_model: int = MDL_LINEAR
    plastic_mod: float = 0.0
    yield_stress: float = 0.0
    fail_model: int = 0
    fail_stress: float = 0.0
    fail_strain: float = 0.0
    mat_temp_phase: float = 0.0
    rgba: tuple = (0.5, 0.5, 0.5, 1.0)
    # MDL_DATA stress-strain point tables (reference: VX_Object.h DStrain /
    # DStress; loaded from the <SSData> block). First point must be (0, 0),
    # strains strictly increasing. `validate_ss_data` derives the implied
    # elastic_mod / yield_stress / fail_strain fields exactly like
    # CVXC_Material::ValidateSSData (VX_Object.cpp:1545-1605).
    ss_strain: tuple = ()
    ss_stress: tuple = ()
    # compound-material resolution (reference: VX_Object.h:519 `enum MatMode
    # {SINGLE, INTERNAL, EXTERNAL, DITHER}`; GetLeafMatIndex
    # VX_Object.cpp:722 resolves each voxel's structure id to its leaf
    # SINGLE material at import, VX_Sim.cpp:534). DITHER picks
    # rand_index1/rand_index2 per voxel via the prsm spatial hash; INTERNAL
    # tiles a sub-structure over the workspace with offset + rotation.
    mat_type: int = 0  # SINGLE
    rand_index1: int = 0
    rand_index2: int = 0
    perc_index1: float = 0.5
    sub_structure: Any = None  # (Xs, Ys, Zs) int array for INTERNAL
    sub_offset: tuple = (0, 0, 0)
    sub_rotate_axis: int = 0  # RAX_X
    sub_rotate_amount: int = 0  # RAM_0

MAT_SINGLE, MAT_INTERNAL, MAT_EXTERNAL, MAT_DITHER = 0, 1, 2, 3


def validate_ss_data(mat: "Material") -> "Material":
    """Replicate ValidateSSData (reference: VX_Object.cpp:1545-1605): check
    the point series and derive the scalar material fields from it."""
    import dataclasses as _dc

    xs = tuple(float(v) for v in mat.ss_strain)
    ys = tuple(float(v) for v in mat.ss_stress)
    if len(xs) < 2 or len(ys) < 2:
        raise ValueError("MDL_DATA needs more than one stress-strain point")
    if len(xs) != len(ys):
        raise ValueError("strain and stress vectors are unequal length")
    if xs[0] != 0.0:
        raise ValueError("first stress-strain point must be (0, 0)")
    for a, b in zip(xs, xs[1:]):
        if a >= b:
            raise ValueError("strain values must be strictly increasing")
    n = len(xs)
    elastic_mod = ys[1] / xs[1]  # first-segment slope; also compressive E
    # 0.2%-offset yield point (VX_Object.cpp:1580-1604)
    mo, bo = elastic_mod, -0.002 * elastic_mod
    yield_stress = ys[-1]
    for i in range(1, n - 1):
        x1, x2, y1, y2 = xs[i], xs[i + 1], ys[i], ys[i + 1]
        mt = (y2 - y1) / (x2 - x1)
        bt = y1 - mt * x1
        if mo != mt:
            xint = (bt - bo) / (mo - mt)
            if x1 < xint < x2:
                yield_stress = y1 + (xint - x1) / (x2 - x1) * (y2 - y1)
                break
    return _dc.replace(
        mat,
        ss_strain=xs,
        ss_stress=ys,
        elastic_mod=elastic_mod,
        plastic_mod=elastic_mod,  # "Plastic_Mod is meaningless" (ref)
        fail_stress=0.0,
        fail_strain=xs[-1],
        fail_model=FM_MAXSTRAIN,
        yield_stress=yield_stress,
    )


@struct.dataclass
class MaterialPalette:
    """Palette as arrays indexed by material id (0 = empty).

    Built by `materials.palette_from_list`. Gathered per-voxel at body build
    time, so the hot loop never indexes the palette.
    """

    elastic_mod: Any
    density: Any
    poisson: Any
    cte: Any
    u_static: Any
    u_dynamic: Any
    mat_model: Any
    plastic_mod: Any
    yield_stress: Any
    fail_stress: Any
    fail_strain: Any
    mat_temp_phase: Any
    num_materials: int = struct.field(pytree_node=False, default=0)
    # MDL_DATA point tables, lane-padded to a common P across the palette
    # (pad strain = +1e30 sentinel, pad stress = last value). None when no
    # palette entry is MDL_DATA.
    ss_strain: Any = None  # (n_mat, P)
    ss_stress: Any = None  # (n_mat, P)
    ss_last_slope: Any = None  # (n_mat,) post-fail extrapolation slope (≥0)
    ss_last_stress: Any = None  # (n_mat,) stress at the last data point


def evosoro_default_palette(
    fat_stiffness=5e6,
    bone_stiffness=5e8,
    muscle_stiffness=5e6,
    actuation_cte=0.01,
):
    """The 7-material palette every evosoro experiment hard-codes
    (reference: tools/read_write_voxelyze.py:175-344)."""
    return [
        Material(1, "Passive_Soft", fat_stiffness, cte=0.0, rgba=(0, 1, 1, 1)),
        Material(2, "Passive_Hard", bone_stiffness, cte=0.0, rgba=(0, 0, 1, 1)),
        Material(3, "Active_+", muscle_stiffness, cte=actuation_cte, rgba=(1, 0, 0, 1)),
        Material(4, "Active_-", muscle_stiffness, cte=-actuation_cte, rgba=(0, 1, 0, 1)),
        Material(5, "Obstacle", 5e7, cte=0.0, rgba=(1, 0.784, 0, 1)),
        Material(6, "Head_Active_+", fat_stiffness, cte=actuation_cte, rgba=(1, 1, 0, 1)),
        Material(7, "Food", muscle_stiffness, cte=0.0, rgba=(1, 1, 0, 1)),
    ]


@struct.dataclass
class VoxelBody:
    """Static (per-design) arrays precomputed once per phenotype.

    Per-voxel arrays are `(X, Y, Z)` / `(X, Y, Z, 3)`. Per-bond arrays are
    `(3, X, Y, Z)`: axis 0 indexes the bond direction d∈{X,Y,Z}; the bond at
    `(d, x, y, z)` connects voxel (x,y,z) ("vox1") to its +d neighbor
    ("vox2"). Boundary/missing bonds are masked.

    Cubic-lattice symmetry: Iy == Iz so the y/z beam constants coincide;
    we store one copy of each (reference computes both: VX_Bond.cpp:123-173).
    """

    # occupancy / identity
    occ: Any  # (X,Y,Z) bool
    mat: Any  # (X,Y,Z) int32
    nom_pos: Any  # (X,Y,Z,3) nominal voxel center positions [m]
    nominal_size: Any  # scalar lattice pitch [m]

    # per-voxel physical constants (reference: VX_Voxel.cpp:95-128)
    mass: Any
    mass_inv: Any
    inertia: Any
    inertia_inv: Any
    first_moment: Any
    e_mod: Any  # per-voxel elastic modulus (palette or evolved override)
    poisson: Any
    cte: Any
    u_static: Any
    u_dynamic: Any
    lin_stiffness: Any  # 2*E*L (floor normal stiffness, VX_Voxel.h:64)
    two_sq_mexs: Any  # 2*sqrt(M*E*L)   (translation damping factor)
    two_sq_iexsss: Any  # 2*sqrt(I*E*L^3) (rotation damping factor)

    # actuation / evo-devo per-voxel fields (reference: VXS_Voxel.h:92-111)
    phase_offset: Any
    final_phase_offset: Any
    temp_amp_damp: Any
    final_temp_amp_damp: Any
    initial_voxel_size: Any
    final_voxel_size: Any
    growth_time: Any
    start_growth_time: Any

    # boundary conditions
    dof_fixed: Any  # (X,Y,Z) int32 bitmask of DOF_*
    external_force: Any  # (X,Y,Z,3)
    external_disp: Any  # (X,Y,Z,3)
    external_tdisp: Any  # (X,Y,Z,3)

    # per-bond composite constants (reference: VX_Bond.cpp:65-173)
    bond_mask: Any  # (3,X,Y,Z) bool
    bond_homogeneous: Any  # (3,X,Y,Z) bool — same material both sides
    bond_e: Any  # composite E = 2*E1*E2/(E1+E2)
    bond_e1: Any
    bond_e2: Any
    # beam stiffness constants
    bond_a1: Any  # E*A/L
    bond_a2: Any  # G*J/L
    bond_b1: Any  # 12*E*I/L^3
    bond_b2: Any  # 6*E*I/L^2
    bond_b3: Any  # 2*E*I/L
    # 2*sqrt(k * m) critical-damping coefficients, per bond side
    d_a1m1: Any
    d_a1m2: Any
    d_a2i1: Any
    d_a2i2: Any
    d_b1m1: Any
    d_b1m2: Any
    d_b2fm1: Any
    d_b2fm2: Any
    d_b3i1: Any
    d_b3i2: Any

    # optional self-collision tables (core.collision.CollisionSystem)
    collision: Any = None

    # optional deformed-surface-mesh drag tables (envs.drag.MeshDragSystem);
    # when present, fluid environments use the reference-accurate per-facet
    # model instead of the voxel-face approximation
    mesh_drag: Any = None

    # nonlinear material model per voxel (reference: VX_Object.cpp:1472-1535
    # GetModelStress; gathered from the palette at build time)
    plastic_mod: Any = None  # (X,Y,Z) bilinear post-yield modulus
    yield_stress: Any = None  # (X,Y,Z)
    mat_temp_phase: Any = None  # (X,Y,Z) per-material temperature phase [rad]
    mat_model_vox: Any = None  # (X,Y,Z) int32 MDL_* id

    # MDL_DATA per-voxel stress-strain tables (gathered from the palette at
    # build time so the hot loop is gather-free; reference model:
    # VX_Object.cpp:1499-1532 GetModelStress MDL_DATA branch)
    ss_strain_vox: Any = None  # (X,Y,Z,P)
    ss_stress_vox: Any = None  # (X,Y,Z,P)
    ss_fail_strain_vox: Any = None  # (X,Y,Z) last data point strain
    ss_last_stress_vox: Any = None  # (X,Y,Z)
    ss_last_slope_vox: Any = None  # (X,Y,Z) 0 when the final slope decreases

    # per-voxel evolved-control parameter arrays (reference:
    # VXS_Voxel.h:105-110, populated at import VX_Sim.cpp:977-991).
    # Dormant in the reference's live dynamics (the PID pointing loop is
    # commented out; plasticity rate feeds GUI coloring) but part of the
    # genome surface, so they round-trip through VXA and are exposed here.
    stiffness_plasticity_rate: Any = None  # (X,Y,Z)
    kp: Any = None  # (X,Y,Z)
    ki: Any = None  # (X,Y,Z)
    antiwindup: Any = None  # (X,Y,Z)

    # volume-effects bond constants (reference: VX_Bond.cpp:90-97;
    # Eh = E/((1-2u)(1+u)) with composite E, u)
    bond_u: Any = None  # (3,X,Y,Z) composite Poisson 2*u1*u2/(u1+u2)
    bond_eh: Any = None  # (3,X,Y,Z) effective modulus Eh

    # static: True when every palette entry is (fail-)linear → fast stress path
    all_linear: bool = struct.field(pytree_node=False, default=True)

    # devo usage flags (static: gate code paths)
    using_phase_offset: bool = struct.field(pytree_node=False, default=True)
    using_final_phase_offset: bool = struct.field(pytree_node=False, default=False)
    using_temp_amp_damp: bool = struct.field(pytree_node=False, default=False)
    using_final_temp_amp_damp: bool = struct.field(pytree_node=False, default=False)
    using_initial_voxel_size: bool = struct.field(pytree_node=False, default=False)
    using_final_voxel_size: bool = struct.field(pytree_node=False, default=False)
    using_growth_time: bool = struct.field(pytree_node=False, default=False)
    using_start_growth_time: bool = struct.field(pytree_node=False, default=False)

    @property
    def grid_shape(self):
        return self.occ.shape

    @property
    def num_voxels(self):
        return jnp.sum(self.occ)


@struct.dataclass
class DevoState:
    """Dynamic development state for ballistic (velocity-adjusted)
    development (reference: VXS_Voxel.cpp:342-381).

    When the environment enables windowed speed traces
    (NumTimeStepsInWindow > 0 with NormDistByVol), the reference rebases
    each voxel's development every step once two speed windows exist:
    initialVoxelSize/finalVoxelSize/growthTime/startGrowthTime become
    *mutable per-voxel state*, pulled toward the current size whenever the
    robot's windowed speed drops by more than MaxSlowdownPermitted. The
    rollout driver maintains the windowed speeds (win_prev/win_last) from
    its CoM/volume trace; sim_step applies the rebase.

    NOTE a deliberate divergence: the reference reads
    ``WindowTrace[WindowTrace.size()]`` (VXS_Voxel.cpp:352) — one past the
    end of the vector, which is undefined behavior in C++. We implement
    the evident intent (the last two completed windows).
    """

    initial_voxel_size: Any  # (X,Y,Z) [m]
    final_voxel_size: Any  # (X,Y,Z) [m]
    original_final_voxel_size: Any  # (X,Y,Z) [m] — monotonicity bound
    growth_time: Any  # (X,Y,Z) [s]
    start_growth_time: Any  # (X,Y,Z) [s]
    win_prev: Any  # scalar — previous completed window's norm dist
    win_last: Any  # scalar — last completed window's norm dist
    win_count: Any  # scalar int — completed windows so far


@struct.dataclass
class SimState:
    """Dynamic state carried through the rollout scan.

    Mirrors CVXS_Voxel state (VXS_Voxel.h) + CVXS_Bond damping memory
    (VX_Bond.h _LastPos2/_LastAngle1/_LastAngle2) + plasticity high-water
    marks. One rollout = one SimState; batches via vmap.
    """

    pos: Any  # (X,Y,Z,3)
    quat: Any  # (X,Y,Z,4) (w,x,y,z)
    linmom: Any  # (X,Y,Z,3)
    angmom: Any  # (X,Y,Z,3)
    scale: Any  # (X,Y,Z) current actuated edge length
    last_scale: Any  # (X,Y,Z)

    # bond state (3,X,Y,Z[,3])
    small_angle: Any  # bool — small-angle hysteresis flag (VXS_BondInternal.h)
    last_pos2: Any  # (3,X,Y,Z,3) bond-frame _Pos2 memory for damping
    last_angle1: Any
    last_angle2: Any
    max_strain: Any  # (3,X,Y,Z) plasticity high-water mark
    strain_offset: Any  # (3,X,Y,Z) plastic strain offset

    time: Any  # scalar sim time [s]
    diverged: Any  # scalar bool — strain blow-up flag (VX_Sim.cpp:1775)

    # KE history for equilibrium mode / stop conditions (6 deep,
    # reference: VX_Sim.h KinEHistory)
    ke_history: Any  # (6,)

    # volume-effects Poisson coupling, written by the voxel pass at step t
    # and read by the bond stress at step t+1 (reference: VXS_Voxel.cpp:543-632
    # writes TStrainSum1/2, CSArea1/2 into the bonds). Index 0 = bond side 1
    # (owner voxel), index 1 = side 2 (+d neighbor). None when the volume-
    # effects feature is off (the scan then carries no extra state).
    ts_sum: Any = None  # (2,3,X,Y,Z) transverse strain sums
    cs_area: Any = None  # (2,3,X,Y,Z) current cross-section areas
    # the dt member: under volume effects the reference recomputes
    # dt = DtFrac·CalcMaxDt every step from the evolving effective bond
    # stiffness (VX_Sim.cpp:1792-1794), and the bond damping pass still
    # reads the PREVIOUS step's value. 0 = seed from the caller's dt.
    cur_dt: Any = None  # scalar; None when volume effects are off

    # ballistic-development state (None unless enabled — see DevoState)
    devo: Any = None

    # per-step scalar statistics consumed by stop conditions (reference:
    # VX_Sim.cpp:1685-1687 history pushes). total_strain_e replicates
    # CalcStrainEnergy summed over bonds (VXS_Bond.cpp:115-122);
    # max_vox_vel is SS.MaxVoxVel (MaxMoveHistory entry = MaxVoxVel*dt).
    total_strain_e: Any = None
    max_vox_vel: Any = None
