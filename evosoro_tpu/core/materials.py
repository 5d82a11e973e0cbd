"""Palette → per-voxel / per-bond constant precomputation.

Replicates the derived quantities of the reference engine:
- per-voxel mass/inertia/damping factors (reference: VX_Voxel.cpp:95-128)
- per-bond composite moduli and beam constants (reference: VX_Bond.cpp:65-173)
- stability timestep (reference: VX_Sim.cpp:1693-1727 CalcMaxDt)

All precompute is plain jnp so it jits and vmaps (e.g. per-rollout evolved
stiffness for the land_water-style per-voxel E override).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from evosoro_tpu.core.types import Material, MaterialPalette, VoxelBody


def palette_from_list(materials: Sequence[Material], dtype=jnp.float32) -> MaterialPalette:
    """Pack Material entries into id-indexed arrays. Index 0 = empty space."""
    from evosoro_tpu.core.types import MDL_DATA, validate_ss_data

    # MDL_DATA entries derive their scalar fields from the point tables
    # (reference: ValidateSSData is called at material load,
    # VX_Object.cpp:1409)
    materials = [
        validate_ss_data(m) if m.mat_model == MDL_DATA else m
        for m in materials
    ]
    n = max(m.id for m in materials) + 1
    f = {k: np.zeros(n) for k in (
        "elastic_mod", "density", "poisson", "cte", "u_static", "u_dynamic",
        "plastic_mod", "yield_stress", "fail_stress", "fail_strain",
        "mat_temp_phase")}
    mat_model = np.zeros(n, dtype=np.int32)
    for m in materials:
        f["elastic_mod"][m.id] = m.elastic_mod
        f["density"][m.id] = m.density
        f["poisson"][m.id] = m.poissons_ratio
        f["cte"][m.id] = m.cte
        f["u_static"][m.id] = m.u_static
        f["u_dynamic"][m.id] = m.u_dynamic
        f["plastic_mod"][m.id] = m.plastic_mod
        f["yield_stress"][m.id] = m.yield_stress
        f["fail_stress"][m.id] = m.fail_stress
        f["fail_strain"][m.id] = m.fail_strain
        f["mat_temp_phase"][m.id] = m.mat_temp_phase
        mat_model[m.id] = m.mat_model
    # MDL_DATA tables, lane-padded to the palette-wide max point count.
    # Pad strain with a +1e30 sentinel so padded segments never match the
    # step()'s segment search; pad stress with the last value.
    ss = {}
    if any(m.mat_model == MDL_DATA for m in materials):
        P = max(len(m.ss_strain) for m in materials if m.mat_model == MDL_DATA)
        ss_strain = np.full((n, P), 1e30)
        ss_stress = np.zeros((n, P))
        ss_last_slope = np.zeros(n)
        ss_last_stress = np.zeros(n)
        ss_strain[:, 0] = 0.0
        for m in materials:
            if m.mat_model != MDL_DATA:
                continue
            k = len(m.ss_strain)
            ss_strain[m.id, :k] = m.ss_strain
            ss_stress[m.id, :k] = m.ss_stress
            ss_stress[m.id, k:] = m.ss_stress[-1]
            ss_last_stress[m.id] = m.ss_stress[-1]
            slope = (m.ss_stress[-1] - m.ss_stress[-2]) / (
                m.ss_strain[-1] - m.ss_strain[-2])
            # decreasing final slope → flat post-fail stress (ref :1522-1528)
            ss_last_slope[m.id] = max(slope, 0.0) if (
                m.ss_stress[-1] >= m.ss_stress[-2]) else 0.0
        ss = dict(
            ss_strain=jnp.asarray(ss_strain, dtype=dtype),
            ss_stress=jnp.asarray(ss_stress, dtype=dtype),
            ss_last_slope=jnp.asarray(ss_last_slope, dtype=dtype),
            ss_last_stress=jnp.asarray(ss_last_stress, dtype=dtype),
        )
    return MaterialPalette(
        **{k: jnp.asarray(v, dtype=dtype) for k, v in f.items()},
        mat_model=jnp.asarray(mat_model),
        num_materials=n - 1,
        **ss,
    )


def _safe_div(a, b):
    return jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)


def build_body(
    structure,
    palette: MaterialPalette,
    lattice_dim=0.01,
    phase_offset=None,
    final_phase_offset=None,
    temp_amp_damp=None,
    final_temp_amp_damp=None,
    initial_voxel_size=None,
    final_voxel_size=None,
    growth_time=None,
    start_growth_time=None,
    stiffness=None,
    cte_scale=None,
    stiffness_plasticity_rate=None,
    kp=None,
    ki=None,
    antiwindup=None,
    dof_fixed=None,
    external_force=None,
    external_disp=None,
    external_tdisp=None,
    dtype=jnp.float32,
) -> VoxelBody:
    """Build the static VoxelBody from a (X,Y,Z) int array of material ids.

    `stiffness` optionally overrides the palette elastic modulus per voxel
    (land_water fork's evolved-stiffness capability: VX_Object.cpp:1474).
    Optional per-voxel arrays mirror the VXC <PhaseOffset>/<Stiffness>/... tags
    (reference: VX_Object.h:183-258).
    """
    structure = jnp.asarray(structure, dtype=jnp.int32)
    X, Y, Z = structure.shape
    occ = structure > 0
    L = jnp.asarray(lattice_dim, dtype=dtype)

    def g(field):  # gather palette property per voxel
        return jnp.asarray(field, dtype=dtype)[structure]

    e_mod = g(palette.elastic_mod)
    if stiffness is not None:
        s = jnp.asarray(stiffness, dtype=dtype)
        e_mod = jnp.where((s > 0) & occ, s, e_mod)
    density = g(palette.density)
    poisson = g(palette.poisson)
    cte = g(palette.cte)
    if cte_scale is not None:
        # per-voxel CTE multiplier — carries the evaluator's per-material
        # actuation-variance noise (reference jitters the written palette's
        # CTE per muscle material, read_write_voxelyze.py:243,267)
        cte = cte * jnp.asarray(cte_scale, dtype=dtype)
    u_static = g(palette.u_static)
    u_dynamic = g(palette.u_dynamic)

    # voxel centers at (i+0.5)*L (reference: VX_Object.cpp:538-543 GetXYZ)
    ix, iy, iz = jnp.meshgrid(
        jnp.arange(X), jnp.arange(Y), jnp.arange(Z), indexing="ij"
    )
    nom_pos = (jnp.stack([ix, iy, iz], axis=-1).astype(dtype) + 0.5) * L

    # mass/inertia (reference: VX_Voxel.cpp:109-125)
    vol = L * L * L
    mass = jnp.where(occ, vol * density, 0.0)
    inertia = mass * (L * L) / 6.0
    first_moment = mass * L / 2.0
    mass_inv = _safe_div(jnp.ones_like(mass), mass)
    inertia_inv = _safe_div(jnp.ones_like(inertia), inertia)
    two_sq_mexs = 2.0 * jnp.sqrt(mass * e_mod * L)
    two_sq_iexsss = 2.0 * jnp.sqrt(inertia * e_mod * L * L * L)
    lin_stiffness = 2.0 * e_mod * L  # floor normal stiffness (VX_Voxel.h:64)

    # ---- per-bond constants (3,X,Y,Z) ----
    def nbr(a, d):  # value at +d neighbor (wrapped values get masked out)
        return jnp.roll(a, -1, axis=d)

    def edge_ok(d):  # True except on the last slab along axis d
        idx = [ix, iy, iz][d]
        return idx < structure.shape[d] - 1

    bm, bhom, be, be1, be2 = [], [], [], [], []
    for d in range(3):
        occ2 = nbr(occ, d)
        mask = occ & occ2 & edge_ok(d)
        e1, e2 = e_mod, nbr(e_mod, d)
        bm.append(mask)
        bhom.append(mask & (structure == nbr(structure, d)))
        be.append(jnp.where(mask, 2.0 * _safe_div(e1 * e2, e1 + e2), 0.0))
        be1.append(jnp.where(mask, e1, 0.0))
        be2.append(jnp.where(mask, e2, 0.0))
    bond_mask = jnp.stack(bm)
    bond_homogeneous = jnp.stack(bhom)
    bond_e = jnp.stack(be)
    bond_e1 = jnp.stack(be1)
    bond_e2 = jnp.stack(be2)

    # composite Poisson 2*u1*u2/(u1+u2) (reference: VX_Bond.cpp:91-92)
    u1 = jnp.broadcast_to(poisson, (3, X, Y, Z))
    u2 = jnp.stack([nbr(poisson, d) for d in range(3)])
    bond_u = jnp.where(u1 + u2 != 0, 2.0 * _safe_div(u1 * u2, u1 + u2), 0.0)

    # beam geometry for cubic section (reference: VX_Bond.cpp:123-141):
    # A=L², Iy=Iz=L⁴/12, J=L⁴/6
    A = L * L
    I = L ** 4 / 12.0
    J = L ** 4 / 6.0
    G_over_E = 1.0 / (2.0 * (1.0 + bond_u))
    # effective modulus under volume effects: per-side Eᵢh = Eᵢ/((1-2uᵢ)(1+uᵢ))
    # then harmonic composite Eh = 2·E1h·E2h/(E1h+E2h) — the reference's live
    # code path (VX_Bond.cpp UpdateConstants), NOT the commented-out
    # composite-E/composite-u formula, which diverges ~36% when the two sides'
    # Poisson ratios differ.
    def _side_eh(e, u):
        denom = (1.0 - 2.0 * u) * (1.0 + u)
        return jnp.where(denom != 0, _safe_div(e, denom), e)

    e1h = _side_eh(bond_e1, u1)
    e2h = _side_eh(bond_e2, u2)
    bond_eh = jnp.where(
        e1h + e2h != 0, 2.0 * _safe_div(e1h * e2h, e1h + e2h), 0.0
    )
    bond_a1 = bond_e * A / L
    bond_a2 = bond_e * G_over_E * J / L  # G*J/L with G = E/(2(1+u))
    bond_b1 = 12.0 * bond_e * I / L ** 3
    bond_b2 = 6.0 * bond_e * I / L ** 2
    bond_b3 = 2.0 * bond_e * I / L

    # critical damping coefficients 2*sqrt(k*m) (reference: VX_Bond.cpp:149-170)
    m1 = jnp.broadcast_to(mass, (3, X, Y, Z))
    m2 = jnp.stack([nbr(mass, d) for d in range(3)])
    i1 = jnp.broadcast_to(inertia, (3, X, Y, Z))
    i2 = jnp.stack([nbr(inertia, d) for d in range(3)])
    fm1 = jnp.broadcast_to(first_moment, (3, X, Y, Z))
    fm2 = jnp.stack([nbr(first_moment, d) for d in range(3)])

    def dcoef(k, m):
        return 2.0 * jnp.sqrt(jnp.maximum(k * m, 0.0))

    zeros = jnp.zeros((X, Y, Z), dtype=dtype)

    def opt(a, like=zeros):
        return jnp.asarray(a, dtype=dtype) if a is not None else like

    def opt_f32(a, like=zeros):
        """Devo/actuation per-voxel fields round through float32: the
        reference stores them as `float` members (VXS_Voxel.h:91-110), so
        double-precision parity requires the same quantization."""
        if a is None:
            return like
        return jnp.asarray(a).astype(jnp.float32).astype(dtype)

    # nonlinear material models: static fast-path flag (LINEAR and
    # LINEAR_FAIL share the linear stress curve — VX_Object.cpp:1482-1495;
    # bond breakage bookkeeping is handled at the fitness layer, not here)
    from evosoro_tpu.core.types import MDL_BILINEAR, MDL_DATA

    try:
        mm = np.asarray(palette.mat_model)
        all_linear = bool(np.all((mm != MDL_BILINEAR) & (mm != MDL_DATA)))
    except Exception:  # palette is traced (e.g. built under jit) → general path
        all_linear = False

    # MDL_DATA per-voxel tables (hot loop stays gather-free)
    ss_fields = {}
    if palette.ss_strain is not None:
        ss_fields = dict(
            ss_strain_vox=palette.ss_strain[structure],
            ss_stress_vox=palette.ss_stress[structure],
            ss_fail_strain_vox=g(palette.fail_strain),
            ss_last_stress_vox=g(palette.ss_last_stress),
            ss_last_slope_vox=g(palette.ss_last_slope),
        )

    return VoxelBody(
        occ=occ,
        mat=structure,
        nom_pos=nom_pos,
        nominal_size=L,
        mass=mass,
        mass_inv=mass_inv,
        inertia=inertia,
        inertia_inv=inertia_inv,
        first_moment=first_moment,
        e_mod=e_mod,
        poisson=poisson,
        cte=cte,
        u_static=u_static,
        u_dynamic=u_dynamic,
        lin_stiffness=lin_stiffness,
        two_sq_mexs=two_sq_mexs,
        two_sq_iexsss=two_sq_iexsss,
        phase_offset=opt_f32(phase_offset),
        final_phase_offset=opt_f32(final_phase_offset),
        temp_amp_damp=opt_f32(temp_amp_damp, jnp.ones((X, Y, Z), dtype=dtype)),
        final_temp_amp_damp=opt_f32(
            final_temp_amp_damp, jnp.ones((X, Y, Z), dtype=dtype)
        ),
        initial_voxel_size=opt_f32(initial_voxel_size),
        final_voxel_size=opt_f32(final_voxel_size),
        growth_time=opt_f32(growth_time),
        start_growth_time=opt_f32(start_growth_time),
        dof_fixed=(jnp.asarray(dof_fixed, dtype=jnp.int32)
                   if dof_fixed is not None else jnp.zeros((X, Y, Z), jnp.int32)),
        external_force=opt(external_force, jnp.zeros((X, Y, Z, 3), dtype=dtype)),
        external_disp=opt(external_disp, jnp.zeros((X, Y, Z, 3), dtype=dtype)),
        external_tdisp=opt(external_tdisp, jnp.zeros((X, Y, Z, 3), dtype=dtype)),
        bond_mask=bond_mask,
        bond_homogeneous=bond_homogeneous,
        bond_e=bond_e,
        bond_e1=bond_e1,
        bond_e2=bond_e2,
        bond_a1=bond_a1,
        bond_a2=bond_a2,
        bond_b1=bond_b1,
        bond_b2=bond_b2,
        bond_b3=bond_b3,
        d_a1m1=dcoef(bond_a1, m1),
        d_a1m2=dcoef(bond_a1, m2),
        d_a2i1=dcoef(bond_a2, i1),
        d_a2i2=dcoef(bond_a2, i2),
        d_b1m1=dcoef(bond_b1, m1),
        d_b1m2=dcoef(bond_b1, m2),
        d_b2fm1=dcoef(bond_b2, fm1),
        d_b2fm2=dcoef(bond_b2, fm2),
        d_b3i1=dcoef(bond_b3, i1),
        d_b3i2=dcoef(bond_b3, i2),
        stiffness_plasticity_rate=(
            opt_f32(stiffness_plasticity_rate)
            if stiffness_plasticity_rate is not None else None
        ),
        kp=opt_f32(kp) if kp is not None else None,
        ki=opt_f32(ki) if ki is not None else None,
        antiwindup=opt_f32(antiwindup) if antiwindup is not None else None,
        plastic_mod=g(palette.plastic_mod),
        yield_stress=g(palette.yield_stress),
        mat_temp_phase=g(palette.mat_temp_phase),
        mat_model_vox=jnp.asarray(palette.mat_model)[structure],
        bond_u=bond_u,
        bond_eh=bond_eh,
        all_linear=all_linear,
        using_phase_offset=phase_offset is not None,
        using_final_phase_offset=final_phase_offset is not None,
        using_temp_amp_damp=temp_amp_damp is not None,
        using_final_temp_amp_damp=final_temp_amp_damp is not None,
        using_initial_voxel_size=initial_voxel_size is not None,
        using_final_voxel_size=final_voxel_size is not None,
        using_growth_time=growth_time is not None,
        using_start_growth_time=start_growth_time is not None,
        **ss_fields,
    )


def devo_params_from_vxa(
    raw: dict,
    sim,
    env,
    nominal_size,
    structure,
) -> dict:
    """Apply the reference's import-time devo transforms
    (reference: VX_Sim.cpp:878-965 ResetSimulation).

    The VXA's per-voxel devo arrays hold *normalized genome outputs*
    (sigmoids in [-1,1]/[0,1]); the engine maps them to physical sizes and
    absolute times at import:

    - InitialVoxelSize/FinalVoxelSize: size = max(1 + growth_amplitude·raw,
      min_temp_fact) · nominal_size; absent initial → nominal; absent final
      → initial (no growth).
    - StartGrowthTime: raw·(onset_bound − init_cm_time) + init_cm_time,
      capped at onset_bound − min_growth_time; absent → init_cm_time when
      any size/growth output is evolved else "never" (stop − freeze).
    - GrowthTime: raw·(termination_bound − start − freeze), floored at
      min_growth_time; absent → full window when a final size is evolved.

    onset/termination bounds are the parent's lifetime when the env marks
    them relative (reference: VX_Sim.cpp:888-889), else the stop condition.

    `raw` keys (lowercase): initialvoxelsize, finalvoxelsize, growthtime,
    startgrowthtime — values (X,Y,Z) arrays or None. Returns kwargs for
    `build_body` (actual sizes [m] / times [s]), omitting absent outputs.
    """
    import numpy as np

    raw_init = raw.get("initialvoxelsize")
    raw_final = raw.get("finalvoxelsize")
    raw_growth = raw.get("growthtime")
    raw_start = raw.get("startgrowthtime")
    if all(a is None for a in (raw_init, raw_final, raw_growth, raw_start)):
        return {}

    stop = float(sim.stop_condition_value)
    init_cm = float(sim.init_cm_time)
    freeze = float(sim.mid_life_freeze_time)
    parent = float(getattr(sim, "parent_lifetime", 0.0)) or stop
    # the bounds are float32 voxel members in the reference
    # (VXS_Voxel.h:102-103 onsetBound/terminationBound) — quantize to match
    onset_bound = float(np.float32(parent if env.onset_relative else stop))
    term_bound = float(np.float32(parent if env.termination_relative else stop))
    gamp = float(env.growth_amplitude)
    min_tf = float(sim.min_temp_fact)
    min_gt = float(env.min_growth_time)
    L = float(nominal_size)
    shape = np.asarray(structure).shape

    if raw_init is not None:
        init_size = np.maximum(1.0 + gamp * np.asarray(raw_init), min_tf) * L
    else:
        init_size = np.full(shape, L)
    if raw_final is not None:
        final_size = np.maximum(1.0 + gamp * np.asarray(raw_final), min_tf) * L
    else:
        final_size = init_size

    if raw_start is not None:
        start = np.asarray(raw_start) * (onset_bound - init_cm) + init_cm
        start = np.minimum(start, onset_bound - min_gt)
    elif raw_final is not None or raw_growth is not None:
        start = np.full(shape, init_cm)
    else:
        start = np.full(shape, stop - freeze)
    # startGrowthTime is stored float32 before growthTime reads it back
    # (reference: VXS_Voxel.h:97, VX_Sim.cpp:958-974)
    start = np.float64(np.float32(start))

    if raw_growth is not None:
        growth = np.asarray(raw_growth) * (term_bound - start - freeze)
        growth = np.maximum(growth, min_gt)
    elif raw_final is not None:
        growth = term_bound - start - freeze
    else:
        growth = np.full(shape, min_gt)

    out = {
        "start_growth_time": start,
        "growth_time": growth,
    }
    if raw_init is not None:
        out["initial_voxel_size"] = init_size
    if raw_final is not None or raw_init is not None:
        out["final_voxel_size"] = final_size
    return out


def calc_max_dt(body: VoxelBody, volume_effects: bool = False) -> jnp.ndarray:
    """Stability timestep 1/(2π·max√(k/m)) over all bonds
    (reference: VX_Sim.cpp:1693-1727).

    k = a1 linear stiffness normally; with `volume_effects` the reference
    uses the bond's *effective* stiffness Eh·(CS1+CS2)/(2·(ε·L+L))
    (VXS_Bond.h:34), which at rest (ε=0, CS=L²) is Eh·L — and recomputes dt
    EVERY step as strains/areas evolve (VX_Sim.cpp:1792-1794). This function
    gives the rest value; `core.step` recomputes it in-step for rollouts."""
    if volume_effects:
        k = body.bond_eh * body.nominal_size
    else:
        k = body.bond_a1
    m1 = jnp.broadcast_to(body.mass, k.shape)
    m2 = jnp.stack([jnp.roll(body.mass, -1, axis=d) for d in range(3)])
    f2_1 = jnp.where(body.bond_mask, _safe_div(k, m1), 0.0)
    f2_2 = jnp.where(body.bond_mask, _safe_div(k, m2), 0.0)
    max_freq2 = jnp.maximum(jnp.max(f2_1), jnp.max(f2_2))
    max_freq = jnp.sqrt(max_freq2)
    # truncated π replicates the reference's dt bit-for-bit
    # (VX_Sim.cpp:1725 uses the literal 3.1415926)
    from evosoro_tpu.core.constants import REF_PI_DOUBLE

    return jnp.where(
        max_freq > 0, 1.0 / (2.0 * REF_PI_DOUBLE * max_freq), 0.0
    )
