"""One physics timestep over the dense voxel lattice — fused 3D stencil.

This is the TPU-native re-design of the reference per-step hot path
(reference call stack: VX_Sim.cpp:1054 TimeStep → 1763 Integrate →
VXS_BondInternal.cpp:56 CalcLinForce → VXS_Voxel.cpp:169 EulerStep).
Instead of bond/voxel object arrays with pointers, everything is dense
`(X,Y,Z)` arrays; bonds live on the 3 positive lattice directions and each
voxel gathers its 6 neighbor force contributions by shifted reads — a
stencil XLA maps onto the VPU with full fusion (a Pallas version of the
same math lives in `evosoro_tpu.ops`).

All branches of the reference become `jnp.where` selections, which keeps
the update traceable, differentiable, and batchable with `vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from evosoro_tpu.core import quaternion as q
from evosoro_tpu.core.constants import (
    DEFAULT_PRECISION,
    DIVERGENCE_STRAIN,
    HYSTERESIS_FACTOR,
    REF_PI_DOUBLE,
    REF_PI_FLOAT,
    SA_BOND_EXT_PERC,
    Precision,
)
from evosoro_tpu.core.types import (
    DOF_TX,
    DOF_TY,
    DOF_TZ,
    DOF_X,
    DOF_Y,
    DOF_Z,
    EnvParams,
    SimParams,
    SimState,
    VoxelBody,
)


def _safe_div(a, b):
    nz = b != 0
    return jnp.where(nz, a / jnp.where(nz, b, 1.0), 0.0)


def _safe_norm(*components):
    """|v| with a zero (not NaN) gradient at v = 0 (double-where trick)."""
    sq = sum(c * c for c in components)
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


# ---------------------------------------------------------------------------
# Axis-frame permutations (reference: VX_Bond.h:45-48 ToXDirBond/ToOrigDirBond)
# ---------------------------------------------------------------------------

def _to_x_vec(d, v):
    """Rotate a vector so bond axis d looks like +X (90° lattice rotation)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    if d == 0:
        return v
    if d == 1:  # AXIS_Y: new = (y, -x, z)
        return jnp.stack([y, -x, z], axis=-1)
    return jnp.stack([z, y, -x], axis=-1)  # AXIS_Z: new = (z, y, -x)


def _to_orig_vec(d, v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    if d == 0:
        return v
    if d == 1:  # inverse of AXIS_Y: new = (-y, x, z)
        return jnp.stack([-y, x, z], axis=-1)
    return jnp.stack([-z, y, x], axis=-1)


def _to_x_quat(d, quat):
    w = quat[..., :1]
    return jnp.concatenate([w, _to_x_vec(d, quat[..., 1:])], axis=-1)


def _nbr(a, d):
    """Value of the +d neighbor; wrapped entries are masked by bond_mask."""
    return jnp.roll(a, -1, axis=d)


def _from_nbr(a, d):
    """Bring a per-bond value back to the voxel at -d of the bond owner."""
    return jnp.roll(a, 1, axis=d)


def _vox_mat_stress(strain, e_mod, mat_model, plastic_mod, yield_stress,
                    ss=None):
    """Material-model stress at a strain (reference: VX_Object.cpp:1472-1535
    GetModelStress). MDL_LINEAR / MDL_LINEAR_FAIL are the linear curve
    (failure only sets bookkeeping flags); MDL_BILINEAR kinks at the yield
    point; MDL_DATA interpolates the material's stress-strain point table
    (ss = per-voxel tables gathered at body build, None when no palette
    entry is MDL_DATA)."""
    from evosoro_tpu.core.types import MDL_BILINEAR, MDL_DATA

    linear = e_mod * strain
    yield_strain = _safe_div(yield_stress, e_mod)
    bilinear = jnp.where(
        strain > yield_strain,
        yield_stress + plastic_mod * (strain - yield_strain),
        linear,
    )
    out = jnp.where(mat_model == MDL_BILINEAR, bilinear, linear)
    if ss is not None:
        xs, ys = ss["xs"], ss["ys"]  # (..., P)
        P = xs.shape[-1]
        s = strain[..., None]
        # first segment i with xs[i+1] > strain; padded entries are +1e30 so
        # they never count, and strain < 0 lands in segment 0 → linear
        # extrapolation of the first segment = Elastic_Mod·strain
        # (reference: VX_Object.cpp:1505-1517)
        seg = jnp.sum(
            (xs[..., 1:P - 1] <= s).astype(jnp.int32), axis=-1
        )  # (...,) in [0, P-2]
        oh = jax.nn.one_hot(seg, P - 1, dtype=strain.dtype)  # (..., P-1)
        x1 = jnp.sum(oh * xs[..., :-1], axis=-1)
        x2 = jnp.sum(oh * xs[..., 1:], axis=-1)
        y1 = jnp.sum(oh * ys[..., :-1], axis=-1)
        y2 = jnp.sum(oh * ys[..., 1:], axis=-1)
        interp = y1 + _safe_div(strain - x1, x2 - x1) * (y2 - y1)
        past = ss["last_stress"] + ss["last_slope"] * (strain - ss["fail"])
        data = jnp.where(strain < ss["fail"], interp, past)
        out = jnp.where(mat_model == MDL_DATA, data, out)
    return out


def _volume_effects_coupling(bonds, body: VoxelBody):
    """Voxel-pass Poisson coupling (reference: VXS_Voxel.cpp:543-632).

    From the per-direction bond strains just computed, derive each voxel's
    local strain vector (with pow(1+ε,−μ)−1 transverse contraction on
    unconstrained axes), then write per-bond-side transverse strain sums and
    cross-section areas for the next step's bond stress. Returns
    (ts_sum, cs_area), each (2,3,X,Y,Z)."""
    mu = body.poisson
    L = body.nominal_size

    sp, sn, pd, nd = [], [], [], []
    for d in range(3):
        sp.append(bonds[d]["sv1"])  # StrainPosDirsCur
        sn.append(_from_nbr(bonds[d]["sv2"], d))  # StrainNegDirsCur
        pd.append(body.bond_mask[d])
        nd.append(_from_nbr(body.bond_mask[d], d))

    from evosoro_tpu.core.types import DOF_X, DOF_Y, DOF_Z

    T, axis_strain = [], []
    for a, bit in enumerate((DOF_X, DOF_Y, DOF_Z)):
        fixed = (body.dof_fixed & bit) != 0
        forced = body.external_force[..., a] != 0
        T.append((pd[a] & nd[a]) | ((pd[a] | nd[a]) & (fixed | forced)))
        s = jnp.where(
            pd[a] & nd[a],
            0.5 * (sp[a] + sn[a]),
            jnp.where(pd[a], sp[a], jnp.where(nd[a], sn[a], 0.0)),
        )
        axis_strain.append(jnp.where(T[a], s, 0.0))

    def pw(s):  # transverse contraction; guard 1+ε>0 so pow stays finite
        return jnp.power(jnp.maximum(1.0 + s, 1e-6), -mu) - 1.0

    tx, ty, tz = T
    c0x, c0y, c0z = axis_strain
    # exclusive (Tx,Ty,Tz) case table (reference: :586-594)
    cx = jnp.where(
        ~tx & ty & tz, pw(c0y + c0z),
        jnp.where(~tx & ~ty & tz, pw(c0z), jnp.where(~tx & ty & ~tz, pw(c0y), c0x)),
    )
    cy = jnp.where(
        tx & ~ty & tz, pw(c0x + c0z),
        jnp.where(~tx & ~ty & tz, pw(c0z), jnp.where(tx & ~ty & ~tz, pw(c0x), c0y)),
    )
    cz = jnp.where(
        tx & ty & ~tz, pw(c0x + c0y),
        jnp.where(~tx & ty & ~tz, pw(c0y), jnp.where(tx & ~ty & ~tz, pw(c0x), c0z)),
    )

    L2 = L * L
    # per bond axis: transverse sum / area from the two *other* axes
    # (reference: :601-620; AXIS_Z uses y+x)
    ts_ax = [cy + cz, cx + cz, cy + cx]
    cs_ax = [
        (1.0 + cy) * (1.0 + cz) * L2,
        (1.0 + cx) * (1.0 + cz) * L2,
        (1.0 + cy) * (1.0 + cx) * L2,
    ]
    ts1, ts2, cs1, cs2 = [], [], [], []
    for d in range(3):
        m = body.bond_mask[d]
        ts1.append(jnp.where(m, ts_ax[d], 0.0))
        ts2.append(jnp.where(m, _nbr(ts_ax[d], d), 0.0))
        cs1.append(jnp.where(m, cs_ax[d], L2))
        cs2.append(jnp.where(m, _nbr(cs_ax[d], d), L2))
    ts_sum = jnp.stack([jnp.stack(ts1), jnp.stack(ts2)])
    cs_area = jnp.stack([jnp.stack(cs1), jnp.stack(cs2)])
    return ts_sum, cs_area


# ---------------------------------------------------------------------------
# Bond forces (reference: VXS_BondInternal.cpp:56-187 CalcLinForce
#              + 189-307 UpdateBondStrain + 310-346 AddDampForces)
# ---------------------------------------------------------------------------

def _bond_axis_forces(d, state: SimState, body: VoxelBody, sim: SimParams,
                      env: EnvParams, dt, prec: Precision):
    mask = body.bond_mask[d]
    maskf = mask[..., None]
    L = body.nominal_size

    rel = _to_x_vec(d, _nbr(state.pos, d) - state.pos)
    q1 = _to_x_quat(d, state.quat)
    q2 = _to_x_quat(d, _nbr(state.quat, d))

    ang1_rel = q.quat_rotate_inv(q1, rel)
    new_ang2 = q.quat_multiply(q.quat_conjugate(q1), q2)

    if sim.volume_effects_enabled:
        nom_dist = jnp.broadcast_to(L, mask.shape)
    else:
        nom_dist = (state.scale + _nbr(state.scale, d)) * 0.5

    rx, ry, rz = ang1_rel[..., 0], ang1_rel[..., 1], ang1_rel[..., 2]
    small_turn = _safe_div(jnp.abs(rz) + jnp.abs(ry), rx)
    extend_perc = _safe_div(rx, nom_dist)

    sa_prev = state.small_angle[d]
    go_small = (
        (~sa_prev)
        & q.quat_is_small_angle(new_ang2, prec)
        & (small_turn < prec.sa_bond_bend_rad)
        & (extend_perc < SA_BOND_EXT_PERC)
    )
    go_large = sa_prev & (
        (~q.quat_is_smallish_angle(new_ang2, prec))
        | (small_turn > HYSTERESIS_FACTOR * prec.sa_bond_bend_rad)
        | (extend_perc > HYSTERESIS_FACTOR * SA_BOND_EXT_PERC)
    )
    small = jnp.where(go_small, True, jnp.where(go_large, False, sa_prev))
    changed = go_small | go_large

    # --- small-angle frame (reference: :87-100) ---
    a2_small = q.quat_to_rotation_vector(new_ang2, prec)
    pos2_small = ang1_rel.at[..., 0].add(-nom_dist)
    totrot_small = q.quat_conjugate(q1)

    # --- large-angle frame (reference: :101-118) ---
    p2ar = q.quat_from_angle_to_pos_x(ang1_rel, prec)
    totrot_large = q.quat_multiply(p2ar, q.quat_conjugate(q1))
    length = _safe_norm(rel[..., 0], rel[..., 1], rel[..., 2])
    pos2_large = jnp.stack(
        [length - nom_dist, jnp.zeros_like(length), jnp.zeros_like(length)], axis=-1
    )
    a1_large = q.quat_to_rotation_vector(p2ar, prec)
    a2_large = q.quat_to_rotation_vector(q.quat_multiply(totrot_large, q2), prec)

    sm = small[..., None]
    _pos2 = jnp.where(sm, pos2_small, pos2_large)
    _a1 = jnp.where(sm, jnp.zeros_like(a1_large), a1_large)
    _a2 = jnp.where(sm, a2_small, a2_large)
    totrot = jnp.where(sm, totrot_small, totrot_large)

    # --- axial strain & two-material stress (reference: :189-307) ---
    strain = _safe_div(_pos2[..., 0], L)
    E1, E2, E = body.bond_e1[d], body.bond_e2[d], body.bond_e[d]
    if sim.volume_effects_enabled:
        # Poisson-coupled stress σ = Eh(1−u)ε + Eh·u·(TS1+TS2)/2 using the
        # transverse strain sums the voxel pass wrote last step (reference:
        # VXS_BondInternal.cpp:200-222). The reference leaves the per-side
        # strains at their initial 0 for heterogeneous bonds in this mode
        # (CurStrainV1/V2 untouched, VXS_Bond.cpp:66-67) — replicated.
        u = body.bond_u[d]
        eh = body.bond_eh[d]
        ts_avg = 0.5 * (state.ts_sum[0, d] + state.ts_sum[1, d])
        stress = eh * (1.0 - u) * strain + eh * u * ts_avg
        hom = body.bond_homogeneous[d]
        sv1 = jnp.where(hom, strain, 0.0)
        sv2 = sv1
    elif body.all_linear:
        s_sum = E1 + E2
        # reference iterates strains until per-side stresses agree within
        # 0.05%; for linear materials the fixed point is exact after one
        # iteration, and the entry tolerance |S1-S2| <= 5e-4·|S1+S2| reduces
        # to a modulus test:
        near_equal = jnp.abs(E1 - E2) <= 0.0005 * jnp.abs(s_sum)
        hom = body.bond_homogeneous[d] | near_equal
        stress = jnp.where(hom, 0.5 * s_sum * strain, E * strain)
        sv1 = jnp.where(hom, strain, 2.0 * _safe_div(E2, s_sum) * strain)
        sv2 = jnp.where(hom, strain, 2.0 * _safe_div(E1, s_sum) * strain)
    else:
        # nonlinear materials: per-side stress from the material model with
        # the reference's 3-iteration stress-equalization loop (reference:
        # VXS_BondInternal.cpp:237-253; model: VX_Object.cpp:1472-1535)
        side1 = (body.e_mod, body.mat_model_vox, body.plastic_mod,
                 body.yield_stress)
        side2 = tuple(_nbr(a, d) for a in side1)
        ss1 = ss2 = None
        if body.ss_strain_vox is not None:
            ss1 = dict(
                xs=body.ss_strain_vox, ys=body.ss_stress_vox,
                fail=body.ss_fail_strain_vox,
                last_stress=body.ss_last_stress_vox,
                last_slope=body.ss_last_slope_vox,
            )
            ss2 = {k: _nbr(v, d) for k, v in ss1.items()}
        sv1 = strain
        sv2 = strain
        s1 = _vox_mat_stress(sv1, *side1, ss=ss1)
        s2 = _vox_mat_stress(sv2, *side2, ss=ss2)
        for _ in range(3):
            ssum = s1 + s2
            converged = jnp.abs(s1 - s2) <= 0.0005 * jnp.abs(ssum)
            sv1 = jnp.where(converged, sv1, 2.0 * _safe_div(s2, ssum) * sv1)
            sv2 = jnp.where(converged, sv2, 2.0 * _safe_div(s1, ssum) * sv2)
            s1 = _vox_mat_stress(sv1, *side1, ss=ss1)
            s2 = _vox_mat_stress(sv2, *side2, ss=ss2)
        hom = body.bond_homogeneous[d]
        stress_hom = _vox_mat_stress(strain, *side1, ss=ss1)
        stress = jnp.where(hom, stress_hom, 0.5 * (s1 + s2))
        sv1 = jnp.where(hom, strain, sv1)
        sv2 = jnp.where(hom, strain, sv2)

    if sim.plasticity_enabled:
        new_territory = strain >= state.max_strain[d]
        stress = jnp.where(
            new_territory, stress, E * (strain - state.strain_offset[d])
        )
        max_strain = jnp.maximum(state.max_strain[d], strain)
        strain_offset = jnp.where(
            new_territory, max_strain - _safe_div(stress, E), state.strain_offset[d]
        )
    else:
        max_strain = jnp.maximum(state.max_strain[d], strain)
        strain_offset = state.strain_offset[d]

    # volume-effects thermal stress subtraction (reference: :284-298):
    # σ -= (E1·CTE1·ΔT1/(1−2u1) + E2·CTE2·ΔT2/(1−2u2))/2 with each side's
    # ΔT from its material temperature sinusoid (VX_Environment.cpp:442-461)
    if sim.volume_effects_enabled and env.temp_enabled:
        if env.vary_temp_enabled:
            # temp_period == 0 means "no varying temp" (reference:
            # VX_Environment.cpp UpdateCurTemp early-returns) → zero ΔT
            period_ok = env.temp_period != 0
            # float-truncated π replicates the reference per-material
            # temperature sinusoid (VX_Environment.cpp:451: 2*3.1415926f)
            w = 2.0 * REF_PI_FLOAT * state.time * _safe_div(
                jnp.ones_like(state.time), env.temp_period
            )
            dT1 = jnp.where(
                period_ok, env.temp_amplitude * jnp.sin(w + body.mat_temp_phase), 0.0
            )
            dT2 = jnp.where(
                period_ok,
                env.temp_amplitude * jnp.sin(w + _nbr(body.mat_temp_phase, d)),
                0.0,
            )
        else:
            dT1 = dT2 = env.temp_amplitude
        s1t = _safe_div(body.e_mod * body.cte * dT1, 1.0 - 2.0 * body.poisson)
        s2t = _safe_div(
            _nbr(body.e_mod, d) * _nbr(body.cte, d) * dT2,
            1.0 - 2.0 * _nbr(body.poisson, d),
        )
        stress = stress - 0.5 * (s1t + s2t)

    # --- beam forces/moments, bond frame (reference: :122-154) ---
    a2c, b1, b2, b3 = body.bond_a2[d], body.bond_b1[d], body.bond_b2[d], body.bond_b3[d]
    if sim.volume_effects_enabled:
        # F_axial = σ·(CSArea1+CSArea2)/2 (reference: :127)
        cs_area = 0.5 * (state.cs_area[0, d] + state.cs_area[1, d])
    else:
        cs_area = L * L  # CSArea1 = CSArea2 = NominalSize² w/o volume effects
    p2y, p2z = _pos2[..., 1], _pos2[..., 2]
    a1x, a1y, a1z = _a1[..., 0], _a1[..., 1], _a1[..., 2]
    a2x, a2y, a2z = _a2[..., 0], _a2[..., 1], _a2[..., 2]

    f1 = jnp.stack(
        [
            stress * cs_area,
            b1 * p2y - b2 * (a1z + a2z),
            b1 * p2z + b2 * (a1y + a2y),
        ],
        axis=-1,
    )
    f2 = -f1
    m1 = jnp.stack(
        [
            a2c * (a1x - a2x),
            b2 * p2z + b3 * (2.0 * a1y + a2y),
            -b2 * p2y + b3 * (2.0 * a1z + a2z),
        ],
        axis=-1,
    )
    m2 = jnp.stack(
        [
            a2c * (a2x - a1x),
            b2 * p2z + b3 * (a1y + 2.0 * a2y),
            -b2 * p2y + b3 * (a1z + 2.0 * a2z),
        ],
        axis=-1,
    )

    # --- strain energy, bond frame, pre-damping (reference: VXS_Bond.cpp
    # :115-122 CalcStrainEnergy, invoked before AddDampForces) ---
    a1 = body.bond_a1[d]
    inv = lambda x: _safe_div(jnp.ones_like(x), x)  # noqa: E731
    m1z, m2z = m1[..., 2], m2[..., 2]
    m1y, m2y = m1[..., 1], m2[..., 1]
    strain_energy = jnp.where(
        mask,
        0.5 * inv(a1) * f1[..., 0] ** 2
        + 0.5 * inv(a2c) * m1[..., 0] ** 2
        + (1.0 / 3.0) * inv(b3) * (m1z * m1z - m1z * m2z + m2z * m2z)
        + (1.0 / 3.0) * inv(b3) * (m1y * m1y - m1y * m2y + m2y * m2y),
        0.0,
    )

    # --- critical damping from frame-state memory (reference: :310-346) ---
    dt_inv = _safe_div(jnp.ones_like(L), dt)
    bondz = 0.5 * sim.bond_damping_z
    rv = (_pos2 - state.last_pos2[d]) * dt_inv
    rav1 = (_a1 - state.last_angle1[d]) * dt_inv
    rav2 = (_a2 - state.last_angle2[d]) * dt_inv
    rvx, rvy, rvz = rv[..., 0], rv[..., 1], rv[..., 2]
    sum_avz = rav1[..., 2] + rav2[..., 2]
    sum_avy = rav1[..., 1] + rav2[..., 1]
    dmp = (~changed) & (dt > 0)

    df1 = bondz * jnp.stack(
        [
            body.d_a1m1[d] * rvx,
            body.d_b1m1[d] * rvy - body.d_b2fm1[d] * sum_avz,
            body.d_b1m1[d] * rvz + body.d_b2fm1[d] * sum_avy,
        ],
        axis=-1,
    )
    df2 = bondz * jnp.stack(
        [
            -body.d_a1m2[d] * rvx,
            -body.d_b1m2[d] * rvy + body.d_b2fm2[d] * sum_avz,
            -body.d_b1m2[d] * rvz - body.d_b2fm2[d] * sum_avy,
        ],
        axis=-1,
    )
    davx = rav2[..., 0] - rav1[..., 0]
    dm1 = (0.5 * bondz) * jnp.stack(
        [
            -body.d_a2i1[d] * davx,
            body.d_b2fm1[d] * rvz + body.d_b3i1[d] * (2.0 * rav1[..., 1] + rav2[..., 1]),
            -body.d_b2fm1[d] * rvy + body.d_b3i1[d] * (2.0 * rav1[..., 2] + rav2[..., 2]),
        ],
        axis=-1,
    )
    dm2 = (0.5 * bondz) * jnp.stack(
        [
            body.d_a2i2[d] * davx,
            body.d_b2fm2[d] * rvz + body.d_b3i2[d] * (rav1[..., 1] + 2.0 * rav2[..., 1]),
            -body.d_b2fm2[d] * rvy + body.d_b3i2[d] * (rav1[..., 2] + 2.0 * rav2[..., 2]),
        ],
        axis=-1,
    )
    dmpf = dmp[..., None]
    f1 = f1 + jnp.where(dmpf, df1, 0.0)
    f2 = f2 + jnp.where(dmpf, df2, 0.0)
    m1 = m1 + jnp.where(dmpf, dm1, 0.0)
    m2 = m2 + jnp.where(dmpf, dm2, 0.0)

    # --- back to world frame (reference: :159-170) ---
    f1 = _to_orig_vec(d, q.quat_rotate_inv(totrot, f1))
    f2 = _to_orig_vec(d, q.quat_rotate_inv(totrot, f2))
    m1 = _to_orig_vec(d, q.quat_rotate_inv(totrot, m1))
    m2 = _to_orig_vec(d, q.quat_rotate_inv(totrot, m2))

    f1 = jnp.where(maskf, f1, 0.0)
    f2 = jnp.where(maskf, f2, 0.0)
    m1 = jnp.where(maskf, m1, 0.0)
    m2 = jnp.where(maskf, m2, 0.0)

    # the damping frame memory is written inside the reference's
    # AddDampForces (VXS_BondInternal.cpp:344-347), which is SKIPPED on a
    # small/large-angle transition step — the memory then goes stale for
    # exactly one step. Replicate: keep the old memory where `changed`.
    keep = changed[..., None]
    new_last_pos2 = jnp.where(keep, state.last_pos2[d], _pos2)
    new_last_a1 = jnp.where(keep, state.last_angle1[d], _a1)
    new_last_a2 = jnp.where(keep, state.last_angle2[d], _a2)

    return dict(
        f1=f1, f2=f2, m1=m1, m2=m2,
        strain_energy=strain_energy,
        sv1=jnp.where(mask, sv1, 0.0),
        sv2=jnp.where(mask, sv2, 0.0),
        strain=jnp.where(mask, strain, 0.0),
        small_angle=jnp.where(mask, small, sa_prev),
        last_pos2=jnp.where(maskf, new_last_pos2, 0.0),
        last_angle1=jnp.where(maskf, new_last_a1, 0.0),
        last_angle2=jnp.where(maskf, new_last_a2, 0.0),
        max_strain=jnp.where(mask, max_strain, 0.0),
        strain_offset=jnp.where(mask, strain_offset, 0.0),
    )


# ---------------------------------------------------------------------------
# Floor contact + Coulomb friction (reference: VXS_Voxel.cpp:677-758)
# ---------------------------------------------------------------------------

def _floor_effect(state, body, sim: SimParams, env: EnvParams, vel, total_force, dt):
    """Returns (floor_force, static_fric_mask, linmom, vel) with the
    reference's in-place momentum zeroing replicated."""
    pos = state.pos
    linmom = state.linmom

    if not env.floor_limited:
        inside = jnp.ones(body.occ.shape, dtype=bool)
    else:
        X, Y, _ = body.occ.shape
        center_x = body.nominal_size * X * 0.5
        center_y = body.nominal_size * Y * 0.5
        r = jnp.sqrt((pos[..., 0] - center_x) ** 2 + (pos[..., 1] - center_y) ** 2)
        inside = (r <= env.floor_radius) & (pos[..., 2] >= 0)

    pen = 0.5 * state.scale - pos[..., 2]
    pen = jnp.where(inside & (pen > 0), pen, 0.0)
    contact = pen > 0

    normal_force = body.lin_stiffness * pen
    fz = normal_force - sim.col_damping_z * body.two_sq_mexs * vel[..., 2]
    fz = jnp.where(contact, fz, 0.0)

    static_flag = jnp.zeros(contact.shape, dtype=bool)

    # sticky floor (reference: :736-739)
    if env.sticky_floor:
        stick = contact
        linmom = linmom.at[..., 0].set(jnp.where(stick, 0.0, linmom[..., 0]))
        linmom = linmom.at[..., 1].set(jnp.where(stick, 0.0, linmom[..., 1]))
        vel = vel.at[..., 0].set(jnp.where(stick, 0.0, vel[..., 0]))
        vel = vel.at[..., 1].set(jnp.where(stick, 0.0, vel[..., 1]))
        static_flag = static_flag | stick

    vx, vy = vel[..., 0], vel[..., 1]
    stopped = (vx == 0.0) & (vy == 0.0)
    surface_vel = _safe_norm(vx, vy)
    surface_force = _safe_norm(total_force[..., 0], total_force[..., 1])
    dyn_fric = body.u_dynamic * normal_force

    # static: stopped & insufficient lateral force to break away (:741-743)
    static_flag = static_flag | (
        contact & stopped & (surface_force < body.u_static * normal_force)
    )

    # dynamic: friction opposes velocity unless it would reverse it (:744-753)
    moving = contact & ~stopped
    keeps_moving = dyn_fric * dt < body.mass * surface_vel
    inv_sv = _safe_div(jnp.ones_like(surface_vel), surface_vel)
    fric_x = -vx * inv_sv * dyn_fric
    fric_y = -vy * inv_sv * dyn_fric
    fx = jnp.where(moving & keeps_moving, fric_x, 0.0)
    fy = jnp.where(moving & keeps_moving, fric_y, 0.0)
    stopping = moving & ~keeps_moving
    static_flag = static_flag | stopping
    linmom = linmom.at[..., 0].set(jnp.where(stopping, 0.0, linmom[..., 0]))
    linmom = linmom.at[..., 1].set(jnp.where(stopping, 0.0, linmom[..., 1]))

    floor_force = jnp.stack([fx, fy, fz], axis=-1)
    return floor_force, static_flag, linmom, vel


# ---------------------------------------------------------------------------
# Actuation / development scale update (reference: VXS_Voxel.cpp:224-412)
# ---------------------------------------------------------------------------

def _scale_update(state, body, sim: SimParams, env: EnvParams, t):
    """Returns (new_scale, new_devo_state). new_devo_state is None unless
    ballistic development is active (state.devo is not None)."""
    nom = jnp.broadcast_to(body.nominal_size, state.scale.shape)

    if env.fluid_environment:
        # the land_water fork's simpler actuation — no devo machinery, no
        # amp-damp, no rate-limited clamps; a hard floor at the #define'd
        # MIN_TEMP_FACTOR=0.1 (reference: land_water VXS_Voxel.cpp:210-236,
        # VX_Sim.h:31). Per-voxel TempAmplitude/TempPeriod are float32
        # members there too.
        if env.temp_enabled:
            amp_q = jnp.asarray(env.temp_amplitude).astype(jnp.float32).astype(
                nom.dtype
            )
            period_q = jnp.asarray(env.temp_period).astype(jnp.float32).astype(
                nom.dtype
            )
            ctrl = amp_q * jnp.sin(
                2.0 * REF_PI_FLOAT * (_safe_div(t, period_q) + body.phase_offset)
            ) * body.cte
            temp_fact = 1.0 + jnp.where(
                (t >= sim.init_cm_time) & (env.temp_period != 0), ctrl, 0.0
            )
        else:
            temp_fact = jnp.ones_like(nom)
        temp_fact = jnp.maximum(temp_fact, 0.1)
        return jnp.where(body.occ, temp_fact * nom, nom), state.devo
    max_scale = (1.0 + env.growth_amplitude) * nom
    min_scale = sim.min_temp_fact * nom
    last = state.last_scale

    # devo fields come from the dynamic DevoState under ballistic
    # development, else from the static body arrays
    devo = state.devo
    if devo is not None:
        initial_voxel_size = devo.initial_voxel_size
        final_voxel_size = devo.final_voxel_size
        growth_time = devo.growth_time
        start_growth_time = devo.start_growth_time
    else:
        initial_voxel_size = body.initial_voxel_size
        final_voxel_size = body.final_voxel_size
        growth_time = body.growth_time
        start_growth_time = body.start_growth_time

    # prenatal linear development ramp (reference: :237-238)
    if body.using_initial_voxel_size:
        c = jnp.where(
            t >= 0.5 * sim.init_cm_time,
            1.0,
            _safe_div(2.0 * t, sim.init_cm_time),
        )
        prenatal = c * (_safe_div(initial_voxel_size, nom) - 1.0)
    else:
        prenatal = jnp.zeros_like(nom)

    # postnatal development (reference: :263-289)
    dev_temp_fact = jnp.zeros_like(nom)
    dev_phase = jnp.zeros_like(nom)
    dev_ampdamp = jnp.zeros_like(nom)
    if body.using_growth_time or body.using_final_voxel_size:
        # mid-life development freeze (reference: VXS_Voxel.cpp:242-265):
        # FrozenTimeAdj = clamp(t - FreezeStart, 0, FreezeTime) pauses the
        # effective development clock inside the freeze window. With
        # mid_life_freeze_time = 0 this reduces to the unfrozen ramp.
        freeze = sim.mid_life_freeze_time
        middle = 0.5 * (sim.stop_condition_value - sim.init_cm_time)
        frozen_adj = jnp.clip(t - (middle - 0.5 * freeze), 0.0, freeze)
        growing = (t >= start_growth_time) & (growth_time > 0)
        eff_t = (
            jnp.minimum(t, start_growth_time + growth_time + freeze)
            - frozen_adj
        )
        k = jnp.where(
            growing, _safe_div(eff_t - start_growth_time, growth_time), 0.0
        )
        if body.using_final_voxel_size:
            dev_temp_fact = k * (
                _safe_div(final_voxel_size, initial_voxel_size) - 1.0
            )
        if body.using_final_phase_offset:
            dev_phase = k * (body.final_phase_offset - body.phase_offset)
        if body.using_final_temp_amp_damp:
            dev_ampdamp = k * (body.final_temp_amp_damp - body.temp_amp_damp)

    # thermal actuation control term (reference: :292-305).
    # Note: this samples the per-voxel sinusoid directly from sim time; the
    # env's global CurTemp only matters for volume-effects thermal stress.
    if env.temp_enabled:
        phase = body.phase_offset + dev_phase
        amp_damp = body.temp_amp_damp + dev_ampdamp
        # temp_period == 0 → no oscillation (reference guards this case in
        # VX_Environment.cpp UpdateCurTemp); float-truncated π matches the
        # reference's 2*3.1415926f drive, and the per-voxel TempAmplitude/
        # TempPeriod are float32 members there (VXS_Voxel.h:109-110,
        # VXS_Voxel.cpp:302) — quantize both for trajectory parity
        amp_q = jnp.asarray(env.temp_amplitude).astype(jnp.float32).astype(
            nom.dtype
        )
        period_q = jnp.asarray(env.temp_period).astype(jnp.float32).astype(
            nom.dtype
        )
        t_over_period = _safe_div(t, period_q)
        ctrl = (
            amp_damp
            * (amp_q * jnp.sin(2.0 * REF_PI_FLOAT * (t_over_period + phase)))
            * body.cte
        )
        ctrl = jnp.where(
            (t >= sim.init_cm_time) & (env.temp_period != 0), ctrl, 0.0
        )
        # FreezeInitialized: actuation is zeroed for the first InitCmTime of
        # the mid-life freeze window, letting the frozen body re-settle
        # (reference: VXS_Voxel.cpp:234-256, :302 — CtrlTempFact *=
        # FreezeInitialized)
        freeze = sim.mid_life_freeze_time
        middle = 0.5 * (sim.stop_condition_value - sim.init_cm_time)
        fs = middle - 0.5 * freeze
        freeze_uninit = (
            (freeze > 0)
            & (t > fs)
            & (t < middle + 0.5 * freeze)
            & (t < fs + sim.init_cm_time)
        )
        ctrl = jnp.where(freeze_uninit, 0.0, ctrl)
    else:
        ctrl = jnp.zeros_like(nom)

    # size-capped actuation for devo bodies (reference: :308-320)
    if body.using_initial_voxel_size or body.using_final_voxel_size:
        curr_size = (1.0 + prenatal) * (1.0 + dev_temp_fact) * nom
        orig_sig = _safe_div(_safe_div(curr_size, nom) - 1.0, env.growth_amplitude)
        pos_sig = (orig_sig + 1.0) * 0.5
        capped = jnp.minimum(pos_sig, 0.5)
        ctrl = ctrl * capped * 2.0

    curr = ctrl * nom + (1.0 + prenatal) * (1.0 + dev_temp_fact) * nom
    curr = jnp.where((curr < last) & (curr < min_scale), last, curr)
    curr = jnp.where((curr > last) & (curr > max_scale), last, curr)
    new_scale = jnp.where(body.occ, curr, nom)

    # --- ballistic velocity-adjusted development (reference:
    # VXS_Voxel.cpp:342-381): once two speed windows exist, every step
    # rebase development at the current size; if the windowed speed fell
    # by more than MaxSlowdownPermitted, pull the final size toward the
    # current size by BallisticSlowdownFact (development slows/stops) ---
    new_devo = devo
    if devo is not None:
        n_win = env.num_trace_steps_in_window
        time_in_window = n_win * env.time_between_traces
        ready = (
            (devo.win_count >= 2)
            & (t >= sim.init_cm_time + 2.0 * time_in_window)
        )
        apply = ready & (t >= start_growth_time + env.min_growth_time)

        this_speed, last_speed = devo.win_last, devo.win_prev
        decreasing = (
            (last_speed > 0)
            & (this_speed < last_speed)
            & (_safe_div(this_speed, jnp.where(last_speed != 0, last_speed, 1.0))
               < 1.0 - env.max_slowdown_permitted)
        )
        adj = 1.0 - decreasing.astype(nom.dtype) * env.ballistic_slowdown_fact

        cur_size = (1.0 + prenatal) * (1.0 + dev_temp_fact) * nom
        suggested = cur_size + (final_voxel_size - cur_size) * adj
        orig = devo.original_final_voxel_size
        # monotonicity + original-bound clamps (reference: :367-377)
        up = orig > cur_size
        sugg_up = jnp.minimum(suggested, orig)
        fin_up = jnp.where(sugg_up >= cur_size, sugg_up, cur_size)
        sugg_dn = jnp.maximum(suggested, orig)
        fin_dn = jnp.where(sugg_dn <= cur_size, sugg_dn, cur_size)
        reb_final = jnp.where(up, fin_up, fin_dn)
        reb_growth = jnp.maximum(growth_time - (t - start_growth_time), 0.0)

        def q(x):  # the reference stores these fields as float32
            return x.astype(jnp.float32).astype(nom.dtype)

        new_devo = devo.replace(
            initial_voxel_size=jnp.where(apply, q(cur_size), initial_voxel_size),
            final_voxel_size=jnp.where(apply, q(reb_final), final_voxel_size),
            growth_time=jnp.where(apply, q(reb_growth), growth_time),
            start_growth_time=jnp.where(
                apply, q(jnp.broadcast_to(t, nom.shape)), start_growth_time
            ),
        )

    return new_scale, new_devo


# ---------------------------------------------------------------------------
# The full step
# ---------------------------------------------------------------------------

def sim_step(
    state: SimState,
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    dt,
    prec: Precision = DEFAULT_PRECISION,
    control_offset=None,
    dt_reduce=None,
) -> SimState:
    """Advance one dt (reference: VX_Sim.cpp:1763 Integrate).

    `control_offset` optionally adds a per-voxel phase-free actuation term to
    the thermal control factor — the MPC hook (see control/). It is applied
    by temporarily shifting `body.phase_offset`-driven ctrl via addition.
    """
    t = state.time
    occ = body.occ
    occf = occ[..., None]

    # equilibrium mode overrides the damping configuration for the whole run
    # (reference: EnableEquilibriumMode, VX_Sim.cpp:1351-1372 — BondDampingZ
    # := 0.1, SlowDampingZ := 0, max-velocity clamp disabled)
    if sim.equilibrium_mode:
        sim = sim.replace(
            bond_damping_z=0.1, slow_damping_z=0.0,
            max_velocity_enabled=False,
        )

    if sim.volume_effects_enabled and state.ts_sum is None:
        raise ValueError(
            "volume effects enabled but the state has no coupling carry; "
            "create it with init_state(body, volume_effects=True)"
        )

    # the bond damping pass reads the PREVIOUS step's dt (the reference dt
    # member is updated after UpdateBond, VX_Sim.cpp:1792-1795); everything
    # from EulerStep on uses the fresh value
    dt_bond = dt
    if sim.volume_effects_enabled and state.cur_dt is not None:
        dt_bond = jnp.where(state.cur_dt > 0, state.cur_dt, dt)

    # ---- bond pass (3 lattice directions) ----
    bonds = [
        _bond_axis_forces(d, state, body, sim, env, dt_bond, prec)
        for d in range(3)
    ]

    if sim.volume_effects_enabled:
        # dt = DtFrac/(2π·max√(k_eff/m)) recomputed EVERY step: k_eff =
        # Eh·(CS1+CS2)/(2·(ε·L+L)) with this step's strain and the carried
        # cross-sections (reference: VXS_Bond.h:34 GetEffectiveStiffness;
        # VX_Sim.cpp:1792-1794)
        L = body.nominal_size
        cs_sum = state.cs_area[0] + state.cs_area[1]  # (3,X,Y,Z)
        strains = jnp.stack([b["strain"] for b in bonds])
        eff_k = body.bond_eh * cs_sum / (2.0 * (strains * L + L))
        m1 = jnp.broadcast_to(body.mass, eff_k.shape)
        m2 = jnp.stack(
            [jnp.roll(body.mass, -1, axis=dd) for dd in range(3)]
        )
        f2 = jnp.maximum(
            jnp.where(body.bond_mask, _safe_div(eff_k, m1), 0.0),
            jnp.where(body.bond_mask, _safe_div(eff_k, m2), 0.0),
        )
        max_freq = jnp.sqrt(jnp.max(f2))
        if dt_reduce is not None:
            # spatially-sharded steps must agree on the global stability
            # bound (parallel/spatial.py passes a pmax over the mesh axis)
            max_freq = dt_reduce(max_freq)
        dt = jnp.where(
            max_freq > 0,
            jnp.asarray(sim.dt_frac, max_freq.dtype)
            / (2.0 * REF_PI_DOUBLE * max_freq),
            dt_bond,
        )

    # volume-effects voxel pass: write next step's TStrainSum/CSArea
    # (reference: VXS_Voxel.cpp:543-632)
    new_ts_sum = new_cs_area = None
    if sim.volume_effects_enabled:
        new_ts_sum, new_cs_area = _volume_effects_coupling(bonds, body)

    diverged_now = state.diverged
    for d in range(3):
        diverged_now = diverged_now | jnp.any(
            jnp.abs(bonds[d]["strain"]) > DIVERGENCE_STRAIN
        )

    # ---- per-voxel force accumulation (reference: VXS_Voxel.cpp:482-651) ----
    vel = state.linmom * body.mass_inv[..., None]
    total_force = -sim.slow_damping_z * vel * body.two_sq_mexs[..., None]
    for d in range(3):
        total_force = total_force + bonds[d]["f1"] + _from_nbr(bonds[d]["f2"], d)

    # self-collision contact (reference: VXS_Voxel.cpp:516-528 via
    # VXS_BondCollision; candidate management in core/collision.py)
    if sim.self_collisions_enabled and body.collision is not None:
        from evosoro_tpu.core.collision import collision_forces

        total_force = total_force + collision_forces(
            state.pos, state.scale, body.collision
        )

    gravity_on = env.gravity_enabled and not env.fluid_environment
    if gravity_on:
        total_force = total_force.at[..., 2].add(body.mass * env.grav_acc)
    total_force = total_force + body.external_force

    if env.fluid_environment:
        if body.mesh_drag is not None:
            # reference-accurate facet drag on the deformed surface mesh
            # (land_water VX_Sim.cpp:1516-1600). The mesh corners come from
            # the per-direction bond strains written THIS step by the bond
            # pass (land_water VXS_Voxel.cpp:474-475) — same in-step ordering
            # as the reference's Integrate (bonds, then voxels).
            from evosoro_tpu.envs.drag import mesh_drag_forces

            strain_pos = jnp.stack([
                jnp.where(body.bond_mask[d], bonds[d]["sv1"], 0.0)
                for d in range(3)
            ])
            strain_neg = jnp.stack([
                jnp.where(
                    _from_nbr(body.bond_mask[d], d),
                    _from_nbr(bonds[d]["sv2"], d), 0.0,
                )
                for d in range(3)
            ])
            total_force = total_force + mesh_drag_forces(
                state.pos, state.quat, state.scale, state.linmom,
                body.mass_inv, body.mesh_drag,
                env.aggregate_drag_coefficient,
                strain_pos=strain_pos, strain_neg=strain_neg,
                nominal_size=body.nominal_size,
            )
        else:
            total_force = total_force + _fluid_drag(state, body, env, vel)

    linmom = state.linmom
    floor_on = env.floor_enabled and not env.fluid_environment
    if floor_on:
        floor_force, static_flag, linmom, vel = _floor_effect(
            state, body, sim, env, vel, total_force, dt
        )
        total_force = total_force + floor_force
        lateral_zero = static_flag[..., None] & jnp.array([True, True, False])
        total_force = jnp.where(lateral_zero, 0.0, total_force)

    total_force = jnp.where(occf, total_force, 0.0)

    # ---- linear integration (reference: VXS_Voxel.cpp:181-197) ----
    linmom = linmom + total_force * dt
    disp = linmom * (dt * body.mass_inv[..., None])
    if sim.max_velocity_enabled:
        disp_mag = _safe_norm(disp[..., 0], disp[..., 1], disp[..., 2])[..., None]
        max_disp = sim.max_vox_vel_limit * body.nominal_size
        scale_back = jnp.where(disp_mag > max_disp, max_disp / jnp.where(disp_mag > 0, disp_mag, 1.0), 1.0)
        disp = disp * scale_back
    pos = state.pos + disp

    # fixed translational DOFs (reference: :195-197)
    for axis, bit in enumerate((DOF_X, DOF_Y, DOF_Z)):
        fixed = (body.dof_fixed & bit) != 0
        pos = pos.at[..., axis].set(
            jnp.where(fixed, body.nom_pos[..., axis] + body.external_disp[..., axis],
                      pos[..., axis])
        )
        linmom = linmom.at[..., axis].set(jnp.where(fixed, 0.0, linmom[..., axis]))

    # ---- moments (reference: VXS_Voxel.cpp:653-675 CalcTotalMoment) ----
    total_moment = jnp.zeros_like(state.angmom)
    for d in range(3):
        total_moment = total_moment - bonds[d]["m1"] - _from_nbr(bonds[d]["m2"], d)
    # external torque support comes with BC regions; zero rotational fixed DOFs
    for axis, bit in enumerate((DOF_TX, DOF_TY, DOF_TZ)):
        fixed = (body.dof_fixed & bit) != 0
        total_moment = total_moment.at[..., axis].set(
            jnp.where(fixed, 0.0, total_moment[..., axis])
        )
    total_moment = jnp.where(occf, total_moment, 0.0)

    angmom = state.angmom + total_moment * dt
    if sim.volume_effects_enabled:
        angmom = angmom / 1.01  # reference: :204
    else:
        ang_fact = 1.0 - 10.0 * sim.slow_damping_z * body.inertia_inv * body.two_sq_iexsss * dt
        angmom = angmom * ang_fact[..., None]

    # quaternion integration (reference: :210-215)
    ang_vel = angmom * body.inertia_inv[..., None]
    spin = 0.5 * q.quat_multiply(
        jnp.concatenate([jnp.zeros_like(ang_vel[..., :1]), ang_vel], axis=-1),
        state.quat,
    )
    quat = q.quat_normalize_fast(state.quat + spin * dt)

    # all-rotation-fixed voxels (reference: :218-221)
    rot_fixed = (body.dof_fixed & (DOF_TX | DOF_TY | DOF_TZ)) == (DOF_TX | DOF_TY | DOF_TZ)
    quat = jnp.where(
        rot_fixed[..., None], q.quat_from_rotation_vector(body.external_tdisp), quat
    )
    angmom = jnp.where(rot_fixed[..., None], 0.0, angmom)

    # fully-fixed voxels: pin pose, zero momenta (reference: :174-179)
    all_fixed = (body.dof_fixed & 63) == 63
    pos = jnp.where(all_fixed[..., None], body.nom_pos + body.external_disp, pos)
    linmom = jnp.where(all_fixed[..., None], 0.0, linmom)

    # keep empty cells inert
    pos = jnp.where(occf, pos, body.nom_pos)
    linmom = jnp.where(occf, linmom, 0.0)
    angmom = jnp.where(occf, angmom, 0.0)

    # ---- actuation / growth (reference: :224-341) ----
    new_scale, new_devo = _scale_update(state, body, sim, env, t)
    if control_offset is not None:
        # MPC direct actuation channel: additive scale modulation
        ctrl_off = jnp.asarray(control_offset, new_scale.dtype)
        new_scale = new_scale + jnp.where(occ, ctrl_off * body.nominal_size, 0.0)

    # ---- kinetic energy bookkeeping / equilibrium mode ----
    # Reference ordering (VX_Sim.cpp:1148-1155): the KineticEDecreasing test
    # reads the ring BEFORE this step's KE is pushed; ZeroAllMotion also
    # zeroes the per-voxel KineticEnergy, so the value UpdateStats then
    # pushes is the POST-zeroing energy (0 on zeroed steps).
    if sim.equilibrium_mode:
        h = state.ke_history
        decreasing = h[0] + h[1] + h[2] < h[3] + h[4] + h[5]
        linmom = jnp.where(decreasing, 0.0, linmom)
        angmom = jnp.where(decreasing, 0.0, angmom)
    vel_new = linmom * body.mass_inv[..., None]
    angvel_new = angmom * body.inertia_inv[..., None]
    ke = 0.5 * jnp.sum(
        body.mass * jnp.sum(vel_new * vel_new, axis=-1)
        + body.inertia * jnp.sum(angvel_new * angvel_new, axis=-1)
    )
    ke_history = jnp.roll(state.ke_history, 1).at[0].set(ke)
    total_strain_e = sum(jnp.sum(b["strain_energy"]) for b in bonds)
    max_vox_vel = jnp.sqrt(
        jnp.max(jnp.where(occ, jnp.sum(vel_new * vel_new, axis=-1), 0.0))
    )

    new_state = SimState(
        pos=pos,
        quat=quat,
        linmom=linmom,
        angmom=angmom,
        scale=new_scale,
        last_scale=new_scale,
        small_angle=jnp.stack([b["small_angle"] for b in bonds]),
        last_pos2=jnp.stack([b["last_pos2"] for b in bonds]),
        last_angle1=jnp.stack([b["last_angle1"] for b in bonds]),
        last_angle2=jnp.stack([b["last_angle2"] for b in bonds]),
        max_strain=jnp.stack([b["max_strain"] for b in bonds]),
        strain_offset=jnp.stack([b["strain_offset"] for b in bonds]),
        time=t + dt,
        diverged=diverged_now,
        ke_history=ke_history,
        ts_sum=new_ts_sum,
        cs_area=new_cs_area,
        cur_dt=(dt * jnp.ones_like(state.cur_dt)
                if state.cur_dt is not None else None),
        devo=new_devo,
        total_strain_e=total_strain_e,
        max_vox_vel=max_vox_vel,
    )

    # freeze state once diverged (reference aborts: VX_Sim.cpp:1774-1777)
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(state.diverged, old, new), state, new_state
    )


def _fluid_drag(state, body, env: EnvParams, vel):
    """Per-exposed-face quadratic drag — the voxel-level analog of the
    land_water facet drag (reference: land_water VX_Sim.cpp:1516-1600).

    Each of a voxel's 6 faces that has no bonded neighbor is an exposed
    surface patch of area scale²; drag = -C·A·|v_n|·v_n per face along the
    face normal, accumulated onto the voxel. Mesh-facet-accurate drag is a
    planned refinement; this matches the model up to the deformed-mesh vs
    axis-aligned-face approximation.
    """
    area = state.scale * state.scale
    drag = jnp.zeros_like(vel)
    for d in range(3):
        has_pos = body.bond_mask[d]
        has_neg = _from_nbr(body.bond_mask[d], d)
        for sign, exposed in ((1.0, body.occ & ~has_pos), (-1.0, body.occ & ~has_neg)):
            vn = sign * vel[..., d]  # velocity along outward normal
            fwd = vn > 0  # only forward-facing faces see drag
            mag = jnp.where(
                exposed & fwd, env.aggregate_drag_coefficient * area * vn * vn, 0.0
            )
            drag = drag.at[..., d].add(-sign * mag)
    return drag
