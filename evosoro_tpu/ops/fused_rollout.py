"""Fused multi-step rollout kernel (Pallas, TPU).

This is the speed-of-light path for the headline workload: thousands of
concurrent soft-body rollouts (reference: one `voxelyze` process per robot,
voxelyzeMain/main.cpp:89-131). The in-kernel feature envelope covers the
engine features real experiments use — linear materials, beam bonds with
small/large-angle hysteresis + critical damping, floor contact with Coulomb
friction (sticky/plain), gravity, thermal sinusoidal actuation, growth/devo
ramps + mid-life freeze, ALL FOUR material models (linear / linear-fail /
bilinear / MDL_DATA point tables via a streamed side-table buffer), bond
plasticity, volume effects (Poisson coupling + thermal stress + the
per-step dynamic dt), self-collision (dense pair field, see
`_pair_contact_forces`), fluid environments with voxel-face drag,
equilibrium mode, max-velocity clamping, boundary-condition regions
(fixed DOFs / external forces / prescribed displacements via a streamed
15-channel block), divergence + stop-time freezing (reference hot path:
VX_Sim.cpp:1763 Integrate → VXS_BondInternal.cpp:56 CalcLinForce →
VXS_Voxel.cpp:169 EulerStep), environmental-source tracking (oscillating
positions + per-source min-distance/history means). The remaining
combinations (ballistic devo, deformed-mesh facet drag, trace-window
fitness features) use the general jnp stencil in `core.step` —
`supports()` reports whether a (body, sim, env) config can run here.

Why a kernel at all: the jnp scan streams ~50 state floats per voxel through
HBM **every step**. This kernel keeps the whole simulation state VMEM-resident
across all timesteps — HBM traffic is one state read + one write per rollout
(amortized over thousands of steps), turning the rollout from bandwidth-bound
to VPU-compute-bound.

Layout ("channel-major"): every per-voxel quantity is a channel of a packed
array `(B, C, Vp)` — B robots (grid axis, `batch_block` robots per Pallas
program), C channels on sublanes, Vp = voxels flattened x-major and padded to
a multiple of 128 on lanes. All physics ops are then full-width (8,128) VPU
tiles; the 3D stencil's 6 neighbor reads become static lane rotations by
{Y·Z, Z, 1}. Per-robot scalars (sim time, divergence latch, CoM capture —
the rollout bookkeeping of core/rollout.py) ride a small `(B, 16)` stats
array.

The numerics replicate `core.step.sim_step` (itself validated bit-exact
against the reference engine) in f32; parity tests run the kernel in
interpreter mode on CPU against the jnp step.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from evosoro_tpu.core.constants import (
    DEFAULT_PRECISION,
    DIVERGENCE_STRAIN,
    HYSTERESIS_FACTOR,
    REF_PI_DOUBLE,
    REF_PI_FLOAT,
    SA_BOND_EXT_PERC,
    Precision,
)
from evosoro_tpu.core.types import EnvParams, SimParams, SimState, VoxelBody

# ---------------------------------------------------------------------------
# Channel maps
# ---------------------------------------------------------------------------

# state channels (C_S = 56)
_POS = 0  # 0..2
_QUAT = 3  # 3..6 (w,x,y,z)
_LIN = 7  # 7..9
_ANG = 10  # 10..12
_SCALE = 13
_SMALL = 14  # 14..16 per direction
_LP2 = 17  # 17..25  last_pos2[d*3 + c]
_LA1 = 26  # 26..34
_LA2 = 35  # 35..43
_MAXS = 44  # 44..46
# volume-effects Poisson-coupling carry, per direction. The jnp step carries
# per-side (2,3,grid) TStrainSum/CSArea but only ever consumes the side
# averages (core/step.py:281,377), so the packed state carries the averages
_TSAVG = 47  # 47..49
_CSAVG = 50  # 50..52
_SOFF = 53  # 53..55 per-direction plastic strain offset
# ballistic-development dynamic per-voxel devo fields (the reference rebases
# these every step once speed windows exist, VXS_Voxel.cpp:342-381; zero /
# unused unless flags["ballistic"])
_DEVO_DYN = 56  # init_size, final_size, growth_time, start_growth_time
C_S = 64  # 60 channels padded to a sublane multiple

# body channels (C_B = 72)
_B_OCC = 0
_B_MASS = 1
_B_MASS_INV = 2
_B_INERTIA_INV = 3
_B_2SQ_MEXS = 4
_B_2SQ_IEXSSS = 5
_B_LIN_STIFF = 6
_B_US = 7
_B_UD = 8
_B_CTE = 9
_B_PHASE = 10
_B_AMPDAMP = 11
_B_DIR = 12  # per-direction block of _B_PER_DIR channels
_B_PER_DIR = 20
# within a direction block:
_D_MASK = 0
_D_HOM = 1
_D_E1 = 2
_D_E2 = 3
_D_E = 4
_D_A2 = 5
_D_B1 = 6
_D_B2 = 7
_D_B3 = 8
_D_DA1M1 = 9
_D_DA1M2 = 10
_D_DA2I1 = 11
_D_DA2I2 = 12
_D_DB1M1 = 13
_D_DB1M2 = 14
_D_DB2FM1 = 15
_D_DB2FM2 = 16
_D_DB3I1 = 17
_D_DB3I2 = 18
_B_DEVO = _B_DIR + 3 * _B_PER_DIR  # 72: devo per-voxel fields
_B_INIT_SIZE = _B_DEVO + 0  # initial voxel size [m] (VXS_Voxel.h:96)
_B_FINAL_SIZE = _B_DEVO + 1
_B_GROWTH_T = _B_DEVO + 2  # growth time [s]
_B_START_GT = _B_DEVO + 3
_B_FINAL_PHASE = _B_DEVO + 4
_B_FINAL_AD = _B_DEVO + 5  # final temp amp damp
# volume-effects per-voxel material constants (thermal stress subtraction +
# on-the-fly composite Eh/u, reference: VXS_BondInternal.cpp:200-298)
_B_EMOD = _B_DEVO + 6
_B_POISSON = _B_DEVO + 7
_B_MTPHASE = _B_DEVO + 8  # per-material temperature phase [rad]
# nonlinear (bilinear) material model per voxel (VX_Object.cpp:1497-1504)
_B_MATMODEL = _B_DEVO + 9
_B_PLASTIC = _B_DEVO + 10
_B_YIELD = _B_DEVO + 11
_B_MAT = _B_DEVO + 12  # material id (mat-7 needle / mat-6 feet / mat-5 masks)
C_B = 88  # 85 channels padded to a sublane multiple

# stats channels (lane-padded to 16)
_S_TIME = 0
_S_DIV = 1
_S_DT = 2
_S_INICM = 3  # 3..5
_S_CAPT = 6
_S_INV_MASS = 7
_S_STOP = 8
# per-robot environment scalars (heterogeneous envs across a batch — the
# evaluator's per-individual env_kws / actuation-variance jitter)
_S_TAMP = 9  # temp amplitude (f32-quantized, VXS_Voxel.h:109)
_S_TPER = 10  # temp period (f32-quantized)
_S_INITCM = 11  # init_cm_time (actuation + CoM capture onset)
_S_GRAV = 12  # gravitational acceleration
_S_MINTF = 13  # min_temp_fact (scale lower bound / nominal)
_S_GAMP = 14  # growth amplitude (scale upper bound - 1)
_S_DRAGC = 15  # aggregate drag coefficient (fluid environments)
_S_KE = 16  # 16..21: kinetic-energy history ring (equilibrium mode)
_S_SRC = 22  # 22..24 per-source min dist, 25..27 history sums, 28 count
# fitness-feature channels (VERDICT r3 #8): falling-prohibited latch,
# norm-dist-by-vol online trace accumulators, devo window scalars,
# needle-in-haystack initial position, end-of-life posterior Y
_S_FELL = 29     # fall-over latch (VX_Sim.cpp:1412-1419)
_S_PCMY = 30     # previous trace sample: CoM y
_S_PVOL = 31     # previous trace sample: robot volume
_S_ND = 32       # Σ dy/L/vol^exp, whole life (VX_SimGA.cpp:58-117)
_S_NDRG = 33     # afterlife-regime accumulator
_S_NDFZ = 34     # frozen-window accumulator
_S_NTR = 35      # trace sample count
_S_LASTTR = 36   # last trace sample time (-1 sentinel)
_S_WLAST = 37    # last completed window distance (VX_Sim.cpp:2745-2784)
_S_WPREV = 38    # previous completed window distance
_S_WCNT = 39     # completed window count
_S_LASTWIN = 40  # last window boundary time (-1 sentinel)
_S_NEEDLE = 41   # 41..43 initial needle position (VX_Sim.cpp:1084-1088)
_S_NCAP = 44     # needle captured flag
_S_EOLY = 45     # posterior Y captured at the stop time (lattice units)
_S_EOLCAP = 46   # eol captured flag
C_STAT = 48


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Component-tuple math helpers (all operate on (b, Vp) f32 arrays)
# ---------------------------------------------------------------------------


def _safe_div(a, b):
    nz = b != 0
    return jnp.where(nz, a / jnp.where(nz, b, 1.0), 0.0)


def _safe_norm2(x, y):
    sq = x * x + y * y
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def _safe_norm3(x, y, z):
    sq = x * x + y * y + z * z
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def _acos(x):
    """arccos via the Abramowitz–Stegun 4.4.46 minimax polynomial
    (|err| <= 2e-8, i.e. below f32 resolution): Mosaic has no inverse-trig
    primitives, so the kernel carries its own.
    acos(x) = sqrt(1-x)·P(x) on [0,1]; acos(-x) = π - acos(x)."""
    ax = jnp.abs(x)
    p = -0.0012624911
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + c
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0, r, math.pi - r)


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qconj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def _qrot_inv(q, v):
    """Rotate v by the inverse of q (reference: Vec3D.h RotateVec3DInv)."""
    w, x, y, z = q
    fx, fy, fz = v
    tw = x * fx + y * fy + z * fz
    tx = w * fx - y * fz + z * fy
    ty = w * fy + x * fz - z * fx
    tz = w * fz - x * fy + y * fx
    return (
        tw * x + tx * w + ty * z - tz * y,
        tw * y - tx * z + ty * w + tz * x,
        tw * z + tx * y - ty * x + tz * w,
    )


def _qnorm_fast(q):
    """Normalize; snap to identity when w>=1 (reference: Vec3D.h:243-246)."""
    w, x, y, z = q
    l2 = w * w + x * x + y * y + z * z
    li = jnp.where(l2 > 0, 1.0 / jnp.sqrt(jnp.where(l2 > 0, l2, 1.0)), 1.0)
    w, x, y, z = w * li, x * li, y * li, z * li
    snap = w >= 1.0
    return (
        jnp.where(snap, 1.0, w),
        jnp.where(snap, 0.0, x),
        jnp.where(snap, 0.0, y),
        jnp.where(snap, 0.0, z),
    )


def _q_to_rotvec(q, prec: Precision):
    """Log map with the reference's acos≈sqrt fast path (Vec3D.h:270-283)."""
    w, x, y, z = q
    sq_len = 1.0 - w * w
    wc = jnp.minimum(w, 1.0)
    pos = sq_len > 0
    inv_sqrt = 1.0 / jnp.sqrt(jnp.where(pos, sq_len, 1.0))
    fast_sel = sq_len < prec.sl_thresh_acos2sqrt
    fast_arg = jnp.where(pos & fast_sel, jnp.maximum(2.0 - 2.0 * wc, 0.0), 1.0)
    scale_fast = 2.0 * jnp.sqrt(fast_arg) * inv_sqrt
    slow_arg = jnp.where(pos & ~fast_sel, jnp.clip(wc, -1.0, 1.0), 0.0)
    scale_slow = 2.0 * _acos(slow_arg) * inv_sqrt
    scale = jnp.where(fast_sel, scale_fast, scale_slow)
    scale = jnp.where(pos, scale, 2.0)
    return (x * scale, y * scale, z * scale)


def _q_from_angle_to_pos_x(v, prec: Precision):
    """Quaternion rotating v onto +X (reference: Vec3D.h:208-238)."""
    vx, vy, vz = v
    safe_vx = jnp.where(vx != 0, vx, 1.0)
    y_over_x = vy / safe_vx
    z_over_x = vz / safe_vx
    small = (
        (jnp.abs(y_over_x) < prec.small_angle_rad)
        & (jnp.abs(z_over_x) < prec.small_angle_rad)
        & (vx != 0)
    )

    qs_y = 0.5 * z_over_x
    qs_z = -0.5 * y_over_x
    qs_w = 1.0 + 0.5 * (-qs_y * qs_y - qs_z * qs_z)

    norm2 = vx * vx + vy * vy + vz * vz
    inv_norm = jnp.where(
        norm2 > 0, 1.0 / jnp.sqrt(jnp.where(norm2 > 0, norm2, 1.0)), 0.0
    )
    nx, ny, nz = vx * inv_norm, vy * inv_norm, vz * inv_norm
    nx_g = jnp.where(small, 0.0, jnp.clip(nx, -1.0, 1.0))
    theta = _acos(nx_g)
    yz2 = nz * nz + ny * ny
    axis_mag_inv = 1.0 / jnp.sqrt(jnp.where(yz2 > 0, yz2, 1.0))
    half = 0.5 * theta
    s = jnp.sin(half)
    qg_w = jnp.cos(half)
    qg_y = nz * axis_mag_inv * s
    qg_z = -ny * axis_mag_inv * s
    anti = theta > (math.pi - prec.discard_angle_rad)
    qg_w = jnp.where(anti, 0.0, qg_w)
    qg_y = jnp.where(anti, 1.0, qg_y)
    qg_z = jnp.where(anti, 0.0, qg_z)

    w = jnp.where(small, qs_w, qg_w)
    y = jnp.where(small, qs_y, qg_y)
    z = jnp.where(small, qs_z, qg_z)

    zero_in = norm2 == 0
    w = jnp.where(zero_in, 1.0, w)
    y = jnp.where(zero_in, 0.0, y)
    z = jnp.where(zero_in, 0.0, z)
    return (w, jnp.zeros_like(w), y, z)


def _to_x(d, v):
    """Rotate vector components so bond axis d looks like +X
    (reference: VX_Bond.h:45-48 ToXDirBond)."""
    x, y, z = v
    if d == 0:
        return (x, y, z)
    if d == 1:
        return (y, -x, z)
    return (z, y, -x)


def _to_orig(d, v):
    x, y, z = v
    if d == 0:
        return (x, y, z)
    if d == 1:
        return (-y, x, z)
    return (-z, y, x)


def _roll_nbr(a, stride):
    """Value at the +d neighbor (flat stride along lanes); wrapped entries
    are masked by the bond mask downstream."""
    return jnp.roll(a, -stride, axis=1)


def _roll_from_nbr(a, stride):
    return jnp.roll(a, stride, axis=1)


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _vox_mat_stress_k(strain, e, mm, pm, ys, ss=None):
    """Material stress on (b, Vp) channels (kernel analog of
    core.step._vox_mat_stress). `ss`: optional MDL_DATA channel dict with
    xs/ys point lists + fail/last_stress/last_slope, mirroring the
    vectorized segment search of core.step.py."""
    linear = e * strain
    ystrain = _safe_div(ys, e)
    bilinear = jnp.where(
        strain > ystrain, ys + pm * (strain - ystrain), linear
    )
    out = jnp.where(mm > 1.5, bilinear, linear)  # MDL_BILINEAR == 2
    if ss is not None:
        xs, ys_t = ss["xs"], ss["ys"]  # lists of P (b, Vp) channels
        P = len(xs)
        # first segment i with xs[i+1] > strain (i1-safe select-sums)
        seg = jnp.zeros_like(strain)
        for k in range(1, P - 1):
            seg = seg + jnp.where(xs[k] <= strain, 1.0, 0.0)
        x1 = jnp.zeros_like(strain)
        x2 = jnp.zeros_like(strain)
        y1 = jnp.zeros_like(strain)
        y2 = jnp.zeros_like(strain)
        for k in range(P - 1):
            hit = jnp.where(seg == k, 1.0, 0.0)
            x1 = x1 + hit * xs[k]
            x2 = x2 + hit * xs[k + 1]
            y1 = y1 + hit * ys_t[k]
            y2 = y2 + hit * ys_t[k + 1]
        interp = y1 + _safe_div(strain - x1, x2 - x1) * (y2 - y1)
        past = ss["last_stress"] + ss["last_slope"] * (strain - ss["fail"])
        data = jnp.where(strain < ss["fail"], interp, past)
        out = jnp.where(mm > 2.5, data, out)  # MDL_DATA == 3
    return out


def _bond_dir(d, stride, st, body_at, scalars, prec: Precision,
              vol_ctx=None, nonlinear=False, plasticity=False,
              ss_ctx=None, want_sv12=False):
    """Port of core.step._bond_axis_forces for one lattice direction on
    (b, Vp) component arrays. Returns force/moment/memory dict.

    `vol_ctx` switches on the volume-effects stress path (reference:
    VXS_BondInternal.cpp:200-298): dict with per-voxel `ehv` (Eh), `uv`
    (Poisson), this direction's carried `ts` (TStrainSum avg) and `cs`
    (CSArea avg), and `therm` (per-voxel thermal stress term or None).

    `want_sv12` additionally returns the per-side strains sv1/sv2
    (StrainPosDirsCur/StrainNegDirsCur writes, land_water
    VXS_BondInternal.cpp:301-303) — consumed by the in-kernel deformed-mesh
    facet drag's corner offsets."""
    L = scalars["L"]
    dt = scalars["dt"]  # (b, 1)
    bondz = 0.5 * scalars["bond_damping_z"]

    bd = lambda k: body_at(_B_DIR + d * _B_PER_DIR + k)  # noqa: E731
    mask = bd(_D_MASK) > 0.5

    pos = st["pos"]
    quat = st["quat"]
    rel = _to_x(d, tuple(_roll_nbr(p, stride) - p for p in pos))
    q1 = (quat[0],) + _to_x(d, quat[1:])
    qn = tuple(_roll_nbr(q, stride) for q in quat)
    q2 = (qn[0],) + _to_x(d, qn[1:])

    ang1_rel = _qrot_inv(q1, rel)
    new_ang2 = _qmul(_qconj(q1), q2)

    scale = st["scale"]
    if vol_ctx is not None:
        # rest length is the nominal lattice under volume effects
        # (core.step.py:225-228)
        nom_dist = jnp.full_like(scale, L)
    else:
        nom_dist = (scale + _roll_nbr(scale, stride)) * 0.5

    rx, ry, rz = ang1_rel
    small_turn = _safe_div(jnp.abs(rz) + jnp.abs(ry), rx)
    extend_perc = _safe_div(rx, nom_dist)

    sa_prev = st["small"][d]
    go_small = (
        (~sa_prev)
        & (new_ang2[0] > prec.small_angle_w)
        & (small_turn < prec.sa_bond_bend_rad)
        & (extend_perc < SA_BOND_EXT_PERC)
    )
    go_large = sa_prev & (
        (~(new_ang2[0] > prec.smallish_angle_w))
        | (small_turn > HYSTERESIS_FACTOR * prec.sa_bond_bend_rad)
        | (extend_perc > HYSTERESIS_FACTOR * SA_BOND_EXT_PERC)
    )
    # (boolean algebra, not select: Mosaic has no i1-vector select_n;
    # go_small implies ~sa_prev and go_large implies sa_prev, so this is
    # exactly where(go_small, T, where(go_large, F, sa_prev)))
    small = go_small | (sa_prev & ~go_large)
    changed = go_small | go_large

    # small-angle frame (reference: VXS_BondInternal.cpp:87-100)
    a2_small = _q_to_rotvec(new_ang2, prec)
    pos2_small = (rx - nom_dist, ry, rz)
    totrot_small = _qconj(q1)

    # large-angle frame (reference: :101-118)
    p2ar = _q_from_angle_to_pos_x(ang1_rel, prec)
    totrot_large = _qmul(p2ar, _qconj(q1))
    length = _safe_norm3(*rel)
    zeros = jnp.zeros_like(length)
    pos2_large = (length - nom_dist, zeros, zeros)
    a1_large = _q_to_rotvec(p2ar, prec)
    a2_large = _q_to_rotvec(_qmul(totrot_large, q2), prec)

    sel = lambda a, b: jnp.where(small, a, b)  # noqa: E731
    _pos2 = tuple(sel(a, b) for a, b in zip(pos2_small, pos2_large))
    _a1 = tuple(sel(jnp.zeros_like(a), a) for a in a1_large)
    _a2 = tuple(sel(a, b) for a, b in zip(a2_small, a2_large))
    totrot = tuple(sel(a, b) for a, b in zip(totrot_small, totrot_large))

    # axial strain & linear two-material stress (reference: :189-307; the
    # all-linear fixed point of the stress equalization loop — core.step's
    # `all_linear` branch)
    strain = _pos2[0] / L
    if vol_ctx is not None:
        # Poisson-coupled stress σ = Eh(1−u)ε + Eh·u·TSavg with composite
        # Eh/u built on the fly from per-voxel channels (harmonic means,
        # VX_Bond.cpp:90-97), minus the thermal term (core.step.py:273-371)
        eh1 = vol_ctx["ehv"]
        eh2 = _roll_nbr(eh1, stride)
        eh = 2.0 * _safe_div(eh1 * eh2, eh1 + eh2)
        u1 = vol_ctx["uv"]
        u2 = _roll_nbr(u1, stride)
        u = 2.0 * _safe_div(u1 * u2, u1 + u2)
        stress = eh * (1.0 - u) * strain + eh * u * vol_ctx["ts"]
        if vol_ctx["therm"] is not None:
            stress = stress - 0.5 * (
                vol_ctx["therm"] + _roll_nbr(vol_ctx["therm"], stride)
            )
        hom = bd(_D_HOM) > 0.5  # no near-equal widening in this mode
        sv = jnp.where(hom, jnp.where(mask, strain, 0.0), 0.0)
        # heterogeneous bonds leave per-side strains at 0 in this mode
        # (core.step.py:285-286; VXS_Bond.cpp:66-67)
        sv1k = sv2k = sv
    elif nonlinear:
        # bilinear / MDL_DATA materials: per-side stress with the
        # reference's 3-iteration stress-equalization loop
        # (core.step.py:297-328; VXS_BondInternal.cpp:237-253)
        side1 = (body_at(_B_EMOD), body_at(_B_MATMODEL),
                 body_at(_B_PLASTIC), body_at(_B_YIELD))
        side2 = tuple(_roll_nbr(a, stride) for a in side1)
        ss1 = ss2 = None
        if ss_ctx is not None:
            ss1 = ss_ctx
            ss2 = {
                k: ([_roll_nbr(c, stride) for c in v]
                    if isinstance(v, list)
                    else _roll_nbr(v, stride))
                for k, v in ss_ctx.items()
            }
        sv1 = strain
        sv2 = strain
        s1 = _vox_mat_stress_k(sv1, *side1, ss=ss1)
        s2 = _vox_mat_stress_k(sv2, *side2, ss=ss2)
        for _ in range(3):
            ssum = s1 + s2
            converged = jnp.abs(s1 - s2) <= 0.0005 * jnp.abs(ssum)
            sv1 = jnp.where(converged, sv1, 2.0 * _safe_div(s2, ssum) * sv1)
            sv2 = jnp.where(converged, sv2, 2.0 * _safe_div(s1, ssum) * sv2)
            s1 = _vox_mat_stress_k(sv1, *side1, ss=ss1)
            s2 = _vox_mat_stress_k(sv2, *side2, ss=ss2)
        hom = bd(_D_HOM) > 0.5
        stress_hom = _vox_mat_stress_k(strain, *side1, ss=ss1)
        stress = jnp.where(hom, stress_hom, 0.5 * (s1 + s2))
        sv = None
        sv1k = jnp.where(hom, strain, sv1) if want_sv12 else None
        sv2k = jnp.where(hom, strain, sv2) if want_sv12 else None
    else:
        E1, E2, E = bd(_D_E1), bd(_D_E2), bd(_D_E)
        s_sum = E1 + E2
        near_equal = jnp.abs(E1 - E2) <= 0.0005 * jnp.abs(s_sum)
        hom = (bd(_D_HOM) > 0.5) | near_equal
        stress = jnp.where(hom, 0.5 * s_sum * strain, E * strain)
        sv = None
        if want_sv12:
            # linear fixed point of the stress equalization
            # (core.step.py:296-297)
            sv1k = jnp.where(hom, strain, 2.0 * _safe_div(E2, s_sum) * strain)
            sv2k = jnp.where(hom, strain, 2.0 * _safe_div(E1, s_sum) * strain)

    if plasticity:
        # plastic high-water memory (reference VXS_BondInternal.cpp:193-207:
        # new-territory strains follow the material curve; inside it the
        # stress unloads linearly from the strain offset)
        E_pl = bd(_D_E)
        so = st["soff"][d]
        new_territory = strain >= st["maxs"][d]
        stress = jnp.where(new_territory, stress, E_pl * (strain - so))
        max_strain = jnp.maximum(st["maxs"][d], strain)
        soff_new = jnp.where(
            new_territory, max_strain - _safe_div(stress, E_pl), so
        )
    else:
        max_strain = jnp.maximum(st["maxs"][d], strain)
        soff_new = None

    # beam forces/moments in the bond frame (reference: :122-154)
    b1, b2, b3, a2c = bd(_D_B1), bd(_D_B2), bd(_D_B3), bd(_D_A2)
    cs_area = vol_ctx["cs"] if vol_ctx is not None else L * L
    p2y, p2z = _pos2[1], _pos2[2]
    a1x, a1y, a1z = _a1
    a2x, a2y, a2z = _a2

    f1 = (
        stress * cs_area,
        b1 * p2y - b2 * (a1z + a2z),
        b1 * p2z + b2 * (a1y + a2y),
    )
    f2 = tuple(-c for c in f1)
    m1 = (
        a2c * (a1x - a2x),
        b2 * p2z + b3 * (2.0 * a1y + a2y),
        -b2 * p2y + b3 * (2.0 * a1z + a2z),
    )
    m2 = (
        a2c * (a2x - a1x),
        b2 * p2z + b3 * (a1y + 2.0 * a2y),
        -b2 * p2y + b3 * (a1z + 2.0 * a2z),
    )

    # critical damping from frame-state memory (reference: :310-346)
    dt_inv = _safe_div(jnp.ones_like(dt), dt)
    lp2 = st["lp2"][d]
    la1 = st["la1"][d]
    la2 = st["la2"][d]
    rv = tuple((p - lp) * dt_inv for p, lp in zip(_pos2, lp2))
    rav1 = tuple((a - la) * dt_inv for a, la in zip(_a1, la1))
    rav2 = tuple((a - la) * dt_inv for a, la in zip(_a2, la2))
    rvx, rvy, rvz = rv
    sum_avz = rav1[2] + rav2[2]
    sum_avy = rav1[1] + rav2[1]
    dmp = (~changed) & (dt > 0)

    df1 = (
        bondz * (bd(_D_DA1M1) * rvx),
        bondz * (bd(_D_DB1M1) * rvy - bd(_D_DB2FM1) * sum_avz),
        bondz * (bd(_D_DB1M1) * rvz + bd(_D_DB2FM1) * sum_avy),
    )
    df2 = (
        bondz * (-bd(_D_DA1M2) * rvx),
        bondz * (-bd(_D_DB1M2) * rvy + bd(_D_DB2FM2) * sum_avz),
        bondz * (-bd(_D_DB1M2) * rvz - bd(_D_DB2FM2) * sum_avy),
    )
    davx = rav2[0] - rav1[0]
    hbz = 0.5 * bondz
    dm1 = (
        hbz * (-bd(_D_DA2I1) * davx),
        hbz * (bd(_D_DB2FM1) * rvz + bd(_D_DB3I1) * (2.0 * rav1[1] + rav2[1])),
        hbz * (-bd(_D_DB2FM1) * rvy + bd(_D_DB3I1) * (2.0 * rav1[2] + rav2[2])),
    )
    dm2 = (
        hbz * (bd(_D_DA2I2) * davx),
        hbz * (bd(_D_DB2FM2) * rvz + bd(_D_DB3I2) * (rav1[1] + 2.0 * rav2[1])),
        hbz * (-bd(_D_DB2FM2) * rvy + bd(_D_DB3I2) * (rav1[2] + 2.0 * rav2[2])),
    )
    add = lambda f, df: tuple(  # noqa: E731
        a + jnp.where(dmp, b, 0.0) for a, b in zip(f, df)
    )
    f1, f2, m1, m2 = add(f1, df1), add(f2, df2), add(m1, dm1), add(m2, dm2)

    # back to world frame (reference: :159-170)
    f1 = _to_orig(d, _qrot_inv(totrot, f1))
    f2 = _to_orig(d, _qrot_inv(totrot, f2))
    m1 = _to_orig(d, _qrot_inv(totrot, m1))
    m2 = _to_orig(d, _qrot_inv(totrot, m2))

    msk = lambda v: tuple(jnp.where(mask, c, 0.0) for c in v)  # noqa: E731
    f1, f2, m1, m2 = msk(f1), msk(f2), msk(m1), msk(m2)

    # damping memory goes stale for one step on a hysteresis transition
    # (reference: AddDampForces skipped when `changed` — VXS_BondInternal.cpp:344)
    keepv = lambda old, new: tuple(  # noqa: E731
        jnp.where(mask, jnp.where(changed, o, n), 0.0)
        for o, n in zip(old, new)
    )
    return dict(
        f1=f1,
        f2=f2,
        m1=m1,
        m2=m2,
        strain=jnp.where(mask, strain, 0.0),
        small=(mask & small) | (~mask & sa_prev),
        lp2=keepv(lp2, _pos2),
        la1=keepv(la1, _a1),
        la2=keepv(la2, _a2),
        maxs=jnp.where(mask, max_strain, 0.0),
        soff=(jnp.where(mask, soff_new, 0.0) if plasticity else None),
        sv=sv,  # homogeneous per-side strain (volume-effects voxel pass)
        sv1=(jnp.where(mask, sv1k, 0.0) if want_sv12 else None),
        sv2=(jnp.where(mask, sv2k, 0.0) if want_sv12 else None),
    )


def _pair_contact_forces(p3, s, a1, f32):
    """All-pairs sphere-envelope contact for ONE robot, channel-major.

    TPU-native re-expression of core.collision.collision_forces
    (reference: VXS_BondCollision.cpp:41-59): instead of gathering an
    S-surface subset (lane gathers don't exist on the VPU), evaluate the
    full Vp×Vp pair field — `a1` is the dense pair-stiffness table whose
    zeros encode the lattice-nearby exclusion, the non-surface rows and the
    padding, so the extra pairs contribute exactly 0. The column broadcasts
    are lane→sublane relayouts; the final Σ_j is a lane reduction + a
    sublane→lane relayout (measured 1.8× faster than an MXU contraction at
    HIGHEST precision and exactly f32 — a DEFAULT-precision MXU dot is the
    same speed but rounds the pair forces to bf16).

    mag uses the rsqrt form a1·(nom·rsqrt(d²) − 1) ≡ a1·overlap/dist
    gated on nom·rsqrt(d²) > 1 ≡ overlap > 0 — one transcendental instead
    of sqrt + divide (r4: ~10% faster on the with-collision workload).

    r4 measured dead end — AABB-culled 128-lane tile evaluation (the
    reference's candidate-list economics at tile granularity, prototyped
    three ways at /tmp/blk*_proto.py): per-tile ops run at HALF the dense
    formulation's per-element rate (small-op relayouts + accumulator
    read-modify-writes), each pl.when + scalar VMEM mask read costs
    ~0.5 µs (288/step → 153 µs of pure overhead vs the 82 µs TOTAL dense
    cost), and the porous 10³ bench body keeps 15/36 upper-tri tiles
    permanently hot with ~100 real rest contacts, capping culling at
    ~0.4× work. Every variant measured at or above dense; tiles only pay
    off beyond ~2k lanes, where the dense table outgrows VMEM anyway.

    r5 measured dead end — surface-compacted pair pass
    (`_pair_contact_forces_compact`, opt-in EVOSORO_TPU_COLL_COMPACT=1):
    gather the Sp=768 surface lanes with a one-hot (Vp, Sp) MXU matmul,
    evaluate the (Sp, Sp) pair field (1.8× fewer pair elements at the
    bench body's 653 surface voxels), scatter back through the same
    one-hot. Measured 69.9M vs dense 74.4M voxel-steps/s (0.94×,
    COLLBENCH.json r5): the two HIGHEST-precision MXU passes per step
    (f32 emulation ≈ 6 bf16 passes each) plus their VREG↔MXU relayouts
    cost more than the 1.8× saved VPU pair work. Would only win when
    Sp/Vp is far smaller — i.e. large solid bodies, the opposite of
    evolved porous soft robots.

    p3: tuple of 3 (1, Vp) position channels; s: (1, Vp) scale;
    a1: (Vp, Vp). Returns 3 (1, Vp) force channels (force ON voxel i).
    """
    Vq = s.shape[-1]
    shape2 = (Vq, Vq)
    col = [jnp.broadcast_to(p.reshape(Vq, 1), shape2) for p in p3]  # p_i
    row = [jnp.broadcast_to(p, shape2) for p in p3]  # p_j
    diff = [r - c for r, c in zip(row, col)]  # p_j - p_i
    dist2 = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
    inv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
    nom = 0.75 * (
        jnp.broadcast_to(s.reshape(Vq, 1), shape2) + jnp.broadcast_to(s, shape2)
    )
    tt = nom * inv
    mag = jnp.where(tt > 1.0, a1 * (tt - 1.0), 0.0)
    return [
        (-jnp.sum(mag * dc, axis=1, keepdims=True)).reshape(1, Vq)
        for dc in diff
    ]


def _pair_contact_forces_compact(p3, s, packed, Vp, f32):
    """Surface-compacted variant of `_pair_contact_forces` (VERDICT r4
    weak #3's untried idea): lane gathers don't exist on the VPU, but the
    MXU does permutation matmuls cheaply — gather the Sp surface lanes
    with a one-hot (Vp, Sp) matmul at HIGHEST precision (exact for
    one-hot operands), evaluate the (Sp, Sp) pair field (~(Sp/Vp)² of the
    dense work), and scatter the forces back through the same one-hot.

    `packed`: (Vp + Sp, Sp) — rows [0, Vp) are the gather one-hot G,
    rows [Vp, Vp+Sp) the compacted pair-stiffness table a1_s.
    Returns 3 (1, Vp) force channels."""
    g = packed[:Vp, :]  # (Vp, Sp) one-hot
    a1_s = packed[Vp:, :]  # (Sp, Sp)
    Sq = a1_s.shape[-1]
    vals = jnp.concatenate([p3[0], p3[1], p3[2], s], axis=0)  # (4, Vp)
    hi = jax.lax.Precision.HIGHEST
    gs = jax.lax.dot_general(
        vals, g, (((1,), (0,)), ((), ())), precision=hi,
        preferred_element_type=f32)  # (4, Sp)
    ps = [gs[k:k + 1, :] for k in range(3)]
    ss = gs[3:4, :]
    shape2 = (Sq, Sq)
    col = [jnp.broadcast_to(p.reshape(Sq, 1), shape2) for p in ps]
    row = [jnp.broadcast_to(p, shape2) for p in ps]
    diff = [r - c for r, c in zip(row, col)]
    dist2 = diff[0] * diff[0] + diff[1] * diff[1] + diff[2] * diff[2]
    inv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
    nom = 0.75 * (
        jnp.broadcast_to(ss.reshape(Sq, 1), shape2)
        + jnp.broadcast_to(ss, shape2)
    )
    tt = nom * inv
    mag = jnp.where(tt > 1.0, a1_s * (tt - 1.0), 0.0)
    f_s = jnp.concatenate([
        (-jnp.sum(mag * dc, axis=1, keepdims=True)).reshape(1, Sq)
        for dc in diff
    ], axis=0)  # (3, Sp)
    f_v = jax.lax.dot_general(
        f_s, g, (((1,), (1,)), ((), ())), precision=hi,
        preferred_element_type=f32)  # (3, Vp)
    return [f_v[c:c + 1, :] for c in range(3)]


def _make_kernel(
    X: int,
    Y: int,
    Z: int,
    Vp: int,
    num_steps: int,
    scalars_static: dict,
    flags: dict,
    prec: Precision,
    n_knots: int,
    total_steps: int | None = None,
    bwd: bool = False,
):
    """Build the kernel body closure. `scalars_static` holds python-float
    physics constants baked into the trace; `flags` holds static feature
    booleans (floor/gravity/temp/sticky/control).

    `total_steps`/flags["segmented"]: segment mode — the kernel advances
    `num_steps` of a `total_steps` rollout starting at a runtime step
    offset (SMEM scalar), so control-knot boundaries and the step-0 IniCM
    seed use the GLOBAL step index. `bwd` builds the reverse-mode segment
    kernel instead: it recomputes the segment forward into VMEM scratch,
    then pulls a state cotangent back through every step with `jax.vjp`
    of the same step closure (the differentiable-MPC path; SURVEY.md §7
    hard part 5)."""
    strides = (Y * Z, Z, 1)
    knot_steps = int(total_steps if total_steps is not None else num_steps)
    segmented = bool(flags.get("segmented"))

    def kernel(*refs):
        refs = list(refs)
        state_in = refs.pop(0)
        body_ref = refs.pop(0)
        col_ref = refs.pop(0) if flags.get("collision") else None
        ss_ref = refs.pop(0) if flags.get("mdl_data") else None
        bc_ref = refs.pop(0) if flags.get("bc") else None
        stats_in = refs.pop(0)
        ctrl_ref = refs.pop(0) if n_knots else None
        seg_ref = refs.pop(0) if segmented else None
        if bwd:
            cot_in = refs.pop(0)
            cot_state_out, cot_ctrl_out = refs.pop(0), refs.pop(0)
            carr_scr, scal_scr = refs
            state_out = stats_out = None
        else:
            state_out, stats_out = refs

        f32 = state_in.dtype

        def body_at(k):
            return body_ref[:, k, :]

        sc = dict(scalars_static)
        L = sc["L"]

        # ---- load state into carry tuples ----
        def ch(k):
            return state_in[:, k, :]

        pos0 = tuple(ch(_POS + c) for c in range(3))
        quat0 = tuple(ch(_QUAT + c) for c in range(4))
        lin0 = tuple(ch(_LIN + c) for c in range(3))
        ang0 = tuple(ch(_ANG + c) for c in range(3))
        scale0 = ch(_SCALE)
        # masks ride the loop carry as f32 0/1 — Mosaic cannot carry
        # i1 vectors through scf.for
        small0 = tuple(ch(_SMALL + d) for d in range(3))
        lp20 = tuple(tuple(ch(_LP2 + 3 * d + c) for c in range(3)) for d in range(3))
        la10 = tuple(tuple(ch(_LA1 + 3 * d + c) for c in range(3)) for d in range(3))
        la20 = tuple(tuple(ch(_LA2 + 3 * d + c) for c in range(3)) for d in range(3))
        maxs0 = tuple(ch(_MAXS + d) for d in range(3))
        plasticity = bool(flags.get("plasticity"))
        soff0 = (tuple(ch(_SOFF + d) for d in range(3)) if plasticity
                 else ())

        def stat(k):
            # stats ride a (1, b, C_STAT) block: the leading singleton keeps
            # the last-two block dims (b, C_STAT) equal to the array's, so
            # Mosaic's 8x128 block-tiling rule holds for ANY batch_block
            # (narrowed 4/2 blocks for big self-collision bodies included)
            return stats_in[0, :, k:k + 1]  # (b, 1)

        t0 = stat(_S_TIME)
        div0 = stat(_S_DIV)
        dt0 = stat(_S_DT)
        ini0 = tuple(stat(_S_INICM + c) for c in range(3))
        capt0 = stat(_S_CAPT)
        inv_mass_tot = stat(_S_INV_MASS)
        stop_t = stat(_S_STOP)
        tamp = stat(_S_TAMP)
        tper = stat(_S_TPER)
        init_cm = stat(_S_INITCM)
        grav = stat(_S_GRAV)
        min_tf = stat(_S_MINTF)
        gamp = stat(_S_GAMP)
        dragc = stat(_S_DRAGC)

        occ = body_at(_B_OCC) > 0.5
        mass = body_at(_B_MASS)
        mass_inv = body_at(_B_MASS_INV)
        inertia_inv = body_at(_B_INERTIA_INV)
        two_sq_mexs = body_at(_B_2SQ_MEXS)
        two_sq_iexsss = body_at(_B_2SQ_IEXSSS)
        lin_stiffness = body_at(_B_LIN_STIFF)
        u_static = body_at(_B_US)
        u_dynamic = body_at(_B_UD)
        cte = body_at(_B_CTE)
        phase = body_at(_B_PHASE)
        amp_damp = body_at(_B_AMPDAMP)
        devo_on = (flags["use_init_size"] or flags["use_final_size"]
                   or flags["use_growth_t"])
        if devo_on:
            init_size = body_at(_B_INIT_SIZE)
            final_size = body_at(_B_FINAL_SIZE)
            growth_t = body_at(_B_GROWTH_T)
            start_gt = body_at(_B_START_GT)
        if flags["use_final_phase"]:
            final_phase = body_at(_B_FINAL_PHASE)
        if flags["use_final_ad"]:
            final_ad = body_at(_B_FINAL_AD)

        if ctrl_ref is not None:
            # static per-knot reads; the per-step knot lookup is a select-sum
            # (Mosaic lowers neither dynamic_slice on values nor i1 gathers)
            ctrl_knots = tuple(ctrl_ref[:, k, :] for k in range(n_knots))
        else:
            ctrl_knots = ()
        # segment mode: runtime global-step offset (SMEM scalar)
        seg0 = seg_ref[0] if segmented else 0

        if flags.get("equilibrium"):
            ke0 = tuple(stat(_S_KE + k) for k in range(6))
        else:
            ke0 = ()

        # ---- fitness-feature carries (r4: needle / falling-prohibited /
        # NormDistByVol / trace windows / ballistic devo in-kernel; the jnp
        # analogs live in core/rollout.py step_fn + core/step.py devo) ----
        feat_on = bool(
            flags.get("needle") or flags.get("falling")
            or flags.get("ndbv") or flags.get("window")
            or flags.get("ballistic")
        )
        n_win = int(flags.get("n_win", 0) or 0)
        if feat_on:
            matid = body_at(_B_MAT)
            feat0 = (
                stat(_S_FELL), stat(_S_PCMY), stat(_S_PVOL),
                stat(_S_ND), stat(_S_NDRG), stat(_S_NDFZ),
                stat(_S_NTR), stat(_S_LASTTR),
                stat(_S_WLAST), stat(_S_WPREV), stat(_S_WCNT),
                stat(_S_LASTWIN),
                stat(_S_NEEDLE), stat(_S_NEEDLE + 1), stat(_S_NEEDLE + 2),
                stat(_S_NCAP), stat(_S_EOLY), stat(_S_EOLCAP),
            )
            # trace-sample ring for the windowed distance (exact replication
            # of core/rollout's buf_y/buf_v; single-call rollouts only)
            ringy0 = tuple(jnp.zeros_like(t0) for _ in range(n_win))
            ringv0 = tuple(jnp.zeros_like(t0) for _ in range(n_win))
        else:
            matid = None
            feat0 = ()
            ringy0 = ()
            ringv0 = ()
        if flags.get("ballistic"):
            # dynamic per-voxel devo fields (rebased in-step,
            # VXS_Voxel.cpp:342-381); packed from state.devo
            dd0 = tuple(ch(_DEVO_DYN + k) for k in range(4))
        else:
            dd0 = ()

        if ss_ref is not None:
            P_ss = (ss_ref.shape[1] - 3) // 2
            ss_ctx = dict(
                xs=[ss_ref[0, k, :][None] if ss_ref.shape[0] == 1
                    else ss_ref[:, k, :] for k in range(P_ss)],
                ys=[ss_ref[0, P_ss + k, :][None] if ss_ref.shape[0] == 1
                    else ss_ref[:, P_ss + k, :] for k in range(P_ss)],
                fail=(ss_ref[0, 2 * P_ss, :][None]
                      if ss_ref.shape[0] == 1 else ss_ref[:, 2 * P_ss, :]),
                last_stress=(ss_ref[0, 2 * P_ss + 1, :][None]
                             if ss_ref.shape[0] == 1
                             else ss_ref[:, 2 * P_ss + 1, :]),
                last_slope=(ss_ref[0, 2 * P_ss + 2, :][None]
                            if ss_ref.shape[0] == 1
                            else ss_ref[:, 2 * P_ss + 2, :]),
            )
        else:
            ss_ctx = None

        if bc_ref is not None:
            def bc_at(k):
                return (bc_ref[0, k, :][None] if bc_ref.shape[0] == 1
                        else bc_ref[:, k, :])

            dof_fix = [bc_at(k) > 0.5 for k in range(6)]  # X,Y,Z,TX,TY,TZ
            ext_f = [bc_at(6 + c) for c in range(3)]
            ext_d = [bc_at(9 + c) for c in range(3)]
            ext_td = [bc_at(12 + c) for c in range(3)]
            rot_fixed = dof_fix[3] & dof_fix[4] & dof_fix[5]
            # nominal lattice positions from the lane index (x-major flat
            # id = x·Y·Z + y·Z + z; centers at (i+0.5)·L like build_body)
            # Mosaic has no f32 iota — generate i32 lanes and convert
            vflat = jax.lax.broadcasted_iota(
                jnp.int32, (1, Vp), dimension=1
            ).astype(f32)
            vx = jnp.floor(vflat / (Y * Z))
            rem = vflat - vx * (Y * Z)
            vy = jnp.floor(rem / Z)
            vz = rem - vy * Z
            nom_pos_bc = [(vx + 0.5) * L, (vy + 0.5) * L, (vz + 0.5) * L]
            # prescribed orientation for all-rotation-fixed voxels
            # (core.quaternion.quat_from_rotation_vector semantics)
            a2 = ext_td[0] * ext_td[0] + ext_td[1] * ext_td[1] \
                + ext_td[2] * ext_td[2]
            nzr = a2 > 0
            ang_r = jnp.sqrt(jnp.where(nzr, a2, 1.0))
            half_r = 0.5 * ang_r
            s_r = jnp.where(nzr, jnp.sin(half_r) / ang_r, 0.5)
            w_r = jnp.where(nzr, jnp.cos(half_r), 1.0)
            quat_fix = (w_r,) + tuple(t * s_r for t in ext_td)
        else:
            dof_fix = None

        src_params = sc.get("sources", ())
        n_src = len(src_params)
        if n_src:
            srcmin0 = tuple(stat(_S_SRC + k) for k in range(n_src))
            srcsum0 = tuple(stat(_S_SRC + 3 + k) for k in range(n_src))
            srccnt0 = stat(_S_SRC + 6)
        else:
            srcmin0 = srcsum0 = ()
            srccnt0 = ()

        vol = vol_outer = bool(flags.get("volume"))
        if vol:
            e_mod_v = body_at(_B_EMOD)
            mu_v = body_at(_B_POISSON)
            mtph = body_at(_B_MTPHASE)
            # per-voxel Eh = E/((1−2u)(1+u)) (VX_Bond.cpp:90-97)
            ehv = _safe_div(e_mod_v, (1.0 - 2.0 * mu_v) * (1.0 + mu_v))
            tsavg0 = tuple(ch(_TSAVG + c) for c in range(3))
            csavg0 = tuple(ch(_CSAVG + c) for c in range(3))
        else:
            tsavg0 = csavg0 = ()

        # ---- deformed-mesh facet drag statics (land_water
        # VX_Sim.cpp:1516-1600, VX_MeshUtil.cpp:368-421 redesigned as a
        # corner-lattice stencil; the jnp analog is envs/drag.py).
        # Requires the body grid to carry one empty shell layer at the +X/
        # +Y/+Z faces (supports() enforces it), so every corner-lattice
        # point p of an occupied voxel maps onto a voxel lane and all
        # lane-rotation reads across the boundary land on empty lanes.
        fluid_mesh = bool(flags.get("fluid_mesh"))
        if fluid_mesh:
            _e_list = [(ex, ey, ez)
                       for ex in (0, 1) for ey in (0, 1) for ez in (0, 1)]

            def _stride_of(d3):
                return (d3[0] * strides[0] + d3[1] * strides[1]
                        + d3[2] * strides[2])

            occ_f = jnp.where(occ, 1.0, 0.0).astype(f32)
            # occupancy of voxel p-e seen from corner-point lane p
            occm_e = {
                e: (_roll_from_nbr(occ_f, _stride_of(e)) if _stride_of(e)
                    else occ_f)
                for e in _e_list
            }
            wsum_mesh = occm_e[_e_list[0]]
            for e in _e_list[1:]:
                wsum_mesh = wsum_mesh + occm_e[e]
            inv_wsum_mesh = jnp.where(
                wsum_mesh > 0, 1.0 / jnp.maximum(wsum_mesh, 1.0), 0.0)
            # face exposure: occupied with an empty neighbor in the face
            # direction (build_mesh_drag's exposed test)
            exposed_mesh = {}
            for a in range(3):
                occ_p = _roll_nbr(occ_f, strides[a]) > 0.5
                occ_n = _roll_from_nbr(occ_f, strides[a]) > 0.5
                exposed_mesh[(a, +1)] = occ & ~occ_p
                exposed_mesh[(a, -1)] = occ & ~occ_n

        def step(i, carry, ctrl_vals=()):
            i_glob = seg0 + i if segmented else i
            (pos, quat, lin, ang, scale, small_f, lp2, la1, la2, maxs,
             t, div_f, ini, capt_f, tsavg, csavg, ke_hist, dt_carry,
             soff, src_min, src_sum, src_cnt, feat, ringy, ringv, dd) = carry
            small = tuple(sf > 0.5 for sf in small_f)
            div = div_f > 0.5
            capt = capt_f > 0.5
            if flags.get("ballistic"):
                init_size_s, final_size_s, growth_t_s, start_gt_s = dd
            elif devo_on:
                init_size_s, final_size_s = init_size, final_size
                growth_t_s, start_gt_s = growth_t, start_gt
            # the bond damping pass reads the previous step's dt; under
            # volume effects dt is recomputed after the bond pass
            # (VX_Sim.cpp:1792-1795), otherwise it is constant
            dt_p = dt_carry[0] if vol else dt0

            if n_src:
                # environmental source tracking from the previous step's
                # positions (reference: VX_Sim.cpp:1060 + 2527-2558;
                # core/rollout.py:332-345). Oscillation clock runs from
                # actuation onset; distances in lattice units.
                tau = jnp.maximum(t - init_cm, 0.0)  # (b,1)
                new_min = []
                for (bx, by, bz, ax, ay, az, fx, fy, fz) in src_params:
                    # Vec3D's π truncation (envs/sources.REF_PI_VEC3D)
                    two_pi = 2.0 * 3.14159265358979
                    sxp = bx + ax * jnp.sin(two_pi * fx * tau)
                    syp = by + ay * jnp.sin(two_pi * fy * tau)
                    szp = bz + az * jnp.sin(two_pi * fz * tau)
                    d2 = (
                        (pos[0] - sxp) ** 2
                        + (pos[1] - syp) ** 2
                        + (pos[2] - szp) ** 2
                    )
                    d2 = jnp.where(occ, d2, jnp.asarray(3.4e38, f32))
                    dmin = jnp.sqrt(
                        jnp.min(d2, axis=1, keepdims=True)
                    ) / L
                    new_min.append(dmin)
                src_min = tuple(new_min)
                hist = (i % 50) == 0  # UPDATE_SOURCES_HIST_EVERY
                histf = jnp.where(hist, 1.0, 0.0)
                src_sum = tuple(
                    s + histf * m for s, m in zip(src_sum, src_min)
                )
                src_cnt = src_cnt + histf

            # ---- rollout bookkeeping at the top of the step (reference:
            # VX_Sim.cpp:1064-1075 — IniCM capture from the previous step's
            # positions) ----
            cm = tuple(
                jnp.sum(p * mass, axis=1, keepdims=True) * inv_mass_tot
                for p in pos
            )
            # seed with the step-0 CoM so never-captured rollouts report the
            # initial CoM, matching core.rollout's carry initialization
            capture = (~capt) & (t > init_cm)
            take = capture | ((i_glob == 0) & ~capt)
            ini = tuple(jnp.where(take, c, i0) for c, i0 in zip(cm, ini))
            capt = capt | capture

            if feat_on:
                (fell, pcmy, pvol, nd, ndrg, ndfz, ntr, lasttr,
                 wlast, wprev, wcnt, lastwin, ndl0, ndl1, ndl2, ncap,
                 eoly, eolcap) = feat
                # end-of-lifetime posterior Y from the previous step's
                # positions (reference: VX_Sim.cpp:1078-1082); min voxel y
                # over non-obstacle voxels in lattice units
                valid_no = occ & (jnp.abs(matid - 5.0) > 0.5)
                py = jnp.min(
                    jnp.where(valid_no, pos[1] * (1.0 / L),
                              jnp.asarray(3.4e38, f32)),
                    axis=1, keepdims=True)
                ecap = (eolcap < 0.5) & (t >= stop_t)
                eoly = jnp.where(ecap, py, eoly)
                eolcap = jnp.where(ecap, 1.0, eolcap)
                if flags.get("needle"):
                    # initial needle (mat-7) position at actuation onset
                    # (VX_Sim.cpp:1084-1088); masked mean like core.rollout
                    is7 = jnp.where(jnp.abs(matid - 7.0) < 0.5, 1.0, 0.0)
                    n7 = jnp.sum(is7, axis=1, keepdims=True)
                    npos = tuple(
                        (jnp.sum(is7 * p, axis=1, keepdims=True)
                         / jnp.maximum(n7, 1.0)).astype(f32) for p in pos)
                    ncapb = (ncap < 0.5) & (t > init_cm)
                    take_n = ncapb | ((i_glob == 0) & (ncap < 0.5))
                    ndl0 = jnp.where(take_n, npos[0], ndl0)
                    ndl1 = jnp.where(take_n, npos[1], ndl1)
                    ndl2 = jnp.where(take_n, npos[2], ndl2)
                    ncap = jnp.where(ncapb, 1.0, ncap)
                if flags.get("falling"):
                    # fall-over latch: more mat-6 feet than non-feet touch
                    # the floor (reference: VX_Sim.cpp:1412-1419)
                    pen = 0.5 * scale - pos[2]
                    touch = (pen > 0.0) & occ
                    nall = jnp.sum(jnp.where(touch, 1.0, 0.0),
                                   axis=1, keepdims=True)
                    feet = touch & (jnp.abs(matid - 6.0) < 0.5)
                    nfeet = jnp.sum(jnp.where(feet, 1.0, 0.0),
                                    axis=1, keepdims=True)
                    fell = jnp.maximum(fell, jnp.where(
                        (t > init_cm) & (nfeet > nall - nfeet), 1.0, 0.0))

            frozen = div | (t >= stop_t)
            if feat_on and flags.get("falling"):
                # a fallen-over robot's sim ends (core/rollout.py `stopped
                # = fell | ...`)
                frozen = frozen | (fell > 0.5)

            st = dict(
                pos=pos, quat=quat, scale=scale, small=small,
                lp2=lp2, la1=la1, la2=la2, maxs=maxs,
                soff=soff if plasticity else None,
            )

            # ---- bond pass ----
            if vol:
                # per-voxel thermal stress term (core.step.py:346-371);
                # kernel time `t` is the pre-step time like state.time
                therm = None
                if flags["temp_enabled"]:
                    if flags["vary_temp"]:
                        period_ok = tper != 0
                        w = (2.0 * REF_PI_FLOAT) * t * _safe_div(
                            jnp.ones_like(t), tper
                        )
                        dT = jnp.where(
                            period_ok, tamp * jnp.sin(w + mtph), 0.0
                        )
                    else:
                        dT = tamp * jnp.ones_like(mtph)
                    therm = _safe_div(
                        e_mod_v * cte * dT, 1.0 - 2.0 * mu_v
                    )
                vol_ctxs = [
                    dict(ehv=ehv, uv=mu_v, ts=tsavg[d], cs=csavg[d],
                         therm=therm)
                    for d in range(3)
                ]
            else:
                vol_ctxs = [None] * 3
            sc_step = dict(sc, dt=dt_p)
            bonds = [
                _bond_dir(d, strides[d], st, body_at, sc_step, prec,
                          vol_ctx=vol_ctxs[d],
                          nonlinear=bool(flags.get("nonlinear")),
                          plasticity=plasticity, ss_ctx=ss_ctx,
                          want_sv12=fluid_mesh)
                for d in range(3)
            ]

            if vol:
                # dt = DtFrac/(2π·max√(k_eff/m)) recomputed every step
                # (k_eff = Eh·CSavg/(ε·L+L), VXS_Bond.h:34; core.step.py)
                freq2 = None
                minv2 = [
                    jnp.maximum(mass_inv, _roll_nbr(mass_inv, strides[a]))
                    for a in range(3)
                ]
                for a in range(3):
                    eha1 = ehv
                    eha2 = _roll_nbr(ehv, strides[a])
                    eh_a = 2.0 * _safe_div(eha1 * eha2, eha1 + eha2)
                    m_a = body_at(_B_DIR + a * _B_PER_DIR + _D_MASK) > 0.5
                    eff_k = eh_a * csavg[a] / (
                        bonds[a]["strain"] * L + L
                    )
                    f2a = jnp.where(m_a, eff_k * minv2[a], 0.0)
                    f2a = jnp.max(f2a, axis=1, keepdims=True)
                    freq2 = f2a if freq2 is None else jnp.maximum(freq2, f2a)
                mfreq = jnp.sqrt(freq2)
                dt_n = jnp.where(
                    mfreq > 0,
                    sc["dt_frac"] / ((2.0 * REF_PI_DOUBLE) * mfreq),
                    dt_p,
                )
            else:
                dt_n = dt_p
            dt = dt_n  # everything from EulerStep on uses the fresh value

            if vol:
                # voxel-pass Poisson coupling for NEXT step's bond stress
                # (core.step._volume_effects_coupling; VXS_Voxel.cpp:543-632).
                # dof_fixed/external_force are zero inside the fused envelope
                # so the constrained-axis table reduces to pd & nd.
                L2 = L * L
                pd = [body_at(_B_DIR + a * _B_PER_DIR + _D_MASK) > 0.5
                      for a in range(3)]
                nd = [_roll_from_nbr(pd[a].astype(f32), strides[a]) > 0.5
                      for a in range(3)]
                sp = [bonds[a]["sv"] for a in range(3)]
                sn = [_roll_from_nbr(bonds[a]["sv"], strides[a])
                      for a in range(3)]
                if bc_ref is not None:
                    # constrained axes count as "bonded both sides"
                    # (core.step._volume_effects_coupling:156-165)
                    T3 = [
                        (pd[a] & nd[a])
                        | ((pd[a] | nd[a])
                           & (dof_fix[a] | (ext_f[a] != 0)))
                        for a in range(3)
                    ]
                    axs = []
                    for a in range(3):
                        both = pd[a] & nd[a]
                        s_ax = jnp.where(
                            both, 0.5 * (sp[a] + sn[a]),
                            jnp.where(pd[a], sp[a],
                                      jnp.where(nd[a], sn[a], 0.0)),
                        )
                        axs.append(jnp.where(T3[a], s_ax, 0.0))
                else:
                    T3 = [pd[a] & nd[a] for a in range(3)]
                    axs = [
                        jnp.where(T3[a], 0.5 * (sp[a] + sn[a]), 0.0)
                        for a in range(3)
                    ]

                def pw(s):
                    # pow(1+ε, −μ) − 1 via exp/log (vector-exponent pow)
                    return jnp.exp(
                        -mu_v * jnp.log(jnp.maximum(1.0 + s, 1e-6))
                    ) - 1.0

                tx, ty, tz = T3
                c0x, c0y, c0z = axs
                cx = jnp.where(
                    ~tx & ty & tz, pw(c0y + c0z),
                    jnp.where(~tx & ~ty & tz, pw(c0z),
                              jnp.where(~tx & ty & ~tz, pw(c0y), c0x)),
                )
                cy = jnp.where(
                    tx & ~ty & tz, pw(c0x + c0z),
                    jnp.where(~tx & ~ty & tz, pw(c0z),
                              jnp.where(tx & ~ty & ~tz, pw(c0x), c0y)),
                )
                cz = jnp.where(
                    tx & ty & ~tz, pw(c0x + c0y),
                    jnp.where(~tx & ty & ~tz, pw(c0y),
                              jnp.where(tx & ~ty & ~tz, pw(c0x), c0z)),
                )
                ts_ax = [cy + cz, cx + cz, cy + cx]
                cs_ax = [
                    (1.0 + cy) * (1.0 + cz) * L2,
                    (1.0 + cx) * (1.0 + cz) * L2,
                    (1.0 + cy) * (1.0 + cx) * L2,
                ]
                tsavg_new, csavg_new = [], []
                for a in range(3):
                    m = pd[a]
                    ts1 = jnp.where(m, ts_ax[a], 0.0)
                    ts2 = jnp.where(
                        m, _roll_nbr(ts_ax[a], strides[a]), 0.0)
                    cs1 = jnp.where(m, cs_ax[a], L2)
                    cs2 = jnp.where(m, _roll_nbr(cs_ax[a], strides[a]), L2)
                    tsavg_new.append(0.5 * (ts1 + ts2))
                    csavg_new.append(0.5 * (cs1 + cs2))
                tsavg_new = tuple(tsavg_new)
                csavg_new = tuple(csavg_new)
            else:
                tsavg_new = csavg_new = ()

            div_now = jnp.zeros_like(div)
            for d in range(3):
                smax = jnp.max(jnp.abs(bonds[d]["strain"]), axis=1, keepdims=True)
                div_now = div_now | (smax > DIVERGENCE_STRAIN)

            # ---- per-voxel force accumulation (VXS_Voxel.cpp:482-651) ----
            vel = tuple(l * mass_inv for l in lin)
            tf = [
                -sc["slow_damping_z"] * v * two_sq_mexs for v in vel
            ]
            for d in range(3):
                for c in range(3):
                    tf[c] = (
                        tf[c]
                        + bonds[d]["f1"][c]
                        + _roll_from_nbr(bonds[d]["f2"][c], strides[d])
                    )
            if col_ref is not None:
                # self-collision contact, inserted between bond forces and
                # gravity exactly like core.step (VXS_Voxel.cpp:516-528).
                # One robot at a time: each needs its own (Vp, Vp) pair field.
                bsz = pos[0].shape[0]
                col_shared = col_ref.shape[0] == 1
                compact = bool(flags.get("collision_compact"))
                fcol = [[], [], []]
                for r in range(bsz):
                    a1 = col_ref[0 if col_shared else r, :, :]
                    if compact:
                        fr_ = _pair_contact_forces_compact(
                            tuple(pos[c][r:r + 1, :] for c in range(3)),
                            scale[r:r + 1, :], a1, Vp, f32,
                        )
                    else:
                        fr_ = _pair_contact_forces(
                            tuple(pos[c][r:r + 1, :] for c in range(3)),
                            scale[r:r + 1, :], a1, f32,
                        )
                    for c in range(3):
                        fcol[c].append(fr_[c])
                for c in range(3):
                    tf[c] = tf[c] + jnp.concatenate(fcol[c], axis=0)

            if flags["gravity"]:
                tf[2] = tf[2] + mass * grav

            if bc_ref is not None:
                for c in range(3):
                    tf[c] = tf[c] + ext_f[c]

            if fluid_mesh:
                # ---- deformed-mesh facet drag (land_water
                # VX_Sim.cpp:1516-1600) as a corner-lattice stencil ----
                # Per-direction strains written THIS step by the bond pass
                # (StrainPos/NegDirsCur, land_water VXS_Voxel.cpp:474-475)
                s_pos = [bonds[a]["sv1"] for a in range(3)]
                s_neg = [_roll_from_nbr(bonds[a]["sv2"], strides[a])
                         for a in range(3)]
                halfL = 0.5 * L
                # 8 world-frame corner positions per voxel:
                # pos + R·(sign·L/2·(1+strain_dir)) (GetCurVLoc,
                # VX_MeshUtil.cpp:404-421); sign statically selects
                # the pos- or neg-direction strain
                corner_w = {}
                for s3 in [(sx, sy, sz) for sx in (-1, 1)
                           for sy in (-1, 1) for sz in (-1, 1)]:
                    off = tuple(
                        (halfL if s3[a] > 0 else -halfL)
                        * (1.0 + (s_pos[a] if s3[a] > 0 else s_neg[a]))
                        for a in range(3))
                    rw = _qrot_inv(_qconj(quat), off)  # forward rotation
                    corner_w[s3] = tuple(
                        p + r for p, r in zip(pos, rw))
                # vertex field on corner-points: lane p holds the vertex at
                # voxel p's min corner, the mean of the adjacent occupied
                # voxels' coincident corners (UpdateMeshPhysicsOnlyNoColors
                # weight-1.0 average, VX_MeshUtil.cpp:368-402)
                vert0 = [None, None, None]
                for e in _e_list:
                    st_e = _stride_of(e)
                    cw = corner_w[tuple(2 * ei - 1 for ei in e)]
                    w_e = occm_e[e]
                    for c in range(3):
                        contrib = (_roll_from_nbr(cw[c], st_e) if st_e
                                   else cw[c])
                        contrib = w_e * contrib
                        vert0[c] = (contrib if vert0[c] is None
                                    else vert0[c] + contrib)
                vert0 = [v * inv_wsum_mesh for v in vert0]
                # the 8 corner-point vertices of each voxel: VERT(v + c)
                vert_at = {}
                for cc in _e_list:
                    st_c = _stride_of(cc)
                    vert_at[cc] = tuple(
                        _roll_nbr(vert0[c], st_c) if st_c else vert0[c]
                        for c in range(3))
                # exposed faces -> 2 facets each, same corner winding as
                # envs/drag.py _FACES; the facet owner is this voxel, so
                # the force accumulates in place (no scatter)
                _mesh_faces = [
                    ((0, +1), ((1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1))),
                    ((0, -1), ((0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0))),
                    ((1, +1), ((0, 1, 0), (0, 1, 1), (1, 1, 1), (1, 1, 0))),
                    ((1, -1), ((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1))),
                    ((2, +1), ((0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))),
                    ((2, -1), ((0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0))),
                ]
                for (a, sgn), quad in _mesh_faces:
                    exp_m = exposed_mesh[(a, sgn)]
                    q0, q1, q2, q3 = (vert_at[c] for c in quad)
                    for ta, tb, tc_ in ((q0, q1, q2), (q0, q2, q3)):
                        e1 = tuple(b_ - a_ for a_, b_ in zip(ta, tb))
                        e2 = tuple(c_ - a_ for a_, c_ in zip(ta, tc_))
                        nx = e1[1] * e2[2] - e1[2] * e2[1]
                        ny = e1[2] * e2[0] - e1[0] * e2[2]
                        nz = e1[0] * e2[1] - e1[1] * e2[0]
                        nn = nx * nx + ny * ny + nz * nz
                        n_len = jnp.sqrt(jnp.maximum(nn, 1e-30))
                        inv_len = 1.0 / n_len
                        vn = (vel[0] * nx + vel[1] * ny + vel[2] * nz) \
                            * inv_len
                        # forward-facing facets only (v·n > 0, :1560);
                        # drag = −C·Area·|v_n|²·n̂, Area = |n|/2
                        coef = jnp.where(
                            exp_m & (vn > 0),
                            dragc * (0.5 * n_len) * vn * vn * inv_len, 0.0)
                        tf[0] = tf[0] - coef * nx
                        tf[1] = tf[1] - coef * ny
                        tf[2] = tf[2] - coef * nz
            elif flags.get("fluid"):
                # voxel-face quadratic drag on exposed forward-facing faces
                # (core.step._fluid_drag; reference: land_water
                # VX_Sim.cpp:1516-1600 voxel-level analog)
                area = scale * scale
                for dd in range(3):
                    m_pos = body_at(
                        _B_DIR + dd * _B_PER_DIR + _D_MASK) > 0.5
                    m_neg = _roll_from_nbr(
                        body_at(_B_DIR + dd * _B_PER_DIR + _D_MASK),
                        strides[dd]) > 0.5
                    v_d = vel[dd]
                    ca = dragc * area
                    mag_p = jnp.where(
                        occ & ~m_pos & (v_d > 0), ca * v_d * v_d, 0.0)
                    mag_n = jnp.where(
                        occ & ~m_neg & (v_d < 0), ca * v_d * v_d, 0.0)
                    tf[dd] = tf[dd] - mag_p + mag_n

            lin = list(lin)
            vel = list(vel)
            if flags["floor"]:
                # floor contact + Coulomb friction (VXS_Voxel.cpp:677-758)
                pen = 0.5 * scale - pos[2]
                pen = jnp.where(pen > 0, pen, 0.0)
                contact = pen > 0
                normal_force = lin_stiffness * pen
                fz = normal_force - sc["col_damping_z"] * two_sq_mexs * vel[2]
                fz = jnp.where(contact, fz, 0.0)

                static_flag = jnp.zeros_like(contact)
                if flags["sticky"]:
                    stick = contact
                    lin[0] = jnp.where(stick, 0.0, lin[0])
                    lin[1] = jnp.where(stick, 0.0, lin[1])
                    vel[0] = jnp.where(stick, 0.0, vel[0])
                    vel[1] = jnp.where(stick, 0.0, vel[1])
                    static_flag = static_flag | stick

                vx, vy = vel[0], vel[1]
                stopped = (vx == 0.0) & (vy == 0.0)
                surface_vel = _safe_norm2(vx, vy)
                surface_force = _safe_norm2(tf[0], tf[1])
                dyn_fric = u_dynamic * normal_force
                static_flag = static_flag | (
                    contact & stopped & (surface_force < u_static * normal_force)
                )
                moving = contact & ~stopped
                keeps_moving = dyn_fric * dt < mass * surface_vel
                inv_sv = _safe_div(jnp.ones_like(surface_vel), surface_vel)
                fric_x = -vx * inv_sv * dyn_fric
                fric_y = -vy * inv_sv * dyn_fric
                fx = jnp.where(moving & keeps_moving, fric_x, 0.0)
                fy = jnp.where(moving & keeps_moving, fric_y, 0.0)
                stopping = moving & ~keeps_moving
                static_flag = static_flag | stopping
                lin[0] = jnp.where(stopping, 0.0, lin[0])
                lin[1] = jnp.where(stopping, 0.0, lin[1])

                tf[0] = jnp.where(static_flag, 0.0, tf[0] + fx)
                tf[1] = jnp.where(static_flag, 0.0, tf[1] + fy)
                tf[2] = tf[2] + fz

            tf = [jnp.where(occ, f, 0.0) for f in tf]

            # ---- linear integration (VXS_Voxel.cpp:181-197) ----
            lin = [l + f * dt for l, f in zip(lin, tf)]
            if flags.get("max_vel"):
                # per-step displacement clamp (VXS_Voxel.cpp:188-192;
                # core.step.py:882-886)
                disp = [l * (dt * mass_inv) for l in lin]
                dmag = _safe_norm3(*disp)
                max_disp = sc["max_vel_limit"] * L
                over = dmag > max_disp
                scale_back = jnp.where(
                    over, max_disp / jnp.where(dmag > 0, dmag, 1.0), 1.0
                )
                pos = tuple(p + d * scale_back for p, d in zip(pos, disp))
            else:
                pos = tuple(
                    p + l * (dt * mass_inv) for p, l in zip(pos, lin)
                )
            if bc_ref is not None:
                # pin fixed translational DOFs (VXS_Voxel.cpp:195-197)
                pos = tuple(
                    jnp.where(dof_fix[c], nom_pos_bc[c] + ext_d[c], p)
                    for c, p in enumerate(pos)
                )
                lin = [
                    jnp.where(dof_fix[c], 0.0, l)
                    for c, l in enumerate(lin)
                ]

            # ---- moments + angular integration (VXS_Voxel.cpp:653-675,
            # 202-215) ----
            tm = [jnp.zeros_like(pos[0]) for _ in range(3)]
            for d in range(3):
                for c in range(3):
                    tm[c] = (
                        tm[c]
                        - bonds[d]["m1"][c]
                        - _roll_from_nbr(bonds[d]["m2"][c], strides[d])
                    )
            tm = [jnp.where(occ, m, 0.0) for m in tm]
            if bc_ref is not None:
                tm = [
                    jnp.where(dof_fix[3 + c], 0.0, m)
                    for c, m in enumerate(tm)
                ]
            if vol:
                # fixed angular damping under volume effects (reference
                # VXS_Voxel.cpp:204; core.step.py:911-912)
                ang = tuple((a + m * dt) / 1.01 for a, m in zip(ang, tm))
            else:
                ang_fact = (
                    1.0
                    - 10.0 * sc["slow_damping_z"] * inertia_inv
                    * two_sq_iexsss * dt
                )
                ang = tuple((a + m * dt) * ang_fact for a, m in zip(ang, tm))

            av = tuple(a * inertia_inv for a in ang)
            spin = tuple(
                0.5 * s for s in _qmul((jnp.zeros_like(av[0]),) + av, quat)
            )
            quat = _qnorm_fast(tuple(q + s * dt for q, s in zip(quat, spin)))
            if bc_ref is not None:
                # all-rotation-fixed voxels hold the prescribed orientation
                # (VXS_Voxel.cpp:218-221)
                quat = tuple(
                    jnp.where(rot_fixed, qf, q)
                    for qf, q in zip(quat_fix, quat)
                )
                ang = tuple(
                    jnp.where(rot_fixed, 0.0, a) for a in ang
                )

            if flags.get("equilibrium"):
                # equilibrium mode: the KineticEDecreasing test reads the
                # ring BEFORE this step's KE is pushed, and the pushed value
                # is the POST-zeroing energy (reference: VX_Sim.cpp:1148-1155
                # + ZeroMotion clearing per-voxel KineticEnergy)
                decreasing = (
                    ke_hist[0] + ke_hist[1] + ke_hist[2]
                    < ke_hist[3] + ke_hist[4] + ke_hist[5]
                )
                lin = [jnp.where(decreasing, 0.0, l) for l in lin]
                ang = tuple(jnp.where(decreasing, 0.0, a) for a in ang)
                v2 = lin[0] * lin[0] + lin[1] * lin[1] + lin[2] * lin[2]
                w2 = ang[0] * ang[0] + ang[1] * ang[1] + ang[2] * ang[2]
                ke = 0.5 * jnp.sum(
                    mass_inv * v2 + inertia_inv * w2, axis=1, keepdims=True
                )
                ke_hist = (ke,) + ke_hist[:5]

            # ---- actuation + linear development (VXS_Voxel.cpp:224-341;
            # mid-life freeze and ballistic devo are outside the fused
            # envelope, so their terms are identically zero here) ----
            if flags.get("fluid"):
                # the land_water fork's simpler actuation: no devo/amp-damp,
                # hard MIN_TEMP_FACTOR=0.1 floor (core.step.py:585-607;
                # reference: land_water VXS_Voxel.cpp:210-236)
                if flags["temp_enabled"]:
                    ctrl_f = tamp * jnp.sin(
                        2.0 * REF_PI_FLOAT
                        * (_safe_div(t, tper) + phase)
                    ) * cte
                    temp_fact = 1.0 + jnp.where(
                        (t >= init_cm) & (tper != 0), ctrl_f, 0.0
                    )
                else:
                    temp_fact = jnp.ones_like(scale)
                temp_fact = jnp.maximum(temp_fact, 0.1)
                scale_fluid = jnp.where(occ, temp_fact * L, L)
            else:
                scale_fluid = None
            if flags["use_init_size"]:
                cpre = jnp.where(
                    t >= 0.5 * init_cm, 1.0, _safe_div(2.0 * t, init_cm)
                )
                prenatal = cpre * (_safe_div(init_size_s, L) - 1.0)
            else:
                prenatal = None
            dev_temp_fact = dev_phase = dev_ampdamp = None
            if flags["use_growth_t"] or flags["use_final_size"]:
                growing = (t >= start_gt_s) & (growth_t_s > 0)
                # mid-life development freeze pauses the effective clock
                # (FrozenTimeAdj, core.step.py:641-656); freeze=0 reduces to
                # the plain ramp
                freeze = sc.get("freeze", 0.0)
                middle = sc.get("freeze_middle", 0.0)
                frozen_adj = jnp.clip(t - (middle - 0.5 * freeze),
                                      0.0, freeze)
                eff_t = (
                    jnp.minimum(t, start_gt_s + growth_t_s + freeze)
                    - frozen_adj
                )
                kdev = jnp.where(
                    growing, _safe_div(eff_t - start_gt_s, growth_t_s), 0.0
                )
                if flags["use_final_size"]:
                    dev_temp_fact = kdev * (
                        _safe_div(final_size_s, init_size_s) - 1.0
                    )
                if flags["use_final_phase"]:
                    dev_phase = kdev * (final_phase - phase)
                if flags["use_final_ad"]:
                    dev_ampdamp = kdev * (final_ad - amp_damp)

            if flags["temp"]:
                ph = phase if dev_phase is None else phase + dev_phase
                ad = amp_damp if dev_ampdamp is None else amp_damp + dev_ampdamp
                t_over_period = _safe_div(t, tper)
                ctrl = (
                    ad
                    * (tamp * jnp.sin(2.0 * REF_PI_FLOAT * (t_over_period + ph)))
                    * cte
                )
                ctrl = jnp.where((t >= init_cm) & (tper != 0), ctrl, 0.0)
                if flags.get("freeze_on"):
                    # FreezeInitialized: actuation zeroed for the first
                    # InitCmTime of the freeze window (core.step.py:692-705)
                    freeze = sc["freeze"]
                    middle = sc["freeze_middle"]
                    fs = middle - 0.5 * freeze
                    freeze_uninit = (
                        (t > fs)
                        & (t < middle + 0.5 * freeze)
                        & (t < fs + init_cm)
                    )
                    ctrl = jnp.where(freeze_uninit, 0.0, ctrl)
            else:
                ctrl = jnp.zeros_like(scale)

            grow_fact = jnp.ones_like(scale)
            if prenatal is not None:
                grow_fact = grow_fact * (1.0 + prenatal)
            if dev_temp_fact is not None:
                grow_fact = grow_fact * (1.0 + dev_temp_fact)
            if flags["use_init_size"] or flags["use_final_size"]:
                # size-capped actuation (reference: VXS_Voxel.cpp:308-320)
                curr_size = grow_fact * L
                orig_sig = _safe_div(_safe_div(curr_size, L) - 1.0, gamp)
                pos_sig = (orig_sig + 1.0) * 0.5
                capped = jnp.minimum(pos_sig, 0.5)
                ctrl = ctrl * capped * 2.0

            last = scale
            curr = ctrl * L + grow_fact * L
            min_scale = min_tf * L
            max_scale = (1.0 + gamp) * L
            curr = jnp.where((curr < last) & (curr < min_scale), last, curr)
            curr = jnp.where((curr > last) & (curr > max_scale), last, curr)
            scale_new = jnp.where(occ, curr, L)
            if scale_fluid is not None:
                # fluid environments bypass the devo/clamp machinery above
                # (XLA dead-code-eliminates the unused trace)
                scale_new = scale_fluid
            if n_knots:
                # MPC channel applied after the clamps, as in core.step
                knot = jnp.minimum(
                    i_glob * n_knots // knot_steps, n_knots - 1)
                u = ctrl_vals[0] if n_knots == 1 else None
                if n_knots > 1:
                    u = jnp.zeros_like(scale)
                    for k in range(n_knots):
                        u = u + jnp.where(knot == k, 1.0, 0.0) * ctrl_vals[k]
                scale_new = scale_new + jnp.where(occ, u * L, 0.0)

            # ---- ballistic velocity-adjusted development rebasing
            # (reference: VXS_Voxel.cpp:342-381; core/step.py:723-769) ----
            dd_new = dd
            if flags.get("ballistic"):
                time_in_window = n_win * sc["tb"]
                ready = (wcnt >= 1.5) & (t >= init_cm + 2.0 * time_in_window)
                apply = ready & (t >= start_gt_s + sc["min_growth_t"])
                this_s, last_s = wlast, wprev
                ratio = _safe_div(
                    this_s, jnp.where(last_s != 0, last_s, 1.0))
                decreasing = ((last_s > 0) & (this_s < last_s)
                              & (ratio < 1.0 - sc["max_slow"]))
                adj = 1.0 - jnp.where(decreasing, sc["bal_slow"], 0.0)
                cur_size = grow_fact * L
                suggested = cur_size + (final_size_s - cur_size) * adj
                orig = body_at(_B_FINAL_SIZE)  # original final size
                up = orig > cur_size
                sugg_up = jnp.minimum(suggested, orig)
                fin_up = jnp.where(sugg_up >= cur_size, sugg_up, cur_size)
                sugg_dn = jnp.maximum(suggested, orig)
                fin_dn = jnp.where(sugg_dn <= cur_size, sugg_dn, cur_size)
                reb_final = jnp.where(up, fin_up, fin_dn)
                reb_growth = jnp.maximum(growth_t_s - (t - start_gt_s), 0.0)
                t_vox = jnp.broadcast_to(t, init_size_s.shape)
                dd_new = (
                    jnp.where(apply, cur_size, init_size_s),
                    jnp.where(apply, reb_final, final_size_s),
                    jnp.where(apply, reb_growth, growth_t_s),
                    jnp.where(apply, t_vox, start_gt_s),
                )

            # ---- trace sampling + windowed distances (reference:
            # VX_Sim.cpp:1600-1606 UpdateStats / core/rollout.py:384-423;
            # NormDistByVol accumulates per trace interval,
            # VX_SimGA.cpp:58-117, computed online instead of from a stored
            # trace). Uses the RAW integrated state and t + dt exactly like
            # the jnp step (its trace block runs before the stop freeze). --
            feat_new = feat
            ringy_new, ringv_new = ringy, ringv
            if feat_on:
                t_new = t + dt
                trace_feats = (flags.get("ndbv") or flags.get("window")
                               or flags.get("ballistic"))
                if trace_feats:
                    cmy_new = jnp.sum(
                        pos[1] * mass, axis=1, keepdims=True) * inv_mass_tot
                    srel = scale_new * (1.0 / L)
                    vol_new = jnp.sum(
                        jnp.where(occ, srel * srel * srel, 0.0),
                        axis=1, keepdims=True)
                    tb_s = sc["tb"]
                    trace_due = (t_new > init_cm) & (
                        (ntr < 0.5) | (lasttr + tb_s <= t_new))

                    def _vol_norm(dy, v1, v2):
                        avg = 0.5 * (v1 + v2)
                        safe = jnp.where(avg > 0, avg, 1.0)
                        if float(sc["nexp"]) == 1.0:
                            return dy / safe
                        return dy / safe ** sc["nexp"]

                    if flags.get("ndbv"):
                        addt = trace_due & (ntr > 0.5)
                        term = _vol_norm((cmy_new - pcmy) * (1.0 / L),
                                         vol_new, pvol)
                        nd = nd + jnp.where(addt, term, 0.0)
                        # afterlife-regime intervals: both samples past
                        # the LIFETIME end (core/rollout.py:573 uses
                        # sim.stop_condition_value, not the total stop)
                        scv = sc["sc_value"]
                        reg = (t_new > scv) & (lasttr > scv)
                        ndrg = ndrg + jnp.where(addt & reg, term, 0.0)
                        if flags.get("freeze_on"):
                            # frozen-window mask (core/rollout.py:575-580 —
                            # the fe term's missing init_cm offset is the
                            # reference's own asymmetry, kept verbatim)
                            fr_len = sc["freeze"]
                            mid = sc["freeze_middle"]
                            fs_w = mid - 0.5 * fr_len + init_cm
                            fe_w = mid + 0.5 * fr_len
                            in_w = lambda tt: (tt > fs_w) & (tt < fe_w)  # noqa: E731,E501
                            ndfz = ndfz + jnp.where(
                                addt & in_w(t_new) & in_w(lasttr), term, 0.0)
                    if n_win:
                        # exact ring replication of core/rollout's
                        # buf_y/buf_v push
                        shifted_y = ringy[1:] + (cmy_new,)
                        shifted_v = ringv[1:] + (vol_new,)
                        ringy_new = tuple(
                            jnp.where(trace_due, sh, old)
                            for sh, old in zip(shifted_y, ringy))
                        ringv_new = tuple(
                            jnp.where(trace_due, sh, old)
                            for sh, old in zip(shifted_v, ringv))
                    ntr = ntr + jnp.where(trace_due, 1.0, 0.0)
                    lasttr = jnp.where(trace_due, t_new, lasttr)
                    pcmy = jnp.where(trace_due, cmy_new, pcmy)
                    pvol = jnp.where(trace_due, vol_new, pvol)

                    if n_win:
                        win_due = (t_new > init_cm) & (
                            (lastwin < -0.5)
                            | (lastwin + n_win * tb_s <= t_new))
                        valid_n = jnp.minimum(ntr, float(n_win))
                        wd = jnp.zeros_like(t0)
                        for k in range(n_win - 1):
                            pair_ok = valid_n >= float(n_win - k)
                            dyk = (ringy_new[k + 1] - ringy_new[k]) * (1.0 / L)
                            tk = _vol_norm(dyk, ringv_new[k + 1], ringv_new[k])
                            wd = wd + jnp.where(pair_ok, tk, 0.0)
                        wprev = jnp.where(win_due, wlast, wprev)
                        wlast = jnp.where(win_due, wd, wlast)
                        wcnt = wcnt + jnp.where(win_due, 1.0, 0.0)
                        lastwin = jnp.where(win_due, t_new, lastwin)
                feat_new = (fell, pcmy, pvol, nd, ndrg, ndfz, ntr, lasttr,
                            wlast, wprev, wcnt, lastwin, ndl0, ndl1, ndl2,
                            ncap, eoly, eolcap)

            # ---- freeze (divergence latch / per-rollout stop time;
            # reference aborts: VX_Sim.cpp:1774-1777) ----
            fz = lambda old, new: jnp.where(frozen, old, new)  # noqa: E731
            fzt = lambda old, new: tuple(  # noqa: E731
                jnp.where(frozen, o, n) for o, n in zip(old, new)
            )
            carry_new = (
                fzt(carry[0], pos),
                fzt(carry[1], quat),
                fzt(carry[2], tuple(lin)),
                fzt(carry[3], ang),
                fz(carry[4], scale_new),
                tuple(
                    ((frozen & o) | (~frozen & bonds[d]["small"])).astype(f32)
                    for d, o in enumerate(small)
                ),
                tuple(fzt(carry[6][d], bonds[d]["lp2"]) for d in range(3)),
                tuple(fzt(carry[7][d], bonds[d]["la1"]) for d in range(3)),
                tuple(fzt(carry[8][d], bonds[d]["la2"]) for d in range(3)),
                tuple(
                    jnp.where(frozen, o, bonds[d]["maxs"])
                    for d, o in enumerate(carry[9])
                ),
                fz(t, t + dt),
                (div | (~frozen & div_now)).astype(f32),
                ini,
                capt.astype(f32),
                fzt(carry[14], tsavg_new) if vol else (),
                fzt(carry[15], csavg_new) if vol else (),
                fzt(carry[16], ke_hist) if flags.get("equilibrium") else (),
                fzt(carry[17], (dt,)) if vol else (),
                (tuple(
                    jnp.where(frozen, o, bonds[d]["soff"])
                    for d, o in enumerate(carry[18])
                ) if plasticity else ()),
                src_min,
                src_sum,
                src_cnt,
                feat_new,
                ringy_new,
                ringv_new,
                # devo fields are state -> stop/divergence freeze applies
                fzt(carry[25], dd_new) if flags.get("ballistic") else (),
            )
            return carry_new

        carry0 = (pos0, quat0, lin0, ang0, scale0, small0, lp20, la10, la20,
                  maxs0, t0, div0, ini0, capt0, tsavg0, csavg0, ke0,
                  (dt0,) if vol_outer else (), soff0,
                  srcmin0, srcsum0, srccnt0, feat0, ringy0, ringv0, dd0)

        if bwd:
            # ---- reverse-mode segment: forward-recompute into VMEM
            # scratch, then per-step jax.vjp of the SAME step closure in
            # reverse, accumulating the control cotangent. The carry's
            # (b, Vp) leaves go to carr_scr, (b, 1) scalars (t, div, ini,
            # capt) to scal_scr lanes. Stats/seg inputs are constants of
            # the segment (no gradient flows through them w.r.t. u). ----
            leaves0, treedef = jax.tree_util.tree_flatten(carry0)
            vp_idx = [k for k, l in enumerate(leaves0)
                      if l.shape[-1] == Vp]
            sc_idx = [k for k, l in enumerate(leaves0)
                      if l.shape[-1] != Vp]
            b_rows = scale0.shape[0]

            def fwd_body(i, carry):
                leaves = jax.tree_util.tree_leaves(carry)
                for slot, k in enumerate(vp_idx):
                    carr_scr[i, slot] = leaves[k]
                for slot, k in enumerate(sc_idx):
                    scal_scr[i, slot] = jnp.broadcast_to(
                        leaves[k], (b_rows, 128))
                return step(i, carry, ctrl_knots)

            jax.lax.fori_loop(0, num_steps, fwd_body, carry0)

            def cotch(k):
                return cot_in[:, k, :]

            zsc = jnp.zeros_like(t0)
            cot_carry0 = (
                tuple(cotch(_POS + c) for c in range(3)),
                tuple(cotch(_QUAT + c) for c in range(4)),
                tuple(cotch(_LIN + c) for c in range(3)),
                tuple(cotch(_ANG + c) for c in range(3)),
                cotch(_SCALE),
                tuple(cotch(_SMALL + d) for d in range(3)),
                tuple(tuple(cotch(_LP2 + 3 * d + c) for c in range(3))
                      for d in range(3)),
                tuple(tuple(cotch(_LA1 + 3 * d + c) for c in range(3))
                      for d in range(3)),
                tuple(tuple(cotch(_LA2 + 3 * d + c) for c in range(3))
                      for d in range(3)),
                tuple(cotch(_MAXS + d) for d in range(3)),
                zsc, zsc, (zsc, zsc, zsc), zsc,
                (), (), (), (), (), (), (), (), (), (), (), (),
            )
            cot_u0 = tuple(jnp.zeros_like(scale0) for _ in range(n_knots))

            def bwd_body(j, cc):
                cot_carry, cot_u = cc
                i = num_steps - 1 - j
                leaves = list(leaves0)
                for slot, k in enumerate(vp_idx):
                    leaves[k] = carr_scr[i, slot]
                for slot, k in enumerate(sc_idx):
                    leaves[k] = scal_scr[i, slot][:, :1]
                carry_i = jax.tree_util.tree_unflatten(treedef, leaves)
                _, vjp_fn = jax.vjp(
                    lambda c, u: step(i, c, u), carry_i, ctrl_knots)
                d_carry, d_u = vjp_fn(cot_carry)
                cot_u = tuple(a + g for a, g in zip(cot_u, d_u))
                return d_carry, cot_u

            cot_carry, cot_u = jax.lax.fori_loop(
                0, num_steps, bwd_body, (cot_carry0, cot_u0))

            (cpos, cquat, clin, cang, cscale, csml, clp2, cla1, cla2,
             cmaxs) = cot_carry[:10]
            for c in range(3):
                cot_state_out[:, _POS + c, :] = cpos[c]
                cot_state_out[:, _LIN + c, :] = clin[c]
                cot_state_out[:, _ANG + c, :] = cang[c]
            for c in range(4):
                cot_state_out[:, _QUAT + c, :] = cquat[c]
            cot_state_out[:, _SCALE, :] = cscale
            for d in range(3):
                cot_state_out[:, _SMALL + d, :] = csml[d]
                cot_state_out[:, _MAXS + d, :] = cmaxs[d]
                for c in range(3):
                    cot_state_out[:, _LP2 + 3 * d + c, :] = clp2[d][c]
                    cot_state_out[:, _LA1 + 3 * d + c, :] = cla1[d][c]
                    cot_state_out[:, _LA2 + 3 * d + c, :] = cla2[d][c]
            czero = jnp.zeros_like(scale0)
            for k in range(_TSAVG, C_S):
                cot_state_out[:, k, :] = czero
            for k in range(n_knots):
                cot_ctrl_out[:, k, :] = cot_u[k]
            return

        carry = jax.lax.fori_loop(
            0, num_steps, lambda i, c: step(i, c, ctrl_knots), carry0)
        (pos, quat, lin, ang, scale, small_f, lp2, la1, la2, maxs,
         t, div_f, ini, capt_f, tsavg_f, csavg_f, ke_f, dt_f,
         soff_f, srcmin_f, srcsum_f, srccnt_f, feat_f, _ry_f, _rv_f,
         dd_f) = carry

        # ---- write back ----
        for c in range(3):
            state_out[:, _POS + c, :] = pos[c]
        for c in range(4):
            state_out[:, _QUAT + c, :] = quat[c]
        for c in range(3):
            state_out[:, _LIN + c, :] = lin[c]
        for c in range(3):
            state_out[:, _ANG + c, :] = ang[c]
        state_out[:, _SCALE, :] = scale
        for d in range(3):
            state_out[:, _SMALL + d, :] = small_f[d]
            state_out[:, _MAXS + d, :] = maxs[d]
            for c in range(3):
                state_out[:, _LP2 + 3 * d + c, :] = lp2[d][c]
                state_out[:, _LA1 + 3 * d + c, :] = la1[d][c]
                state_out[:, _LA2 + 3 * d + c, :] = la2[d][c]
        zero = jnp.zeros_like(scale)
        for c in range(3):
            state_out[:, _TSAVG + c, :] = tsavg_f[c] if vol else zero
            state_out[:, _CSAVG + c, :] = csavg_f[c] if vol else zero
            state_out[:, _SOFF + c, :] = (
                soff_f[c] if flags.get("plasticity") else zero
            )
        for k in range(4):
            state_out[:, _DEVO_DYN + k, :] = (
                dd_f[k] if flags.get("ballistic") else zero
            )
        for k in range(_DEVO_DYN + 4, C_S):
            state_out[:, k, :] = zero

        stats_out[0, :, :] = stats_in[0, :, :]
        stats_out[0, :, _S_TIME:_S_TIME + 1] = t
        stats_out[0, :, _S_DIV:_S_DIV + 1] = div_f
        for c in range(3):
            stats_out[0, :, _S_INICM + c:_S_INICM + c + 1] = ini[c]
        stats_out[0, :, _S_CAPT:_S_CAPT + 1] = capt_f
        if flags.get("equilibrium"):
            for k in range(6):
                stats_out[0, :, _S_KE + k:_S_KE + k + 1] = ke_f[k]
        if vol_outer:
            stats_out[0, :, _S_DT:_S_DT + 1] = dt_f[0]
        if n_src:
            for k in range(n_src):
                stats_out[0, :, _S_SRC + k:_S_SRC + k + 1] = srcmin_f[k]
                stats_out[0, :, _S_SRC + 3 + k:_S_SRC + 3 + k + 1] = srcsum_f[k]
            stats_out[0, :, _S_SRC + 6:_S_SRC + 7] = srccnt_f
        if feat_on:
            for off, val in zip(
                (_S_FELL, _S_PCMY, _S_PVOL, _S_ND, _S_NDRG, _S_NDFZ,
                 _S_NTR, _S_LASTTR, _S_WLAST, _S_WPREV, _S_WCNT,
                 _S_LASTWIN, _S_NEEDLE, _S_NEEDLE + 1, _S_NEEDLE + 2,
                 _S_NCAP, _S_EOLY, _S_EOLCAP),
                feat_f,
            ):
                stats_out[0, :, off:off + 1] = val

    return kernel


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def _flat(a, Vp):
    """(..., X, Y, Z) -> (..., Vp) x-major flatten + lane pad."""
    lead = a.shape[:-3]
    V = a.shape[-3] * a.shape[-2] * a.shape[-1]
    a = a.reshape(lead + (V,))
    if Vp > V:
        pad = [(0, 0)] * len(lead) + [(0, Vp - V)]
        a = jnp.pad(a, pad)
    return a


def pack_state(state: SimState, Vp: int, dtype=jnp.float32):
    """Batched SimState (B, X, Y, Z, ...) -> (B, C_S, Vp)."""
    B = state.scale.shape[0]
    f = lambda a: _flat(a, Vp).astype(dtype)  # noqa: E731
    chans = [None] * C_S
    for c in range(3):
        chans[_POS + c] = f(state.pos[..., c])
        chans[_LIN + c] = f(state.linmom[..., c])
        chans[_ANG + c] = f(state.angmom[..., c])
    for c in range(4):
        chans[_QUAT + c] = f(state.quat[..., c])
    chans[_SCALE] = f(state.scale)
    for d in range(3):
        chans[_SMALL + d] = f(state.small_angle[:, d].astype(dtype))
        chans[_MAXS + d] = f(state.max_strain[:, d])
        for c in range(3):
            chans[_LP2 + 3 * d + c] = f(state.last_pos2[:, d, ..., c])
            chans[_LA1 + 3 * d + c] = f(state.last_angle1[:, d, ..., c])
            chans[_LA2 + 3 * d + c] = f(state.last_angle2[:, d, ..., c])
    if state.ts_sum is not None:
        for d in range(3):
            chans[_TSAVG + d] = f(
                0.5 * (state.ts_sum[:, 0, d] + state.ts_sum[:, 1, d])
            )
            chans[_CSAVG + d] = f(
                0.5 * (state.cs_area[:, 0, d] + state.cs_area[:, 1, d])
            )
    if state.strain_offset is not None:
        for d in range(3):
            chans[_SOFF + d] = f(state.strain_offset[:, d])
    if state.devo is not None:
        chans[_DEVO_DYN + 0] = f(state.devo.initial_voxel_size)
        chans[_DEVO_DYN + 1] = f(state.devo.final_voxel_size)
        chans[_DEVO_DYN + 2] = f(state.devo.growth_time)
        chans[_DEVO_DYN + 3] = f(state.devo.start_growth_time)
    zero = jnp.zeros((B, Vp), dtype)
    chans = [zero if c is None else c for c in chans]
    return jnp.stack(chans, axis=1)


def unpack_state(packed, template: SimState, grid_shape) -> SimState:
    """(B, C_S, Vp) -> batched SimState with `template`'s aux fields."""
    X, Y, Z = grid_shape
    V = X * Y * Z
    B = packed.shape[0]
    dtype = template.pos.dtype

    def g(k):
        return packed[:, k, :V].reshape(B, X, Y, Z).astype(dtype)

    pos = jnp.stack([g(_POS + c) for c in range(3)], axis=-1)
    quat = jnp.stack([g(_QUAT + c) for c in range(4)], axis=-1)
    lin = jnp.stack([g(_LIN + c) for c in range(3)], axis=-1)
    ang = jnp.stack([g(_ANG + c) for c in range(3)], axis=-1)
    scale = g(_SCALE)
    small = jnp.stack([g(_SMALL + d) > 0.5 for d in range(3)], axis=1)
    maxs = jnp.stack([g(_MAXS + d) for d in range(3)], axis=1)
    lp2 = jnp.stack(
        [jnp.stack([g(_LP2 + 3 * d + c) for c in range(3)], axis=-1)
         for d in range(3)], axis=1)
    la1 = jnp.stack(
        [jnp.stack([g(_LA1 + 3 * d + c) for c in range(3)], axis=-1)
         for d in range(3)], axis=1)
    la2 = jnp.stack(
        [jnp.stack([g(_LA2 + 3 * d + c) for c in range(3)], axis=-1)
         for d in range(3)], axis=1)
    extra = {}
    if template.strain_offset is not None:
        extra["strain_offset"] = jnp.stack(
            [g(_SOFF + d) for d in range(3)], axis=1
        )
    if template.ts_sum is not None:
        # both sides get the average — behavior-identical: the step only
        # consumes the side averages (core/step.py:281,377)
        ts = jnp.stack([jnp.stack([g(_TSAVG + d) for d in range(3)], axis=1)] * 2,
                       axis=1)
        cs = jnp.stack([jnp.stack([g(_CSAVG + d) for d in range(3)], axis=1)] * 2,
                       axis=1)
        # update, not assign: plasticity's strain_offset must survive when
        # volume effects are also enabled
        extra.update(ts_sum=ts, cs_area=cs)
    if template.devo is not None:
        extra["devo"] = template.devo.replace(
            initial_voxel_size=g(_DEVO_DYN + 0),
            final_voxel_size=g(_DEVO_DYN + 1),
            growth_time=g(_DEVO_DYN + 2),
            start_growth_time=g(_DEVO_DYN + 3),
        )
    return template.replace(
        pos=pos, quat=quat, linmom=lin, angmom=ang, scale=scale,
        last_scale=scale, small_angle=small, max_strain=maxs,
        last_pos2=lp2, last_angle1=la1, last_angle2=la2,
        **extra,
    )


def pack_body(body: VoxelBody, Vp: int, dtype=jnp.float32):
    """VoxelBody (unbatched) -> (1, C_B, Vp); batched bodies get a leading
    batch dim via vmap of this function."""
    f = lambda a: _flat(a, Vp).astype(dtype)  # noqa: E731
    chans = [None] * C_B
    chans[_B_OCC] = f(body.occ.astype(dtype))
    chans[_B_MASS] = f(body.mass)
    chans[_B_MASS_INV] = f(body.mass_inv)
    chans[_B_INERTIA_INV] = f(body.inertia_inv)
    chans[_B_2SQ_MEXS] = f(body.two_sq_mexs)
    chans[_B_2SQ_IEXSSS] = f(body.two_sq_iexsss)
    chans[_B_LIN_STIFF] = f(body.lin_stiffness)
    chans[_B_US] = f(body.u_static)
    chans[_B_UD] = f(body.u_dynamic)
    chans[_B_CTE] = f(body.cte)
    chans[_B_PHASE] = f(body.phase_offset)
    chans[_B_AMPDAMP] = f(body.temp_amp_damp)
    per_dir = [
        ("bond_mask", _D_MASK), ("bond_homogeneous", _D_HOM),
        ("bond_e1", _D_E1), ("bond_e2", _D_E2), ("bond_e", _D_E),
        ("bond_a2", _D_A2), ("bond_b1", _D_B1), ("bond_b2", _D_B2),
        ("bond_b3", _D_B3),
        ("d_a1m1", _D_DA1M1), ("d_a1m2", _D_DA1M2),
        ("d_a2i1", _D_DA2I1), ("d_a2i2", _D_DA2I2),
        ("d_b1m1", _D_DB1M1), ("d_b1m2", _D_DB1M2),
        ("d_b2fm1", _D_DB2FM1), ("d_b2fm2", _D_DB2FM2),
        ("d_b3i1", _D_DB3I1), ("d_b3i2", _D_DB3I2),
    ]
    for d in range(3):
        base = _B_DIR + d * _B_PER_DIR
        for name, off in per_dir:
            a = getattr(body, name)[d]
            chans[base + off] = f(a.astype(dtype))
    chans[_B_INIT_SIZE] = f(body.initial_voxel_size)
    chans[_B_FINAL_SIZE] = f(body.final_voxel_size)
    chans[_B_GROWTH_T] = f(body.growth_time)
    chans[_B_START_GT] = f(body.start_growth_time)
    chans[_B_FINAL_PHASE] = f(body.final_phase_offset)
    chans[_B_FINAL_AD] = f(body.final_temp_amp_damp)
    chans[_B_EMOD] = f(body.e_mod)
    chans[_B_POISSON] = f(body.poisson)
    if body.mat_temp_phase is not None:
        chans[_B_MTPHASE] = f(body.mat_temp_phase)
    if body.mat_model_vox is not None:
        chans[_B_MATMODEL] = f(body.mat_model_vox.astype(dtype))
    if body.plastic_mod is not None:
        chans[_B_PLASTIC] = f(body.plastic_mod)
    if body.yield_stress is not None:
        chans[_B_YIELD] = f(body.yield_stress)
    chans[_B_MAT] = f(body.mat.astype(dtype))
    zero = jnp.zeros((Vp,), dtype)
    chans = [zero if c is None else c for c in chans]
    return jnp.stack(chans, axis=0)[None]


def pack_collision(colsys, Vp: int, grid_shape, dtype=jnp.float32):
    """CollisionSystem (S-surface tables) -> dense (Vp, Vp) pair-stiffness
    field in the kernel's x-major lane order. Zeros encode everything the
    sparse form expresses with masks: non-surface voxels, pad entries, the
    lattice-nearby exclusion (reference candidate-list semantics,
    VX_Sim.cpp:2357-2414) and self-pairs."""
    X, Y, Z = grid_shape
    # numpy throughout: this runs EAGERLY per individual per generation on
    # the evaluator host path, and eager jnp ops on a tunneled TPU backend
    # each cost an RPC round trip (measured ~4 s/individual; numpy is ~ms)
    sidx = np.asarray(colsys.surf_idx)
    smask = np.asarray(colsys.surf_mask).astype(bool)
    flat = sidx[:, 0] * (Y * Z) + sidx[:, 1] * Z + sidx[:, 2]  # (S,)
    dense = np.zeros((Vp, Vp), np.float32)
    # live rows only: surface flat indices are unique, so a block
    # assignment is exact — and ~100x faster than np.add.at (136 ms/ind
    # at 10^3 measured; at pop 1024 that was ~2 min/generation). Pad
    # entries (flat index 0, zero pair values) simply never land.
    live = np.nonzero(smask)[0]
    fl = flat[live]
    dense[np.ix_(fl, fl)] = np.asarray(colsys.pair_a1)[
        np.ix_(live, live)].astype(np.float32)
    # host array out: batch callers np.stack B of these and pay ONE
    # host->device transfer at the jitted launch instead of B eager ones
    return dense


def pack_collision_compact(colsys, Vp: int, grid_shape, dtype=jnp.float32):
    """CollisionSystem -> (Vp + Sp, Sp) compact block for
    `_pair_contact_forces_compact`: a one-hot gather matrix over the Sp
    (=surface count padded to 128) surface lanes stacked on the compacted
    (Sp, Sp) pair-stiffness table."""
    X, Y, Z = grid_shape
    sidx = np.asarray(colsys.surf_idx)
    smask = np.asarray(colsys.surf_mask)
    flat = sidx[:, 0] * (Y * Z) + sidx[:, 1] * Z + sidx[:, 2]
    S0 = int(smask.sum())
    Sp = _cdiv(max(S0, 1), 128) * 128
    g = np.zeros((Vp, Sp), dtype=np.float32)
    live = np.nonzero(smask)[0]
    g[flat[live], np.arange(len(live))] = 1.0
    a1 = np.asarray(colsys.pair_a1)
    a1_s = np.zeros((Sp, Sp), dtype=np.float32)
    a1_s[:len(live), :len(live)] = np.where(
        smask[live][:, None] & smask[live][None, :],
        a1[np.ix_(live, live)], 0.0)
    return jnp.asarray(np.concatenate([g, a1_s], axis=0), dtype)


def pack_ss_tables(body, Vp: int, dtype=jnp.float32):
    """MDL_DATA per-voxel stress-strain tables -> (2P+3, Vp) channel block
    (xs_0..xs_{P-1}, ys_0..ys_{P-1}, fail_strain, last_stress, last_slope).
    Streamed as an optional kernel input only when a palette entry is
    MDL_DATA, so the common case pays nothing."""
    P = body.ss_strain_vox.shape[-1]
    f = lambda a: _flat(a, Vp).astype(dtype)  # noqa: E731
    chans = [f(body.ss_strain_vox[..., k]) for k in range(P)]
    chans += [f(body.ss_stress_vox[..., k]) for k in range(P)]
    chans += [f(body.ss_fail_strain_vox), f(body.ss_last_stress_vox),
              f(body.ss_last_slope_vox)]
    return jnp.stack(chans, axis=0)[None]


def pack_bc_tables(body, Vp: int, dtype=jnp.float32):
    """Boundary-condition region channels -> (15, Vp) optional block:
    6 DOF-fixed bits, external force xyz, prescribed displacement xyz,
    prescribed angular displacement xyz (reference regions:
    VX_FRegion.h DOF masks; applied in VXS_Voxel EulerStep)."""
    f = lambda a: _flat(a, Vp).astype(dtype)  # noqa: E731
    dof = jnp.asarray(body.dof_fixed)
    chans = [f(((dof >> k) & 1).astype(dtype)) for k in range(6)]
    chans += [f(body.external_force[..., c]) for c in range(3)]
    chans += [f(body.external_disp[..., c]) for c in range(3)]
    chans += [f(body.external_tdisp[..., c]) for c in range(3)]
    return jnp.stack(chans, axis=0)[None]


def make_stats(
    body: VoxelBody, batch: int, dt, sim: SimParams, env: EnvParams,
    stop_time=None, dtype=jnp.float32
):
    """Initial (B, C_STAT) stats array for fresh rollouts. The env scalars
    ride per-robot channels so heterogeneous envs batch in one kernel; any
    channel may be overwritten with per-robot values before the call."""
    total_mass = jnp.sum(body.mass)
    inv_m = jnp.where(total_mass > 0, 1.0 / total_mass, 0.0)
    stats = jnp.zeros((batch, C_STAT), dtype)
    stats = stats.at[:, _S_DT].set(jnp.asarray(dt, dtype))
    stats = stats.at[:, _S_INV_MASS].set(inv_m.astype(dtype))
    # -1 sentinels: "no trace sample / window boundary yet"
    stats = stats.at[:, _S_LASTTR].set(-1.0)
    stats = stats.at[:, _S_LASTWIN].set(-1.0)
    stats = stats.at[:, _S_STOP].set(
        jnp.asarray(np.inf if stop_time is None else stop_time, dtype)
    )
    # per-voxel TempAmplitude/TempPeriod are float32 in the reference
    # (VXS_Voxel.h:109-110) — quantize like core.step._scale_update
    q32 = lambda v: jnp.asarray(v, jnp.float32).astype(dtype)  # noqa: E731
    stats = stats.at[:, _S_TAMP].set(q32(env.temp_amplitude))
    stats = stats.at[:, _S_TPER].set(q32(env.temp_period))
    stats = stats.at[:, _S_INITCM].set(jnp.asarray(sim.init_cm_time, dtype))
    stats = stats.at[:, _S_GRAV].set(jnp.asarray(env.grav_acc, dtype))
    stats = stats.at[:, _S_MINTF].set(jnp.asarray(sim.min_temp_fact, dtype))
    stats = stats.at[:, _S_GAMP].set(jnp.asarray(env.growth_amplitude, dtype))
    stats = stats.at[:, _S_DRAGC].set(
        jnp.asarray(env.aggregate_drag_coefficient, dtype))
    # energy-history sentinels (reference ClearHistories, VX_Sim.h:421)
    stats = stats.at[:, _S_KE:_S_KE + 6].set(-1.0)
    # per-source min-distance sentinels (core/rollout.py src_min init)
    stats = stats.at[:, _S_SRC:_S_SRC + 3].set(-1.0)
    return stats


@struct.dataclass
class FastRolloutStats:
    """Per-rollout outputs of the fused kernel."""

    time: Any  # (B,)
    diverged: Any  # (B,) bool
    ini_cm: Any  # (B, 3)
    cm_captured: Any  # (B,) bool
    source_min_dist: Any = None  # (B, n_src) final min distances
    source_avg_min_dist: Any = None  # (B, n_src) history means
    # r4 fitness-feature channels (zeros unless the matching env feature
    # is enabled — see supports())
    fell_over: Any = None  # (B,) bool fall-over latch
    norm_dist_by_vol: Any = None  # (B,) whole-life Σ dy/L/vol^exp
    norm_regime_dist_by_vol: Any = None  # (B,) afterlife accumulator
    norm_frozen_dist_by_vol: Any = None  # (B,) frozen-window accumulator
    norm_window_dist: Any = None  # (B,) last completed window distance
    win_prev_dist: Any = None  # (B,) previous completed window
    win_count: Any = None  # (B,)
    ini_needle: Any = None  # (B, 3) initial needle position
    end_of_life_posterior_y: Any = None  # (B,) lattice units


def pack_state_single(state: SimState, Vp: int, dtype=jnp.float32):
    """Unbatched SimState -> (C_S, Vp). vmap-able (the batched evaluator
    packs per-individual states built in-trace)."""
    batched = jax.tree_util.tree_map(lambda x: x[None], state)
    return pack_state(batched, Vp, dtype)[0]


def packed_metrics(out_state, body_packed, out_stats, L, *, ndbv=False,
                   falling=False, needle=False, window=False, grid_z=0):
    """Locomotion fitness surface straight off packed kernel outputs
    (no unpack): NormFinalDist = |ΔCoM_xy|/L (reference: VX_SimGA.cpp:36),
    finalDistY, divergence; with the r4 feature kwargs it also reduces the
    NormDistByVol family (VX_SimGA.cpp:58-117), the fall-over zeroing +
    FallAdjPostY (VX_SimGA.cpp:115-126), needle push distance
    (VX_SimGA.cpp:45-55) and the last completed window distance."""
    mass = body_packed[:, _B_MASS, :]
    inv_m = out_stats[:, _S_INV_MASS:_S_INV_MASS + 1]
    cm = [
        jnp.sum(out_state[:, _POS + c, :] * mass, axis=1, keepdims=True)
        * inv_m
        for c in range(3)
    ]
    final_cm = jnp.concatenate(cm, axis=1)  # (B, 3)
    ini_cm = out_stats[:, _S_INICM:_S_INICM + 3]
    delta = final_cm[:, :2] - ini_cm[:, :2]
    dsq = jnp.sum(delta * delta, axis=-1)
    dist = jnp.where(dsq > 0, jnp.sqrt(jnp.where(dsq > 0, dsq, 1.0)), 0.0) / L
    diverged = out_stats[:, _S_DIV] > 0.5

    norm_final_dist = dist
    norm_regime_dist = jnp.zeros_like(dist)
    norm_frozen_dist = jnp.zeros_like(dist)
    if ndbv:
        norm_final_dist = out_stats[:, _S_ND]
        norm_regime_dist = out_stats[:, _S_NDRG]
        norm_frozen_dist = out_stats[:, _S_NDFZ]
    eoly = out_stats[:, _S_EOLY]
    fall_adj_post_y = eoly
    fell = out_stats[:, _S_FELL] > 0.5
    if falling:
        # fall-over zeroing + workspace-Z penalty (VX_SimGA.cpp:115-126)
        fall_adj_post_y = jnp.where(fell, eoly - grid_z, eoly)
        norm_final_dist = jnp.where(fell, 0.0, norm_final_dist)
        norm_regime_dist = jnp.where(fell, 0.0, norm_regime_dist)
        norm_frozen_dist = jnp.where(fell, 0.0, norm_frozen_dist)
    # headline fitness subtracts the frozen-window distance
    # (VX_SimGA.cpp:145; zero when ndbv off)
    norm_final_dist = norm_final_dist - norm_frozen_dist

    push_dist = jnp.zeros_like(dist)
    found_needle = jnp.zeros_like(dist)
    if needle:
        mat = body_packed[:, _B_MAT, :]
        is7 = jnp.where(jnp.abs(mat - 7.0) < 0.5, 1.0, 0.0)
        n7 = jnp.maximum(jnp.sum(is7, axis=1, keepdims=True), 1.0)
        np_f = [
            jnp.sum(is7 * out_state[:, _POS + c, :], axis=1, keepdims=True)
            / n7
            for c in range(2)
        ]
        ndelta = [p[:, 0] - out_stats[:, _S_NEEDLE + c]
                  for c, p in enumerate(np_f)]
        ndsq = ndelta[0] ** 2 + ndelta[1] ** 2
        push_dist = jnp.where(
            ndsq > 0, jnp.sqrt(jnp.where(ndsq > 0, ndsq, 1.0)), 0.0) / L
        found_needle = (ndsq > 0).astype(jnp.float32)

    return dict(
        norm_final_dist=jnp.where(diverged, 0.0, norm_final_dist),
        final_dist_y=delta[:, 1] / L,
        diverged=diverged,
        final_cm=final_cm,
        ini_cm=ini_cm,
        final_time=out_stats[:, _S_TIME],
        norm_regime_dist=norm_regime_dist,
        norm_frozen_dist=norm_frozen_dist,
        fall_adj_post_y=fall_adj_post_y,
        end_of_life_posterior_y=eoly,
        push_dist=push_dist,
        found_needle=found_needle,
        norm_window_dist=out_stats[:, _S_WLAST],
    )


def stats_to_outputs(stats) -> FastRolloutStats:
    return FastRolloutStats(
        time=stats[:, _S_TIME],
        diverged=stats[:, _S_DIV] > 0.5,
        ini_cm=stats[:, _S_INICM:_S_INICM + 3],
        cm_captured=stats[:, _S_CAPT] > 0.5,
        fell_over=stats[:, _S_FELL] > 0.5,
        norm_dist_by_vol=stats[:, _S_ND],
        norm_regime_dist_by_vol=stats[:, _S_NDRG],
        norm_frozen_dist_by_vol=stats[:, _S_NDFZ],
        norm_window_dist=stats[:, _S_WLAST],
        win_prev_dist=stats[:, _S_WPREV],
        win_count=stats[:, _S_WCNT],
        ini_needle=stats[:, _S_NEEDLE:_S_NEEDLE + 3],
        end_of_life_posterior_y=stats[:, _S_EOLY],
    )


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _source_statics(env: EnvParams):
    """Static per-source (base, amp, freq) 9-tuples for the kernel trace
    (env-source parameters are design-time constants)."""
    if env.sources is None:
        return ()
    s = env.sources
    bp = np.asarray(s.base_pos, dtype=np.float64)
    am = np.asarray(s.amp, dtype=np.float64)
    fq = np.asarray(s.freq, dtype=np.float64)
    en = np.asarray(s.enabled)
    out = []
    for k in range(bp.shape[0]):
        if not bool(en[k]):
            continue
        out.append(tuple(float(v) for v in (*bp[k], *am[k], *fq[k])))
    return tuple(out)


def kernel_scalars(L, sim: SimParams, env: EnvParams) -> dict:
    """The design-time float constants baked into the kernel trace. ONE
    definition shared by fused_rollout / FusedBatchRunner / the evaluator —
    a diverging copy here is exactly how wrong-physics cache bugs happen
    (r3 advisor finding)."""
    return dict(
        L=float(L),
        slow_damping_z=float(sim.slow_damping_z),
        bond_damping_z=float(sim.bond_damping_z),
        col_damping_z=float(sim.col_damping_z),
        dt_frac=float(sim.dt_frac),
        freeze=float(sim.mid_life_freeze_time),
        freeze_middle=0.5 * (float(sim.stop_condition_value)
                             - float(sim.init_cm_time)),
        max_vel_limit=float(sim.max_vox_vel_limit),
        sources=_source_statics(env),
        # lifetime end (SC_MAX_SIM_TIME value) — the afterlife-regime
        # boundary; the per-robot _S_STOP channel is the TOTAL rollout end
        # (lifetime + afterlife), a different time when afterlife > 0
        sc_value=float(sim.stop_condition_value),
        tb=float(env.time_between_traces),
        nexp=float(env.normalization_exponent),
        min_growth_t=float(env.min_growth_time),
        bal_slow=float(env.ballistic_slowdown_fact),
        max_slow=float(env.max_slowdown_permitted),
    )


def kernel_env_flags(sim: SimParams, env: EnvParams) -> dict:
    """The env/sim-derived static feature flags. Callers add the
    body/buffer-derived entries (use_*, nonlinear, mdl_data, bc, collision,
    ballistic)."""
    return dict(
        gravity=bool(env.gravity_enabled and not env.fluid_environment),
        floor=bool(env.floor_enabled and not env.fluid_environment),
        sticky=bool(env.sticky_floor),
        temp=bool(env.temp_enabled and env.vary_temp_enabled),
        temp_enabled=bool(env.temp_enabled),
        vary_temp=bool(env.vary_temp_enabled),
        volume=bool(sim.volume_effects_enabled),
        fluid=bool(env.fluid_environment),
        equilibrium=bool(sim.equilibrium_mode),
        freeze_on=float(sim.mid_life_freeze_time) > 0.0,
        max_vel=bool(sim.max_velocity_enabled),
        plasticity=bool(sim.plasticity_enabled),
        needle=bool(env.needle_in_haystack),
        falling=bool(env.falling_prohibited),
        ndbv=bool(env.norm_dist_by_vol),
        window=int(env.num_trace_steps_in_window) > 0,
        n_win=int(env.num_trace_steps_in_window),
    )


def _body_has_bcs(body: VoxelBody) -> bool:
    return bool(
        np.any(np.asarray(body.dof_fixed) != 0)
        or np.any(np.asarray(body.external_force) != 0.0)
        or np.any(np.asarray(body.external_disp) != 0.0)
        or np.any(np.asarray(body.external_tdisp) != 0.0)
    )


MAX_KERNEL_WINDOW = 12  # trace-sample ring slots carried per robot


def supports(body: VoxelBody, sim: SimParams, env: EnvParams) -> bool:
    """True when (body, sim, env) is inside the fused kernel's envelope.

    r4: needle-in-haystack, falling-prohibited, NormDistByVol and the
    trace-window features (incl. ballistic devo) run in-kernel — the
    NormDistByVol family accumulates per trace interval online and the
    window ring carries up to MAX_KERNEL_WINDOW samples."""
    V = int(np.prod(body.occ.shape))
    Vp = _cdiv(V, 128) * 128
    # self-collision runs in-kernel as a dense (batch_block, Vp, Vp) pair
    # field; collision_batch_block() narrows the block as Vp grows so the
    # working set stays inside VMEM — above 2304 lanes (13^3) even a
    # single-robot block overruns it (on-chip compile probes; see
    # collision_batch_block)
    collision_ok = body.collision is None or Vp <= 2304
    n_win = int(env.num_trace_steps_in_window)
    window_ok = n_win == 0 or (
        n_win <= MAX_KERNEL_WINDOW and env.time_between_traces > 0)
    ndbv_ok = (not env.norm_dist_by_vol) or env.time_between_traces > 0
    # deformed-mesh facet drag runs in-kernel as a corner-lattice stencil
    # (r5); it needs one empty shell layer at the +X/+Y/+Z faces so corner
    # points map onto voxel lanes (pad the structure by 1 — the production
    # evaluator does this automatically)
    mesh_ok = True
    if env.fluid_environment and body.mesh_drag is not None:
        occ_np = np.asarray(body.occ)
        mesh_ok = not (
            occ_np[-1].any() or occ_np[:, -1].any() or occ_np[:, :, -1].any()
        )
    return (
        collision_ok
        and mesh_ok
        and not env.floor_limited
        # up to 3 env sources track in-kernel (stats-channel budget)
        and (env.sources is None or env.sources.num_sources <= 3)
        and window_ok
        and ndbv_ok
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_steps", "grid_shape", "batch_block", "n_knots", "interpret",
        "scalars", "flags", "prec", "total_steps",
    ),
)
def _fused_call(
    state_packed,
    body_packed,
    stats,
    control_packed,
    collision_packed=None,
    ss_packed=None,
    bc_packed=None,
    seg_base=None,
    *,
    num_steps: int,
    grid_shape,
    batch_block: int,
    n_knots: int,
    interpret: bool,
    scalars,
    flags,
    prec: Precision,
    total_steps: int | None = None,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    X, Y, Z = grid_shape
    B, _, Vp = state_packed.shape
    b = batch_block
    assert B % b == 0
    shared_body = body_packed.shape[0] == 1

    kernel = _make_kernel(
        X, Y, Z, Vp, num_steps, dict(scalars), dict(flags), prec, n_knots,
        total_steps=total_steps,
    )

    grid = (B // b,)
    state_spec = pl.BlockSpec(
        (b, C_S, Vp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    body_spec = pl.BlockSpec(
        (1 if shared_body else b, C_B, Vp),
        (lambda i: (0, 0, 0)) if shared_body else (lambda i: (i, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    # stats as (B//b, b, C_STAT): block (1, b, C_STAT) keeps the last two
    # block dims equal to the array dims, satisfying Mosaic's tiling rule
    # for any batch_block (a (b, C_STAT) 2-D block needs b % 8 == 0)
    stats = stats.reshape(B // b, b, C_STAT)
    stats_spec = pl.BlockSpec(
        (1, b, C_STAT), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [state_spec, body_spec]
    inputs = [state_packed, body_packed]
    if dict(flags).get("collision"):
        shared_col = collision_packed.shape[0] == 1
        # trailing dims are (Vp, Vp) dense or (Vp+Sp, Sp) compact
        col_spec = pl.BlockSpec(
            (1 if shared_col else b,) + tuple(collision_packed.shape[1:]),
            (lambda i: (0, 0, 0)) if shared_col else (lambda i: (i, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        in_specs.append(col_spec)
        inputs.append(collision_packed)
    if dict(flags).get("mdl_data"):
        shared_ss = ss_packed.shape[0] == 1
        c_ss = ss_packed.shape[1]
        ss_spec = pl.BlockSpec(
            (1 if shared_ss else b, c_ss, Vp),
            (lambda i: (0, 0, 0)) if shared_ss else (lambda i: (i, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        in_specs.append(ss_spec)
        inputs.append(ss_packed)
    if dict(flags).get("bc"):
        shared_bc = bc_packed.shape[0] == 1
        bc_spec = pl.BlockSpec(
            (1 if shared_bc else b, 15, Vp),
            (lambda i: (0, 0, 0)) if shared_bc else (lambda i: (i, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        in_specs.append(bc_spec)
        inputs.append(bc_packed)
    in_specs.append(stats_spec)
    inputs.append(stats)
    if n_knots:
        ctrl_spec = pl.BlockSpec(
            (b, n_knots, Vp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs.append(ctrl_spec)
        inputs.append(control_packed)
    if dict(flags).get("segmented"):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(seg_base, jnp.int32).reshape(1))

    out_state, out_stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[state_spec, stats_spec],
        out_shape=[
            jax.ShapeDtypeStruct(state_packed.shape, state_packed.dtype),
            jax.ShapeDtypeStruct(stats.shape, stats.dtype),
        ],
        interpret=interpret,
        # the default 16MB scoped-vmem cap is shy of this kernel's working
        # set at batch_block=8 (state carry + bond intermediates); the dense
        # collision pair field needs more still — per-INDIVIDUAL pair
        # fields at Vp=1024 measure 104.8M scoped (the production 10^3
        # evolution config; 100M OOM'd at first real-chip compile), so the
        # collision cap sits just under v5e's 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(120 if dict(flags).get("collision") else 64)
            * 1024 * 1024
        ),
    )(*inputs)
    return out_state, out_stats.reshape(B, C_STAT)


def collision_batch_block(Vp: int, requested: int = 8) -> int:
    """Largest batch block that keeps the in-kernel self-collision working
    set inside VMEM. The (bb, Vp, Vp) f32 pair block is DOUBLE-buffered as
    a windowed input whenever the launch has more than one grid program
    (2x its size), and register-allocator spill slots grow superlinearly
    with Vp, so the rungs are set by on-chip compile probes at multi-
    program batches (v5e, 128 MB VMEM, 120 MB cap): (8,1024) is the
    measured production anchor at 104.8 MB scoped; (4,1536), (2,1792) and
    (1,2304) compile and run; (2,2048), (1,2560) and (2,2304)=159 MB fail
    — so 2304 lanes (a 13^3 body) is the fused self-collision ceiling."""
    if Vp <= 1024:
        bb = 8
    elif Vp <= 1536:
        bb = 4
    elif Vp <= 1792:
        bb = 2
    else:
        bb = 1
    return min(int(requested), bb)


def _diff_envelope_ok(flags, scalars) -> bool:
    """The reverse-mode segment kernel covers the MPC control envelope:
    no volume effects / equilibrium / plasticity / sources / fitness
    features / ballistic devo / collision / MDL_DATA / BC regions (their
    carries are excluded from the scratch layout)."""
    f = dict(flags)
    return not any(
        f.get(k) for k in (
            "volume", "equilibrium", "plasticity", "needle", "falling",
            "ndbv", "window", "ballistic", "collision", "mdl_data", "bc",
        )
    ) and len(dict(scalars).get("sources", ())) == 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_steps", "grid_shape", "batch_block", "n_knots", "interpret",
        "scalars", "flags", "prec", "total_steps",
    ),
)
def _fused_bwd_call(
    state_packed,
    body_packed,
    stats,
    control_packed,
    seg_base,
    cot_state,
    *,
    num_steps: int,
    grid_shape,
    batch_block: int,
    n_knots: int,
    interpret: bool,
    scalars,
    flags,
    prec: Precision,
    total_steps: int,
):
    """Reverse-mode segment launch: pull `cot_state` (cotangent of the
    segment-END packed state) back to (cot of segment-START state, cot of
    the control knots). Forward states are recomputed into VMEM scratch
    (the checkpoint is the segment start), so HBM traffic stays at the
    segment boundaries — the BPTT-memory answer of SURVEY §7 hard part 5."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    X, Y, Z = grid_shape
    B, _, Vp = state_packed.shape
    b = batch_block
    assert B % b == 0
    assert n_knots > 0
    fdict = dict(flags)
    assert fdict.get("segmented")
    kernel = _make_kernel(
        X, Y, Z, Vp, num_steps, dict(scalars), fdict, prec, n_knots,
        total_steps=total_steps, bwd=True,
    )
    # carry leaves inside the diff envelope: 47 (b, Vp) channels
    # (pos3 quat4 lin3 ang3 scale small3 lp2/la1/la2 9×3 maxs3) + 6 (b, 1)
    # scalars (t, div, ini3, capt)
    NCH, NSC = 47, 6

    grid = (B // b,)
    state_spec = pl.BlockSpec(
        (b, C_S, Vp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    shared_body = body_packed.shape[0] == 1
    body_spec = pl.BlockSpec(
        (1 if shared_body else b, C_B, Vp),
        (lambda i: (0, 0, 0)) if shared_body else (lambda i: (i, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    # same (1, b, C_STAT) stats block convention as the forward call
    stats = stats.reshape(B // b, b, C_STAT)
    stats_spec = pl.BlockSpec(
        (1, b, C_STAT), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    ctrl_spec = pl.BlockSpec(
        (b, n_knots, Vp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        state_spec, body_spec, stats_spec, ctrl_spec,
        pl.BlockSpec(memory_space=pltpu.SMEM), state_spec,
    ]
    inputs = [
        state_packed, body_packed, stats, control_packed,
        jnp.asarray(seg_base, jnp.int32).reshape(1), cot_state,
    ]
    cot_state_in, cot_ctrl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[state_spec, ctrl_spec],
        out_shape=[
            jax.ShapeDtypeStruct(state_packed.shape, state_packed.dtype),
            jax.ShapeDtypeStruct(control_packed.shape, state_packed.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_steps, NCH, b, Vp), state_packed.dtype),
            pltpu.VMEM((num_steps, NSC, b, 128), state_packed.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
    )(*inputs)
    return cot_state_in, cot_ctrl


# jitted packers: the pack/unpack stages are ~50 reshape/pad/stack ops on
# large arrays — eager dispatch would cost a visible fraction of the kernel
_pack_state_jit = jax.jit(pack_state, static_argnums=(1, 2))
_pack_body_jit = jax.jit(pack_body, static_argnums=(1, 2))
_unpack_state_jit = jax.jit(unpack_state, static_argnums=(2,))


def fused_rollout(
    state: SimState,
    body: VoxelBody,
    sim: SimParams,
    env: EnvParams,
    num_steps: int,
    dt,
    stop_time=None,
    control_sequence=None,
    batch_block: int = 8,
    interpret: bool = False,
    prec: Precision = DEFAULT_PRECISION,
    stats=None,
):
    """Advance a batched SimState by `num_steps` with the fused kernel.

    `state`: batched (leading dim B, padded to a multiple of `batch_block`
    by the caller). `body`: one shared design. `control_sequence`: optional
    (B, K, X, Y, Z) per-voxel scale modulation knots (the MPC channel of
    core.step.sim_step). Returns (new_state, FastRolloutStats).
    """
    if not supports(body, sim, env):
        raise ValueError(
            "configuration outside the fused kernel envelope; "
            "use core.rollout (see ops.fused_rollout.supports)"
        )
    if sim.volume_effects_enabled and state.ts_sum is None:
        raise ValueError(
            "volume effects enabled but the state has no coupling carry; "
            "create it with init_state(body, volume_effects=True)"
        )
    if sim.equilibrium_mode:
        # reference EnableEquilibriumMode damping overrides
        # (VX_Sim.cpp:1351-1372)
        sim = sim.replace(bond_damping_z=0.1, slow_damping_z=0.0,
                          max_velocity_enabled=False)
    X, Y, Z = body.occ.shape
    V = X * Y * Z
    Vp = _cdiv(V, 128) * 128
    B = state.scale.shape[0]
    if sim.self_collisions_enabled and body.collision is not None:
        # big collision bodies narrow the block so the (bb, Vp, Vp) pair
        # field stays inside VMEM rather than leaving the fused path
        batch_block = collision_batch_block(Vp, batch_block)
    if B % batch_block:
        raise ValueError(f"batch {B} not a multiple of batch_block {batch_block}")

    dtype = jnp.float32
    state_packed = _pack_state_jit(state, Vp, dtype)
    body_packed = _pack_body_jit(body, Vp, dtype)
    collision_packed = None
    collision_compact = False
    if sim.self_collisions_enabled and body.collision is not None:
        import os as _os

        S0 = int(np.asarray(body.collision.surf_mask).sum())
        Sp = _cdiv(max(S0, 1), 128) * 128
        # surface-compacted pair pass (one-hot MXU gather/scatter):
        # opt-in prototype — EVOSORO_TPU_COLL_COMPACT=1 (see
        # _pair_contact_forces_compact; COLLBENCH.json records the A/B)
        collision_compact = (
            _os.environ.get("EVOSORO_TPU_COLL_COMPACT") == "1" and Sp < Vp
        )
        if collision_compact:
            collision_packed = pack_collision_compact(
                body.collision, Vp, (X, Y, Z), dtype
            )[None]
        else:
            collision_packed = pack_collision(
                body.collision, Vp, (X, Y, Z), dtype
            )[None]  # shared across the batch
    ss_packed = None
    if body.ss_strain_vox is not None:
        ss_packed = pack_ss_tables(body, Vp, dtype)
    bc_packed = None
    if _body_has_bcs(body):
        bc_packed = pack_bc_tables(body, Vp, dtype)
    if stats is None:
        stats = make_stats(body, B, dt, sim, env, stop_time, dtype)

    n_knots = 0
    control_packed = None
    if control_sequence is not None:
        n_knots = control_sequence.shape[1]
        control_packed = _flat(
            control_sequence.astype(dtype), Vp
        )  # (B, K, Vp)

    scalars = kernel_scalars(body.nominal_size, sim, env)
    flags = dict(
        kernel_env_flags(sim, env),
        nonlinear=not bool(body.all_linear),
        mdl_data=ss_packed is not None,
        bc=bc_packed is not None,
        collision=collision_packed is not None,
        collision_compact=collision_compact,
        # deformed-mesh facet drag in-kernel (the production fluid model);
        # same dispatch rule as core.step:887-915
        fluid_mesh=bool(env.fluid_environment and body.mesh_drag is not None),
        use_init_size=bool(body.using_initial_voxel_size),
        use_final_size=bool(body.using_final_voxel_size),
        use_growth_t=bool(body.using_growth_time),
        use_final_phase=bool(body.using_final_phase_offset),
        use_final_ad=bool(body.using_final_temp_amp_damp),
        ballistic=bool(state.devo is not None
                       and int(env.num_trace_steps_in_window) > 0),
    )
    if sim.equilibrium_mode and state.ke_history is not None:
        stats = stats.at[:, _S_KE:_S_KE + 6].set(
            state.ke_history.astype(stats.dtype))

    out_state, out_stats = _fused_call(
        state_packed,
        body_packed,
        stats,
        control_packed,
        collision_packed,
        ss_packed,
        bc_packed,
        num_steps=num_steps,
        grid_shape=(X, Y, Z),
        batch_block=batch_block,
        n_knots=n_knots,
        interpret=interpret,
        scalars=tuple(sorted(scalars.items())),
        flags=tuple(sorted(flags.items())),
        prec=prec,
    )
    new_state = _unpack_state_jit(out_state, state, (X, Y, Z))
    outs = stats_to_outputs(out_stats)
    n_src = len(_source_statics(env))
    if n_src:
        mins = out_stats[:, _S_SRC:_S_SRC + n_src]
        sums = out_stats[:, _S_SRC + 3:_S_SRC + 3 + n_src]
        cnt = out_stats[:, _S_SRC + 6:_S_SRC + 7]
        outs = outs.replace(
            source_min_dist=mins,
            source_avg_min_dist=jnp.where(cnt > 0, sums / jnp.where(
                cnt > 0, cnt, 1.0), -1.0),
        )
    new_state = new_state.replace(
        time=outs.time.astype(state.time.dtype),
        diverged=outs.diverged,
    )
    if sim.equilibrium_mode:
        new_state = new_state.replace(
            ke_history=out_stats[:, _S_KE:_S_KE + 6].astype(
                state.ke_history.dtype)
        )
    if new_state.devo is not None:
        dvt = state.devo.win_last.dtype
        new_state = new_state.replace(devo=new_state.devo.replace(
            win_last=out_stats[:, _S_WLAST].astype(dvt),
            win_prev=out_stats[:, _S_WPREV].astype(dvt),
            win_count=out_stats[:, _S_WCNT].astype(jnp.int32),
        ))
    return new_state, outs


def locomotion_fitness(state: SimState, body: VoxelBody, outs: FastRolloutStats):
    """NormFinalDist from a fused rollout (reference: VX_SimGA.cpp:36)."""
    from evosoro_tpu.core.rollout import center_of_mass

    cm = jax.vmap(lambda s: center_of_mass(s, body))(state)
    delta = cm[:, :2] - outs.ini_cm[:, :2]
    dsq = jnp.sum(delta * delta, axis=-1)
    dist = jnp.where(dsq > 0, jnp.sqrt(jnp.where(dsq > 0, dsq, 1.0)), 0.0)
    dist = dist / body.nominal_size
    return jnp.where(outs.diverged, 0.0, dist)


class FusedBatchRunner:
    """Reusable packed-batch rollout launcher for solver loops (CEM/MPC).

    Packs the initial state/body/stats ONCE; each `run(controls)` is a single
    kernel launch over the candidate batch — the per-solve unit of the MPC
    throughput target (BASELINE.md solves/sec). Controls are (B, K, X, Y, Z)
    scale-modulation knots (core.step's MPC channel)."""

    def __init__(
        self,
        body: VoxelBody,
        sim: SimParams,
        env: EnvParams,
        batch: int,
        num_steps: int,
        num_knots: int,
        dt=None,
        state: SimState | None = None,
        stop_time=None,
        batch_block: int = 8,
        interpret: bool = False,
        prec: Precision = DEFAULT_PRECISION,
    ):
        from evosoro_tpu.core.materials import calc_max_dt
        from evosoro_tpu.core.rollout import init_state

        if not supports(body, sim, env):
            raise ValueError("configuration outside the fused kernel envelope")
        if sim.self_collisions_enabled and body.collision is not None:
            X_, Y_, Z_ = body.occ.shape
            batch_block = collision_batch_block(
                _cdiv(X_ * Y_ * Z_, 128) * 128, batch_block)
        if batch % batch_block:
            raise ValueError(f"batch {batch} % batch_block {batch_block} != 0")
        if sim.equilibrium_mode:
            # reference EnableEquilibriumMode damping overrides
            sim = sim.replace(bond_damping_z=0.1, slow_damping_z=0.0,
                              max_velocity_enabled=False)
        if dt is None:
            dt = calc_max_dt(body, sim.volume_effects_enabled) * sim.dt_frac
        if state is None:
            state = init_state(
                body, volume_effects=sim.volume_effects_enabled
            )
        X, Y, Z = body.occ.shape
        self.grid_shape = (X, Y, Z)
        self.Vp = _cdiv(X * Y * Z, 128) * 128
        self.L = body.nominal_size
        self.num_steps = num_steps
        self.num_knots = num_knots
        self.batch = batch
        batched = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state
        )
        self.state_packed = _pack_state_jit(batched, self.Vp, jnp.float32)
        self.body_packed = _pack_body_jit(body, self.Vp, jnp.float32)
        self.collision_packed = None
        if sim.self_collisions_enabled and body.collision is not None:
            self.collision_packed = pack_collision(
                body.collision, self.Vp, self.grid_shape, jnp.float32
            )[None]
        self.ss_packed = None
        if body.ss_strain_vox is not None:
            self.ss_packed = pack_ss_tables(body, self.Vp, jnp.float32)
        self.bc_packed = None
        if _body_has_bcs(body):
            self.bc_packed = pack_bc_tables(body, self.Vp, jnp.float32)
        self.stats = make_stats(body, batch, dt, sim, env, stop_time)
        self._call_kwargs = dict(
            num_steps=num_steps,
            grid_shape=self.grid_shape,
            batch_block=batch_block,
            n_knots=num_knots,
            interpret=interpret,
            scalars=tuple(sorted(
                kernel_scalars(body.nominal_size, sim, env).items())),
            flags=tuple(sorted(dict(
                kernel_env_flags(sim, env),
                nonlinear=not bool(body.all_linear),
                mdl_data=self.ss_packed is not None,
                bc=self.bc_packed is not None,
                collision=self.collision_packed is not None,
                fluid_mesh=bool(
                    env.fluid_environment and body.mesh_drag is not None),
                use_init_size=bool(body.using_initial_voxel_size),
                use_final_size=bool(body.using_final_voxel_size),
                use_growth_t=bool(body.using_growth_time),
                use_final_phase=bool(body.using_final_phase_offset),
                use_final_ad=bool(body.using_final_temp_amp_damp),
                ballistic=bool(state.devo is not None
                               and int(env.num_trace_steps_in_window) > 0),
            ).items())),
            prec=prec,
        )
        self._flat_jit = jax.jit(_flat, static_argnums=(1,))

    def run(self, controls):
        """controls: (B, K, X, Y, Z) -> dict of per-candidate metrics."""
        ctrl_packed = self._flat_jit(controls.astype(jnp.float32), self.Vp)
        out_state, out_stats = _fused_call(
            self.state_packed, self.body_packed, self.stats, ctrl_packed,
            self.collision_packed, self.ss_packed, self.bc_packed,
            **self._call_kwargs,
        )
        return packed_metrics(out_state, self.body_packed, out_stats, self.L)
