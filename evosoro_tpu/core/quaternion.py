"""Branchless quaternion math for the voxel lattice.

Quaternions are stored as `(..., 4)` arrays in (w, x, y, z) order. Every
function is elementwise over leading axes, so the same code runs per-bond over
the whole dense lattice under `vmap`/`jit`.

Semantics mirror the reference CQuat<T> (reference: Utils/Vec3D.h:150-330)
including its small-angle fast paths — but implemented as `jnp.where`
selections rather than branches, which is what the TPU VPU wants. The fast
paths are kept (not just for speed): they change numerics slightly and we want
trajectory parity with the reference engine.
"""

import jax.numpy as jnp

from evosoro_tpu.core.constants import DEFAULT_PRECISION, Precision


def _safe_sqrt(x, guard):
    """sqrt evaluated only where `guard`; 0 elsewhere, with the argument
    sanitized so reverse-mode AD never sees d(sqrt)/dx at x=0 (the 0·inf=NaN
    trap of jnp.where)."""
    return jnp.where(guard, jnp.sqrt(jnp.where(guard, x, 1.0)), 0.0)


def quat_identity(shape, dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(a, b):
    """Hamilton product a*b (reference: Vec3D.h operator* on CQuat)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rotate(q, v):
    """Rotate vector v by quaternion q (reference: Vec3D.h RotateVec3D)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    fx, fy, fz = v[..., 0], v[..., 1], v[..., 2]
    tw = fx * x + fy * y + fz * z
    tx = fx * w - fy * z + fz * y
    ty = fx * z + fy * w - fz * x
    tz = -fx * y + fy * x + fz * w
    return jnp.stack(
        [
            w * tx + x * tw + y * tz - z * ty,
            w * ty - x * tz + y * tw + z * tx,
            w * tz + x * ty - y * tx + z * tw,
        ],
        axis=-1,
    )


def quat_rotate_inv(q, v):
    """Rotate v by the inverse of q (reference: Vec3D.h RotateVec3DInv)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    fx, fy, fz = v[..., 0], v[..., 1], v[..., 2]
    tw = x * fx + y * fy + z * fz
    tx = w * fx - y * fz + z * fy
    ty = w * fy + x * fz - z * fx
    tz = w * fz - x * fy + y * fx
    return jnp.stack(
        [
            tw * x + tx * w + ty * z - tz * y,
            tw * y - tx * z + ty * w + tz * x,
            tw * z + tx * y - ty * x + tz * w,
        ],
        axis=-1,
    )


def quat_normalize_fast(q):
    """Normalize; snap to identity when w>=1 (reference: Vec3D.h:243-246)."""
    l2 = jnp.sum(q * q, axis=-1, keepdims=True)
    li = jnp.where(l2 > 0, 1.0 / jnp.sqrt(jnp.where(l2 > 0, l2, 1.0)), 1.0)
    qn = q * li
    w_ge_1 = qn[..., :1] >= 1.0
    ident = jnp.zeros_like(qn).at[..., 0].set(1.0)
    return jnp.where(w_ge_1, ident, qn)


def quat_from_rotation_vector(rv):
    """Angle-axis exp map (reference: Vec3D.h:203-207 FromRotationVector)."""
    angle2 = jnp.sum(rv * rv, axis=-1, keepdims=True)
    nz = angle2 > 0
    angle = _safe_sqrt(angle2, nz)
    axis = rv / jnp.where(nz, angle, 1.0)
    half = 0.5 * angle
    s = jnp.sin(half)
    w = jnp.cos(half)
    q = jnp.concatenate([w, axis * s], axis=-1)
    # zero rotation → identity, via the first-order exp map (w=1,
    # xyz=rv/2) rather than a constant: the value is identical but the
    # tangent d(xyz)/d(rv) = 1/2 survives, keeping linearizations at the
    # rest state (FEA, BPTT) correct
    q_small = jnp.concatenate(
        [jnp.ones_like(w), 0.5 * rv], axis=-1
    )
    return jnp.where(angle > 0, q, q_small)


def quat_to_rotation_vector(q, prec: Precision = DEFAULT_PRECISION):
    """Log map with the reference's acos≈sqrt fast path (Vec3D.h:270-283)."""
    w = q[..., 0]
    xyz = q[..., 1:]
    sq_len = 1.0 - w * w  # = x²+y²+z² for unit quats, per reference
    wc = jnp.minimum(w, 1.0)
    pos = sq_len > 0
    inv_sqrt = 1.0 / jnp.sqrt(jnp.where(pos, sq_len, 1.0))
    # fast path: acos(w) ~ sqrt(2-2w) for w near 1 — arguments sanitized so
    # the non-selected branch can't emit inf cotangents under reverse AD
    fast_sel = sq_len < prec.sl_thresh_acos2sqrt
    fast_arg = jnp.where(pos & fast_sel, jnp.maximum(2.0 - 2.0 * wc, 0.0), 1.0)
    scale_fast = 2.0 * jnp.sqrt(fast_arg) * inv_sqrt
    slow_arg = jnp.where(pos & ~fast_sel, jnp.clip(wc, -1.0, 1.0), 0.0)
    scale_slow = 2.0 * jnp.arccos(slow_arg) * inv_sqrt
    scale = jnp.where(fast_sel, scale_fast, scale_slow)
    # at sq_len <= 0 the reference returns exactly zero; for a normalized
    # quaternion that point has xyz == 0, so using the analytic limit
    # scale→2 keeps the VALUE identical while giving the correct tangent
    # 2·dxyz (a hard 0 here would zero d(rotation)/d(quat) at identity,
    # silently dropping the shear-rotation coupling from every
    # linearization/BPTT at the rest state — the FEA operator caught this)
    scale = jnp.where(pos, scale, 2.0)
    return xyz * scale[..., None]


def quat_from_angle_to_pos_x(v, prec: Precision = DEFAULT_PRECISION):
    """Quaternion rotating vector v onto +X (reference: Vec3D.h:208-238).

    Replicates the small-angle interception exactly: when |y/x|,|z/x| are both
    below SMALL_ANGLE_RAD the quaternion is built from the half-angle linear
    approximation with w = 1 - (y²+z²)/2.
    """
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    safe_vx = jnp.where(vx != 0, vx, 1.0)
    y_over_x = vy / safe_vx
    z_over_x = vz / safe_vx
    small = (
        (jnp.abs(y_over_x) < prec.small_angle_rad)
        & (jnp.abs(z_over_x) < prec.small_angle_rad)
        & (vx != 0)
    )

    # --- small-angle path ---
    qs_y = 0.5 * z_over_x
    qs_z = -0.5 * y_over_x
    qs_w = 1.0 + 0.5 * (-qs_y * qs_y - qs_z * qs_z)

    # --- general path (inputs sanitized where the small path is selected:
    # v exactly along +X gives nx=1 → arccos'(1)=inf would NaN the backward
    # pass even though the small path's value is the one selected) ---
    norm2 = vx * vx + vy * vy + vz * vz
    inv_norm = jnp.where(norm2 > 0, 1.0 / jnp.sqrt(jnp.where(norm2 > 0, norm2, 1.0)), 0.0)
    nx, ny, nz = vx * inv_norm, vy * inv_norm, vz * inv_norm
    nx_g = jnp.where(small, 0.0, jnp.clip(nx, -1.0, 1.0))
    theta = jnp.arccos(nx_g)
    yz2 = nz * nz + ny * ny
    axis_mag_inv = 1.0 / jnp.sqrt(jnp.where(yz2 > 0, yz2, 1.0))
    half = 0.5 * theta
    s = jnp.sin(half)
    qg_w = jnp.cos(half)
    qg_y = nz * axis_mag_inv * s
    qg_z = -ny * axis_mag_inv * s
    # ~180°: rotate about +Y (reference: Vec3D.h:225)
    anti = theta > (jnp.pi - prec.discard_angle_rad)
    qg_w = jnp.where(anti, 0.0, qg_w)
    qg_y = jnp.where(anti, 1.0, qg_y)
    qg_z = jnp.where(anti, 0.0, qg_z)

    w = jnp.where(small, qs_w, qg_w)
    y = jnp.where(small, qs_y, qg_y)
    z = jnp.where(small, qs_z, qg_z)
    x = jnp.zeros_like(w)

    # zero input → identity (reference returns unchanged; callers pass Clear()ed quat)
    zero_in = norm2 == 0
    w = jnp.where(zero_in, 1.0, w)
    y = jnp.where(zero_in, 0.0, y)
    z = jnp.where(zero_in, 0.0, z)
    return jnp.stack([w, x, y, z], axis=-1)


def quat_is_small_angle(q, prec: Precision = DEFAULT_PRECISION):
    return q[..., 0] > prec.small_angle_w


def quat_is_smallish_angle(q, prec: Precision = DEFAULT_PRECISION):
    return q[..., 0] > prec.smallish_angle_w
