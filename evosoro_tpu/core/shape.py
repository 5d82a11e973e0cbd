"""Shape descriptors over the deformed voxel body.

Re-designs the reference's `VX_MeshUtil` fitness path (reference:
VX_MeshUtil.cpp:40-250 initializeDeformableMesh/UpdateMesh, :902-948
computeCurrentRobotVolume, :775-899 qhull convex-hull volume, :949-1093
computeShapeComplexity; consumed by `voxelyze --computeShapeDescriptors`,
voxelyzeMain/main.cpp:113-126). The mesh bookkeeping and hull math run in the
native C++ library (evosoro_tpu.native); this module maps device state to
mesh vertices.

The deformed surface mesh welds voxel corners: each corner-lattice vertex is
the average over its adjacent occupied voxels of (voxel position + rotated
corner offset scaled by the voxel's current size) — the reference's vertex
update loop, without its Laplacian smoothing pass (smoothing is cosmetic for
the GUI; volumes agree to O(ε) on voxel lattices).
"""

from __future__ import annotations

import numpy as np

from evosoro_tpu import native
from evosoro_tpu.core.types import SimState, VoxelBody


def _quat_rotate_np(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    qv = np.stack([x, y, z], axis=-1)
    t = 2.0 * np.cross(qv, v)
    return v + w[..., None] * t + np.cross(qv, t)


def deformed_mesh(state: SimState, body: VoxelBody):
    """(verts (V,3), tris (T,3)) of the deformed surface mesh.

    Host-side (numpy): shape descriptors are end-of-rollout reductions, not
    per-step work (the reference also computes them once, after the sim loop:
    main.cpp:113-126).
    """
    occ = np.asarray(body.occ)
    pos = np.asarray(state.pos, dtype=np.float64)
    quat = np.asarray(state.quat, dtype=np.float64)
    scale = np.asarray(state.scale, dtype=np.float64)
    X, Y, Z = occ.shape

    tris = native.surface_triangles(occ)

    # corner-lattice vertex positions: average over adjacent occupied voxels
    verts = np.zeros(((X + 1) * (Y + 1) * (Z + 1), 3))
    counts = np.zeros((X + 1) * (Y + 1) * (Z + 1))
    xs, ys, zs = np.nonzero(occ)
    vpos = pos[xs, ys, zs]
    vq = quat[xs, ys, zs]
    vs = scale[xs, ys, zs]
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                offset = (np.array([cx, cy, cz]) - 0.5)[None, :] * vs[:, None]
                corner_pos = vpos + _quat_rotate_np(vq, offset)
                idx = ((xs + cx) * (Y + 1) + (ys + cy)) * (Z + 1) + (zs + cz)
                np.add.at(verts, idx, corner_pos)
                np.add.at(counts, idx, 1.0)
    nz = counts > 0
    verts[nz] /= counts[nz, None]
    return verts, tris


def robot_volume(state: SimState, body: VoxelBody) -> float:
    """Deformed-body volume by the divergence theorem (feeds the
    NormDistByVol fitness exponent, reference: VX_SimGA.cpp:61-75)."""
    verts, tris = deformed_mesh(state, body)
    return native.mesh_volume(verts, tris)


def convex_hull_volume(state: SimState, body: VoxelBody) -> tuple[float, float]:
    """(volume, area) of the convex hull of the deformed surface vertices —
    the reference's qhull shape descriptor (VX_MeshUtil.cpp:775-899), computed
    in-process (no qhull subprocess, no temp files)."""
    verts, tris = deformed_mesh(state, body)
    used = np.unique(tris.ravel()) if tris.size else np.zeros(0, np.int64)
    return native.convex_hull_volume(verts[used])


def shape_complexity(state: SimState, body: VoxelBody) -> float:
    """Vertex angle-excess curvature statistic
    (reference: VX_MeshUtil.cpp:949-1093)."""
    verts, tris = deformed_mesh(state, body)
    return native.shape_complexity(verts, tris)


def shape_descriptors(state: SimState, body: VoxelBody) -> dict:
    """All descriptors in one mesh pass (the `--computeShapeDescriptors`
    output set: robot volume, hull volume/area, complexity, and their ratio)."""
    verts, tris = deformed_mesh(state, body)
    vol = native.mesh_volume(verts, tris)
    used = np.unique(tris.ravel()) if tris.size else np.zeros(0, np.int64)
    hull_vol, hull_area = native.convex_hull_volume(verts[used])
    return dict(
        robot_volume=vol,
        hull_volume=hull_vol,
        hull_area=hull_area,
        convexity=vol / hull_vol if hull_vol > 0 else 0.0,
        shape_complexity=native.shape_complexity(verts, tris),
        num_surface_triangles=int(tris.shape[0]),
    )
