"""Smoothed isosurface extraction (reference capability:
Utils/MarchCube.cpp SingleMaterial — watertight smoothed surfaces of voxel
designs for viz/STL export)."""

import numpy as np
import pytest

from evosoro_tpu.viz.marching import (
    marching_tetrahedra,
    mesh_volume,
    occupancy_field,
    smooth_structure_mesh,
)


def _edge_counts(faces):
    from collections import Counter

    c = Counter()
    for tri in faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            c[tuple(sorted((tri[a], tri[b])))] += 1
    return c


def _assert_watertight(verts, faces):
    assert len(faces) > 0
    counts = _edge_counts(faces)
    bad = {e: n for e, n in counts.items() if n != 2}
    assert not bad, f"{len(bad)} non-manifold/boundary edges, e.g. " \
                    f"{list(bad.items())[:5]}"


def test_single_voxel_closed_surface():
    s = np.ones((1, 1, 1), dtype=np.int32)
    verts, faces = smooth_structure_mesh(s, lattice_dim=1.0)
    _assert_watertight(verts, faces)
    vol = mesh_volume(verts, faces)
    assert vol > 0  # outward orientation
    # iso=0.5 octahedron-ish solid around the center: volume below the
    # 1-voxel cube but positive and substantial
    assert 0.1 < vol < 1.0
    # registered to the engine frame: voxel (0,0,0)'s nominal center is
    # (0.5, 0.5, 0.5)·L (core/materials.py nom_pos)
    np.testing.assert_allclose(verts.mean(axis=0), [0.5, 0.5, 0.5],
                               atol=1e-9)


def test_block_volume_converges_to_voxel_volume():
    """For a solid block, upsampling the density field makes the smoothed
    surface's volume converge to the true voxel volume (the marching-cube
    smoothing error shrinks with resolution)."""
    nx, ny, nz = 4, 3, 2
    s = np.ones((nx, ny, nz), dtype=np.int32)
    true_vol = nx * ny * nz  # lattice_dim = 1

    errs = []
    for up in (1, 2, 4):
        occ = np.repeat(np.repeat(np.repeat(s, up, 0), up, 1), up, 2)
        field = np.pad((occ > 0).astype(float), 1)
        verts, faces = marching_tetrahedra(field, iso=0.5, spacing=1.0 / up)
        _assert_watertight(verts, faces)
        errs.append(abs(mesh_volume(verts, faces) - true_vol))
    assert errs[2] < errs[0]
    assert errs[2] < 0.15 * true_vol


def test_porous_shape_watertight_and_oriented():
    rng = np.random.default_rng(0)
    s = (rng.random((5, 5, 5)) < 0.6).astype(np.int32)
    s[2, 2, 2] = 1
    verts, faces = smooth_structure_mesh(s, lattice_dim=0.01)
    _assert_watertight(verts, faces)
    assert mesh_volume(verts, faces) > 0


def test_empty_structure():
    s = np.zeros((3, 3, 3), dtype=np.int32)
    verts, faces = smooth_structure_mesh(s)
    assert len(faces) == 0


def test_occupancy_field_pads():
    s = np.ones((2, 2, 2), dtype=np.int32)
    f = occupancy_field(s)
    assert f.shape == (4, 4, 4)
    assert f[0].max() == 0 and f[-1].max() == 0


def test_stl_roundtrip(tmp_path):
    from evosoro_tpu.io.mesh_io import read_stl, write_stl

    s = np.ones((2, 2, 1), dtype=np.int32)
    verts, faces = smooth_structure_mesh(s, lattice_dim=0.01)
    path = tmp_path / "smooth.stl"
    write_stl(str(path), verts, faces)
    v2, f2 = read_stl(str(path))
    assert len(f2) == len(faces)
    vol1 = mesh_volume(verts, faces)
    vol2 = mesh_volume(np.asarray(v2), np.asarray(f2))
    assert vol2 == pytest.approx(vol1, rel=1e-5)
