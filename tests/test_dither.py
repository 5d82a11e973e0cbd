"""Compound-material (DITHER / INTERNAL) import resolution parity.

The reference resolves each voxel's structure id to its leaf SINGLE material
at sim import (VX_Sim.cpp:534 -> CVX_Object::GetLeafMatIndex,
VX_Object.cpp:722-872); dither picks between two sub-materials via the prsm
spatial hash (VX_Object.cpp:2603). These tests check our load-time resolution
(io/vxa.py resolve_leaf_material_ids) bit-for-bit against a harness linked
to the freshly compiled reference library.
"""

import sys
import subprocess
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from evosoro_tpu.io.vxa import _prsm, load_vxa, resolve_leaf_material_ids  # noqa: E402
from evosoro_tpu.core.types import Material  # noqa: E402
from tools.reference_engine import build_leafmat  # noqa: E402

BINARY = build_leafmat()

pytestmark = pytest.mark.skipif(
    BINARY is None, reason="reference toolchain unavailable"
)


def _vxc_xml(n, palette_xml, data_layers):
    layers = "\n".join(
        f"<Layer><![CDATA[{row}]]></Layer>" for row in data_layers
    )
    return f"""<?xml version="1.0" encoding="ISO-8859-1"?>
<VXC Version="0.94">
<Lattice><Lattice_Dim>0.001</Lattice_Dim></Lattice>
<Palette>
{palette_xml}
</Palette>
<Structure Compression="ASCII_READABLE">
<X_Voxels>{n}</X_Voxels><Y_Voxels>{n}</Y_Voxels><Z_Voxels>{n}</Z_Voxels>
<Data>
{layers}
</Data>
</Structure>
</VXC>
"""


_SINGLE = """<Material ID="{i}"><MatType>0</MatType><Name>m{i}</Name>
<Mechanical><MatModel>0</MatModel><Elastic_Mod>1e7</Elastic_Mod>
<Density>1e6</Density><Poissons_Ratio>0.35</Poissons_Ratio><CTE>0</CTE>
</Mechanical></Material>"""

_DITHER = """<Material ID="{i}"><MatType>3</MatType><Name>dither{i}</Name>
<RandIndex1>{a}</RandIndex1><RandIndex2>{b}</RandIndex2>
<PercIndex1>{p}</PercIndex1></Material>"""


def test_prsm_bit_exact():
    """Our Tausworthe-88 spatial hash matches the reference's prsm to the
    last double bit over a coordinate grid and several warmup counts."""
    n = 5
    for k in (0, 1, 3, 7):
        out = subprocess.run(
            [str(BINARY), "--prsm", str(n), str(k)],
            capture_output=True, text=True, check=True,
        )
        ref = np.array([float(v) for v in out.stdout.split()])
        ours = np.array([
            _prsm(x, y, z, k)
            for z in range(n) for y in range(n) for x in range(n)
        ])
        assert np.array_equal(ref, ours), f"prsm mismatch at k={k}"


def _leaf_ids_reference(vxc_path, shape):
    out = subprocess.run(
        [str(BINARY), str(vxc_path)], capture_output=True, text=True,
        check=True,
    )
    flat = np.array([int(v) for v in out.stdout.split()], dtype=np.int32)
    # reference scan order is x-fastest (GetXYZNom)
    return flat.reshape(shape, order="F")


def test_dither_golden(tmp_path):
    """A dithered palette resolves to the same per-voxel leaf materials as
    the reference engine."""
    n = 6
    # material 3 dithers between 1 and 2 at 40%
    palette = "\n".join([
        _SINGLE.format(i=1), _SINGLE.format(i=2),
        _DITHER.format(i=3, a=1, b=2, p=0.4),
    ])
    row = "3" * (n * n)
    vxc = tmp_path / "dither.vxc"
    vxc.write_text(_vxc_xml(n, palette, [row] * n))
    ref = _leaf_ids_reference(vxc, (n, n, n))

    structure = np.full((n, n, n), 3, dtype=np.int32)
    mats = [
        Material(id=1), Material(id=2),
        Material(id=3, mat_type=3, rand_index1=1, rand_index2=2,
                 perc_index1=0.4),
    ]
    ours = resolve_leaf_material_ids(structure, mats)
    assert np.array_equal(ref, ours)
    # sanity: the dither actually splits (both leaves appear)
    assert set(np.unique(ours)) == {1, 2}


def test_dither_via_load_vxa(tmp_path):
    """load_vxa resolves dithered ids at import (VX_Sim.cpp:534 semantics):
    the built body carries only leaf materials."""
    n = 4
    palette = "\n".join([
        _SINGLE.format(i=1), _SINGLE.format(i=2),
        _DITHER.format(i=3, a=1, b=2, p=0.5),
    ])
    row = "3" * (n * n)
    vxc_body = _vxc_xml(n, palette, [row] * n)
    # wrap in a minimal VXA for load_vxa
    inner = vxc_body.split("\n", 1)[1]  # drop the <?xml?> prolog
    vxa = tmp_path / "dither.vxa"
    vxa.write_text(
        "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>\n<VXA Version=\"1.0\">"
        "<Simulator></Simulator><Environment></Environment>"
        + inner + "</VXA>"
    )
    doc = load_vxa(vxa)
    assert set(np.unique(doc.structure)) <= {0, 1, 2}

    vxc = tmp_path / "dither.vxc"
    vxc.write_text(vxc_body)
    ref = _leaf_ids_reference(vxc, (n, n, n))
    assert np.array_equal(doc.structure, ref)


def test_internal_material_golden(tmp_path):
    """An INTERNAL material tiles its sub-structure (with offset) exactly
    like the reference."""
    n = 6
    sub = """<Material ID="3"><MatType>1</MatType><Name>tiled</Name>
<Structure Compression="ASCII_READABLE">
<X_Voxels>2</X_Voxels><Y_Voxels>2</Y_Voxels><Z_Voxels>1</Z_Voxels>
<Data><Layer><![CDATA[1221]]></Layer></Data>
</Structure>
<X_Offset>1</X_Offset><Y_Offset>0</Y_Offset><Z_Offset>0</Z_Offset>
<StructRotateAxis>0</StructRotateAxis>
<StructRotateAmount>0</StructRotateAmount></Material>"""
    palette = "\n".join([_SINGLE.format(i=1), _SINGLE.format(i=2), sub])
    row = "3" * (n * n)
    vxc = tmp_path / "internal.vxc"
    vxc.write_text(_vxc_xml(n, palette, [row] * n))
    ref = _leaf_ids_reference(vxc, (n, n, n))

    structure = np.full((n, n, n), 3, dtype=np.int32)
    sub_arr = np.array([[1, 2], [2, 1]]).T.reshape(2, 2, 1)  # x-fastest "1221"
    mats = [
        Material(id=1), Material(id=2),
        Material(id=3, mat_type=1, sub_structure=sub_arr,
                 sub_offset=(1, 0, 0)),
    ]
    ours = resolve_leaf_material_ids(structure, mats)
    assert np.array_equal(ref, ours)
    assert set(np.unique(ours)) == {1, 2}


def test_single_palette_passthrough():
    """All-SINGLE palettes resolve to themselves (the fast no-op path)."""
    structure = np.arange(8, dtype=np.int32).reshape(2, 2, 2) % 3
    mats = [Material(id=1), Material(id=2)]
    assert resolve_leaf_material_ids(structure, mats) is structure
