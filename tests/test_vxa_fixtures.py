"""VXA interop against the reference's golden fixture files.

The reference's de-facto test suite is its fixture VXA inputs
(voxelyzeMain/Example_*.vxa and land_water sample_vxa/*.vxa, SURVEY.md §4.2);
a correct loader must ingest them unmodified, build a body, and run a short
stable rollout.
"""

import glob
import os

import numpy as np
import pytest

import jax

from evosoro_tpu.core.materials import calc_max_dt
from evosoro_tpu.core.rollout import rollout
from evosoro_tpu.io import load_vxa, write_vxa

REF = "/root/reference/evosoro"
EXAMPLES = sorted(glob.glob(os.path.join(REF, "_voxcad/voxelyzeMain/*.vxa")))
SAMPLES = sorted(glob.glob(os.path.join(REF, "_voxcad_land_water/sample_vxa/*.vxa")))

pytestmark = pytest.mark.skipif(
    not EXAMPLES, reason="reference fixtures unavailable"
)


@pytest.mark.parametrize("path", EXAMPLES + SAMPLES,
                         ids=lambda p: os.path.basename(p))
def test_load_reference_fixture(path):
    doc = load_vxa(path)
    assert doc.structure.ndim == 3
    assert doc.structure.max() >= 1, "no occupied voxels parsed"
    # Every id must be a valid palette index (0 = empty). A decode bug
    # (e.g. ignoring the ZLIB Compression attribute) produces out-of-range
    # garbage ids, which this catches (VERDICT r2 weak #1).
    assert doc.structure.min() >= 0
    max_id = max(m.id for m in doc.materials)
    assert doc.structure.max() <= max_id, (
        f"material ids up to {doc.structure.max()} exceed palette max id "
        f"{max_id}"
    )
    assert doc.lattice_dim > 0
    assert len(doc.materials) >= 1
    body = doc.build_body()
    assert int(np.asarray(body.occ).sum()) == int((doc.structure > 0).sum())


@pytest.mark.parametrize(
    "path",
    [os.path.join(REF, "_voxcad/voxelyzeMain/Example_withPhaseOffset.vxa"),
     os.path.join(REF, "_voxcad/voxelyzeMain/Example_stickyFloorBC.vxa"),
     os.path.join(REF, "_voxcad_land_water/sample_vxa/quadruped_land.vxa")],
    ids=["Example_withPhaseOffset", "Example_stickyFloorBC", "quadruped_land"],
)
def test_fixture_short_rollout_stable(path):
    doc = load_vxa(path)
    body = doc.build_body()
    dt = float(calc_max_dt(body)) * float(doc.sim.dt_frac)
    res = jax.jit(
        lambda: rollout(body, doc.sim, doc.env, num_steps=50, dt=dt)
    )()
    assert not bool(res.diverged)
    assert np.all(np.isfinite(np.asarray(res.final_cm)))


def test_layer_codec_variants(tmp_path):
    """Every Compression variant of VX_Object.cpp:1748-1830 decodes to the
    same structure; unknown values raise instead of mis-parsing."""
    import base64
    import zlib

    import evosoro_tpu.io.vxa as vxa_mod

    rng = np.random.default_rng(0)
    X, Y, Z = 3, 2, 2
    ids = rng.integers(0, 5, size=(X, Y, Z)).astype(np.int32)

    def layer_bytes(z):
        return ids[:, :, z].T.reshape(-1).astype(np.uint8).tobytes()

    def decode_all(compression, encoder):
        out = np.zeros((X, Y, Z), dtype=np.int32)
        for z in range(Z):
            vals = vxa_mod._decode_layer(encoder(layer_bytes(z)),
                                         compression, X * Y)
            out[:, :, z] = vals.reshape(Y, X).T
        return out

    cases = {
        "ASCII_READABLE": lambda b: bytes(v + 48 for v in b).decode(),
        "BASE64": lambda b: base64.b64encode(b).decode(),
        "": lambda b: base64.b64encode(b).decode(),
        "ZLIB": lambda b: base64.b64encode(zlib.compress(b)).decode(),
        "QT_ZLIB": lambda b: base64.b64encode(
            len(b).to_bytes(4, "big") + zlib.compress(b)).decode(),
        "RAW_DATA": lambda b: b.decode("latin-1"),
    }
    for comp, enc in cases.items():
        got = decode_all(comp, enc)
        assert np.array_equal(got, ids), comp

    with pytest.raises(ValueError):
        vxa_mod._decode_layer("0101", "GZIP_WHATEVER", 4)
    # wrong voxel count raises at the layer level
    from evosoro_tpu.core.types import evosoro_default_palette
    from evosoro_tpu.io import write_vxa

    p = tmp_path / "bad.vxa"
    write_vxa(str(p), ids, evosoro_default_palette())
    txt = p.read_text().replace("<X_Voxels>3</X_Voxels>",
                                "<X_Voxels>4</X_Voxels>")
    p.write_text(txt)
    with pytest.raises(ValueError):
        load_vxa(str(p))


def test_write_compression_roundtrips(tmp_path):
    """Writer ZLIB/BASE64/ASCII outputs all load back identically."""
    from evosoro_tpu.core.types import evosoro_default_palette
    from evosoro_tpu.io import write_vxa

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 5, size=(4, 3, 2)).astype(np.int32)
    for comp in ("ASCII_READABLE", "BASE64", "ZLIB"):
        p = tmp_path / f"{comp}.vxa"
        write_vxa(str(p), ids, evosoro_default_palette(), compression=comp)
        doc = load_vxa(str(p))
        assert np.array_equal(doc.structure, ids), comp


def test_roundtrip_preserves_structure(tmp_path):
    src = os.path.join(REF, "_voxcad/voxelyzeMain/Example_withPhaseOffset.vxa")
    doc = load_vxa(src)
    out = tmp_path / "roundtrip.vxa"
    write_vxa(
        str(out), doc.structure, materials=doc.materials,
        lattice_dim=doc.lattice_dim, sim=doc.sim, env=doc.env,
        voxel_arrays=doc.voxel_arrays,
    )
    doc2 = load_vxa(str(out))
    assert np.array_equal(doc.structure, doc2.structure)
    assert np.isclose(doc.lattice_dim, doc2.lattice_dim)
    for tag, arr in doc.voxel_arrays.items():
        assert tag in doc2.voxel_arrays
        assert np.allclose(arr, doc2.voxel_arrays[tag], atol=1e-6)


def test_neural_net_block_roundtrip(tmp_path):
    """Dormant <NeuralNet> env params are parsed and re-serialized.

    The reference parses these seven tags (VX_Environment.cpp:197-206) and
    never reads them in the engine; we carry them the same way.
    """
    from evosoro_tpu.core.types import evosoro_default_palette
    from evosoro_tpu.io import write_vxa

    ids = np.ones((2, 2, 2), dtype=np.int32)
    p = tmp_path / "nn.vxa"
    write_vxa(str(p), ids, evosoro_default_palette())
    txt = p.read_text().replace(
        "</Thermal>",
        "</Thermal>\n<NeuralNet>\n"
        "<NeuralNetUpdatesPerTempCycle>8.0</NeuralNetUpdatesPerTempCycle>\n"
        "<TouchSensorsEnabled>1</TouchSensorsEnabled>\n"
        "<ProprioceptionSensorsEnabled>0</ProprioceptionSensorsEnabled>\n"
        "<PacemakerSensorsEnabled>1</PacemakerSensorsEnabled>\n"
        "<NumHiddenNeuronsPerLayer>5</NumHiddenNeuronsPerLayer>\n"
        "<NumHiddenLayers>2</NumHiddenLayers>\n"
        "<OutputSmoothing>0.25</OutputSmoothing>\n"
        "</NeuralNet>",
    )
    p.write_text(txt)
    doc = load_vxa(str(p))
    nn = doc.env.neural_net
    assert nn is not None
    assert nn.updates_per_temp_cycle == 8.0
    assert nn.touch_sensors_enabled is True
    assert nn.proprioception_sensors_enabled is False
    assert nn.pacemaker_sensors_enabled is True
    assert nn.num_hidden_neurons_per_layer == 5
    assert nn.num_hidden_layers == 2
    assert nn.output_smoothing == 0.25

    out = tmp_path / "nn_rt.vxa"
    write_vxa(str(out), doc.structure, materials=doc.materials,
              lattice_dim=doc.lattice_dim, sim=doc.sim, env=doc.env)
    doc2 = load_vxa(str(out))
    assert doc2.env.neural_net == nn
    # absent block stays absent
    p0 = tmp_path / "plain.vxa"
    write_vxa(str(p0), ids, evosoro_default_palette())
    assert load_vxa(str(p0)).env.neural_net is None
