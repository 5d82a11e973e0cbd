"""Environmental source tracking (reference: VX_Source,
VX_Environment.h:40-130; updateSourcesInformation VX_Sim.cpp:2527-2558)."""

import numpy as np
import jax

from evosoro_tpu.core.materials import build_body, calc_max_dt, palette_from_list
from evosoro_tpu.core.rollout import num_steps_for, rollout
from evosoro_tpu.core.types import EnvParams, SimParams, evosoro_default_palette
from evosoro_tpu.envs.sources import make_sources, source_positions
from evosoro_tpu.io.vxa import load_vxa, write_vxa


def _body():
    structure = np.zeros((2, 2, 2), dtype=np.int32)
    structure[:, :, :] = 1
    pal = palette_from_list(evosoro_default_palette())
    return structure, build_body(structure, pal, lattice_dim=0.01)


def test_min_and_avg_distance_tracked():
    structure, body = _body()
    sources = make_sources([
        dict(pos=(0.1, 0.01, 0.01), enabled=True),
        dict(pos=(0.01, 0.2, 0.01), enabled=True),
    ])
    sim = SimParams(stop_condition_value=0.02, init_cm_time=0.0)
    env = EnvParams(sources=sources, temp_enabled=False)
    dt = float(calc_max_dt(body)) * float(sim.dt_frac)
    steps = num_steps_for(body, sim, dt=dt)
    res = jax.jit(lambda: rollout(body, sim, env, num_steps=steps, dt=dt))()
    # nearest voxel of the resting 2x2x2 block to (0.1, .01, .01):
    # corner voxel at (.015,.015,.015)... distances in lattice units
    md = np.asarray(res.source_min_dist)
    assert md.shape == (2,)
    d0 = np.linalg.norm([0.1 - 0.015, 0.01 - 0.005, 0.01 - 0.005]) / 0.01
    assert abs(md[0] - d0) < 0.2  # body settles a little
    avg = np.asarray(res.source_avg_min_dist)
    assert (avg > 0).all()
    assert np.allclose(avg, md, rtol=0.05)  # barely moving body


def test_oscillating_source_position():
    sources = make_sources([
        dict(pos=(0.0, 0.0, 0.0), amp=(0.1, 0.0, 0.0), freq=(2.0, 0.0, 0.0),
             enabled=True)
    ])
    p0 = np.asarray(source_positions(sources, 0.0))
    p_quarter = np.asarray(source_positions(sources, 0.125))  # sin(π/2)=1
    assert np.allclose(p0[0], [0.0, 0.0, 0.0], atol=1e-12)
    assert abs(p_quarter[0, 0] - 0.1) < 1e-6


def test_sources_roundtrip_vxa(tmp_path):
    structure, _ = _body()
    sources = make_sources([
        dict(pos=(1.0, 2.0, 3.0), amp=(0.5, 0, 0), freq=(4.0, 0, 0),
             enabled=True, type=0)
    ])
    env = EnvParams(sources=sources)
    path = tmp_path / "src.vxa"
    write_vxa(path, structure, evosoro_default_palette(), env=env)
    doc = load_vxa(path)
    assert doc.env.sources is not None
    assert np.allclose(np.asarray(doc.env.sources.base_pos), [[1.0, 2.0, 3.0]])
    assert np.allclose(np.asarray(doc.env.sources.amp), [[0.5, 0, 0]])
    assert np.allclose(np.asarray(doc.env.sources.freq), [[4.0, 0, 0]])
    assert bool(np.asarray(doc.env.sources.enabled)[0])
