"""Fitness-statistic suite + shape descriptors + native runtime.

Covers the reference result-file surface (VX_SimGA.cpp:140-203) and the
VX_MeshUtil shape-descriptor path (volume, qhull hull volume, complexity).
"""

import numpy as np
import pytest

import jax

from evosoro_tpu import native
from evosoro_tpu.core import (
    build_body,
    calc_max_dt,
    evosoro_default_palette,
    init_state,
    palette_from_list,
    rollout,
)
from evosoro_tpu.core.shape import shape_descriptors
from evosoro_tpu.core.types import EnvParams, SimParams


def _body(with_feet_and_needle=False, seed=0, shape=(4, 4, 3)):
    rng = np.random.default_rng(seed)
    s = rng.integers(1, 5, size=shape).astype(np.int32)
    if with_feet_and_needle:
        s[0, 0, 0] = 6  # feet material
        s[-1, -1, -1] = 7  # needle material
    pal = palette_from_list(evosoro_default_palette())
    return build_body(s, pal, phase_offset=rng.uniform(0, 1, shape)), s


def test_full_fitness_suite_finite():
    body, s = _body(with_feet_and_needle=True)
    sim = SimParams(stop_condition_value=0.08, init_cm_time=0.02,
                    afterlife_time=0.02)
    env = EnvParams(norm_dist_by_vol=True, falling_prohibited=True,
                    needle_in_haystack=True, num_trace_steps_in_window=5)
    dt = float(calc_max_dt(body)) * 0.9
    steps = int(0.1 / dt)
    res = jax.jit(
        lambda: rollout(body, sim, env, num_steps=steps, dt=dt, trace_every=4)
    )()
    for f in ("norm_final_dist", "final_dist", "final_dist_y",
              "norm_regime_dist", "norm_frozen_dist", "anterior_dist",
              "posterior_dist", "anterior_y", "posterior_y",
              "end_of_life_posterior_y", "fall_adj_post_y", "push_dist",
              "norm_window_dist", "lifetime"):
        v = np.asarray(getattr(res, f), dtype=np.float64)
        assert np.all(np.isfinite(v)), f
    assert not bool(res.diverged)
    # anterior >= posterior by construction
    assert float(res.anterior_dist) >= float(res.posterior_dist)
    assert float(res.anterior_y) >= float(res.posterior_y)
    # trace lengths agree
    assert res.cm_trace.shape[0] == res.vol_trace.shape[0]
    # volume trace is dimensionless (scale/L)^3 voxel counts, exactly the
    # reference getTotalVolume (VX_Sim.cpp:2573-2580): at rest it equals
    # the occupied-voxel count
    n_occ = int((s > 0).sum())
    assert np.isclose(float(res.vol_trace[0]), n_occ, rtol=1e-5)
    # touch counts: ints within [0, n_occ]
    assert 0 <= int(res.num_touching_floor) <= n_occ
    assert 0 <= int(res.num_non_feet_touching_floor) <= int(res.num_touching_floor)


def test_fall_over_zeroes_fitness():
    # a fell-over robot reports zero normalized distances
    # (reference: VX_SimGA.cpp:115-126). Build a body that is all "feet"
    # (mat 6) so every touching voxel trips the fall condition immediately.
    s = np.full((3, 3, 2), 6, dtype=np.int32)
    pal = palette_from_list(evosoro_default_palette())
    body = build_body(s, pal, phase_offset=np.zeros(s.shape))
    sim = SimParams(stop_condition_value=0.05, init_cm_time=0.001)
    env = EnvParams(falling_prohibited=True)
    dt = float(calc_max_dt(body)) * 0.9
    res = jax.jit(
        lambda: rollout(body, sim, env, num_steps=int(0.06 / dt), dt=dt)
    )()
    assert bool(res.fell_over)
    assert float(res.norm_final_dist) == 0.0
    assert float(res.norm_regime_dist) == 0.0


def test_needle_untouched_reports_zero():
    body, _ = _body(with_feet_and_needle=False)
    sim = SimParams(stop_condition_value=0.02, init_cm_time=0.0)
    env = EnvParams(needle_in_haystack=True, temp_enabled=False)
    dt = float(calc_max_dt(body)) * 0.9
    res = jax.jit(
        lambda: rollout(body, sim, env, num_steps=20, dt=dt)
    )()
    # no mat-7 voxel in the design: needle pos is the masked-mean fallback
    # (zero) both times → no movement detected
    assert int(res.found_needle) == 0
    assert float(res.push_dist) == 0.0


def test_mid_life_freeze_pauses_development():
    # growth with a freeze window: the frozen body's growth lags the
    # unfrozen one at a time inside the window (VXS_Voxel.cpp:242-265)
    shape = (2, 2, 2)
    s = np.full(shape, 3, dtype=np.int32)
    pal = palette_from_list(evosoro_default_palette())
    L = 0.01
    body = build_body(
        s, pal, phase_offset=np.zeros(shape),
        initial_voxel_size=np.full(shape, L),
        final_voxel_size=np.full(shape, 1.5 * L),
        growth_time=np.full(shape, 0.04),
        start_growth_time=np.zeros(shape),
    )
    env = EnvParams(temp_enabled=False, growth_amplitude=0.8)
    dt = float(calc_max_dt(body)) * 0.5
    mid_steps = int(0.03 / dt)

    def final_scale(freeze):
        sim = SimParams(stop_condition_value=0.06, init_cm_time=0.0,
                        mid_life_freeze_time=freeze)
        res = rollout(body, sim, env, num_steps=mid_steps, dt=dt)
        return jax.numpy.mean(res.final_state.scale)

    s_free, s_frozen = jax.jit(
        lambda: (final_scale(0.0), final_scale(0.04))
    )()
    assert float(s_frozen) < float(s_free)


def test_shape_descriptors_rest_state():
    s = np.zeros((3, 3, 3), np.int32)
    s[:, :, :2] = 3
    pal = palette_from_list(evosoro_default_palette())
    body = build_body(s, pal)
    st = init_state(body)
    d = shape_descriptors(st, body)
    assert np.isclose(d["robot_volume"], 18 * 0.01**3, rtol=1e-5)
    assert np.isclose(d["hull_volume"], 0.03 * 0.03 * 0.02, rtol=1e-5)
    assert 0.99 < d["convexity"] < 1.01
    # 3x3x2 slab: 9 top + 9 bottom + 4 sides x (3x2) = 42 faces, 2 tris each
    assert d["num_surface_triangles"] == 42 * 2


def test_native_hull_matches_scipy():
    pytest.importorskip("scipy")
    from scipy.spatial import ConvexHull

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(150, 3))
    vol, area = native.convex_hull_volume(pts)
    h = ConvexHull(pts)
    assert np.isclose(vol, h.volume, rtol=1e-9)
    assert np.isclose(area, h.area, rtol=1e-9)


def test_native_codec_roundtrip():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 8, size=500).astype(np.uint8)
    assert np.array_equal(
        native.decode_ascii_layer(native.encode_ascii_layer(ids)), ids
    )


def test_surface_triangles_native_matches_numpy():
    rng = np.random.default_rng(11)
    occ = rng.random((5, 4, 3)) > 0.4
    t_native = native.surface_triangles(occ)
    t_np = native._surface_triangles_np(occ.astype(np.uint8))
    # same multiset of triangles (order may differ)
    a = {tuple(r) for r in t_native.tolist()}
    b = {tuple(r) for r in t_np.tolist()}
    assert a == b
