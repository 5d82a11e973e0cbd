"""Static FEA + tensile harness vs analytic beam theory.

The cantilever case is the reference's own (never-asserted) benchmark:
VX_Benchmark.cpp:34-82 AxialSimpleTest documents tip deflection PL³/3EI
for a 20-voxel cantilever. Euler–Bernoulli frame elements give exact nodal
deflections for an end-loaded cantilever, so the tolerance here is tight.
"""

import numpy as np
import jax

from evosoro_tpu.analysis import fea_solve, tensile_test
from evosoro_tpu.core.materials import build_body, palette_from_list
from evosoro_tpu.core.types import Material


def _beam_body(n=10, E=1e6, L=0.001):
    structure = np.zeros((n, 1, 1), dtype=np.int32)
    structure[:, 0, 0] = 1
    pal = palette_from_list([Material(1, elastic_mod=E, density=1e3)])
    fixed = np.zeros((n, 1, 1), dtype=np.int32)
    fixed[0, 0, 0] = 63  # clamp root (all 6 DOF)
    body = build_body(structure, pal, lattice_dim=L, dof_fixed=fixed,
                      dtype=np.float64)
    return body, E, L


def test_cantilever_tip_deflection_matches_analytic():
    n, P = 10, 1e-4
    body, E, L = _beam_body(n=n)
    ext = np.zeros((n, 1, 1, 3))
    ext[-1, 0, 0, 2] = -P  # tip load in -z
    sol = jax.jit(lambda: fea_solve(body, ext_force=ext, tol=1e-12))()
    tip = float(sol["displacement"][-1, 0, 0, 2])
    L_beam = (n - 1) * L
    I = L**4 / 12.0
    analytic = -P * L_beam**3 / (3.0 * E * I)
    assert abs(tip - analytic) / abs(analytic) < 1e-6
    assert float(sol["residual"]) < 1e-10


def test_axial_stretch_matches_spring_series():
    n, P = 6, 1e-3
    body, E, L = _beam_body(n=n)
    ext = np.zeros((n, 1, 1, 3))
    ext[-1, 0, 0, 0] = P  # axial pull
    sol = jax.jit(lambda: fea_solve(body, ext_force=ext, tol=1e-12))()
    tip = float(sol["displacement"][-1, 0, 0, 0])
    # series of (n-1) springs of stiffness EA/L
    k = E * L * L / L / (n - 1)
    assert abs(tip - P / k) / (P / k) < 1e-8


def test_tensile_test_recovers_elastic_modulus():
    body, E, L = _beam_body(n=6)
    # release the clamp; tensile_test applies its own face BCs
    body = body.replace(dof_fixed=np.zeros((6, 1, 1), dtype=np.int32))
    out = jax.jit(lambda: tensile_test(
        body, axis=0, strains=np.array([0.005, 0.01])))()
    stress = np.asarray(out["stress"])
    strain = np.asarray(out["strain"])
    mod = stress / strain
    np.testing.assert_allclose(mod, E, rtol=1e-6)
    # linearity
    np.testing.assert_allclose(stress[1], 2 * stress[0], rtol=1e-8)
