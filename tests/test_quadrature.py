"""Quadrature self-checks, mirroring the reference's startup tests
(quadrature_mod.F90:247 `test_gauss`, :478 `test_gausslobatto`)."""

import numpy as np

from transport_se_tpu.grid.quadrature import (
    gll_points_weights, gll_derivative_matrix, lagrange_eval)


def test_gll4_exact_values():
    x, w = gll_points_weights(4)
    assert np.allclose(x, [-1, -np.sqrt(1 / 5), np.sqrt(1 / 5), 1], atol=1e-15)
    assert np.allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-15)


def test_gll_integrates_polynomials_exactly():
    # GLL with npts points is exact through degree 2*npts-3
    for npts in (3, 4, 5, 8):
        x, w = gll_points_weights(npts)
        for deg in range(2 * npts - 2):
            integral = np.sum(w * x**deg)
            exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
            assert abs(integral - exact) < 5e-14, (npts, deg)


def test_derivative_matrix_exact_on_basis():
    for npts in (4, 6):
        x, _ = gll_points_weights(npts)
        D = gll_derivative_matrix(npts)
        for p in range(npts):
            df = D @ x**p
            exact = p * x**(p - 1) if p > 0 else np.zeros(npts)
            assert np.abs(df - exact).max() < 1e-12


def test_derivative_rowsum_zero():
    D = gll_derivative_matrix(4)
    assert np.abs(D.sum(axis=1)).max() < 1e-14


def test_lagrange_eval_partition_of_unity():
    x, _ = gll_points_weights(4)
    xe = np.linspace(-1, 1, 17)
    L = lagrange_eval(x, xe)
    assert np.abs(L.sum(axis=1) - 1).max() < 1e-14
    # interpolates cubic exactly
    f = lambda t: 3 * t**3 - t + 0.5
    assert np.abs(L @ f(x) - f(xe)).max() < 1e-13
