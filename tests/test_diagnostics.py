"""Startup self-checks and printstate diagnostics (SURVEY §4.1)."""

import numpy as np
import pytest

from transport_se_tpu.config import Config
from transport_se_tpu.diagnostics import print_cfl, print_state
from transport_se_tpu.diagnostics import \
    test_global_integral as check_global_integral
from transport_se_tpu.model.core import build_model, initial_qdp

CFG = Config(ne=4, nlev=16, qsize=2, tstep=1200.0, vcoord="dcmip16",
             test_case="dcmip1-1", nu_q=6e16, nmax=3)


@pytest.fixture(scope="module")
def model():
    return build_model(CFG)


def test_sphere_area(model):
    # global_norms_mod.F90:96: DSS-assembled sphere area == 4*pi to roundoff
    assert check_global_integral(model) < 1e-13


def test_cfl_limits_sane(model):
    dt_tracer, dt_hv = print_cfl(model, CFG, verbose=False)
    # NE4 -> ~7.8 degree elements; the advective limit at 120 m/s with
    # lambda_max=2.74 lands in the hundreds of seconds
    assert 100.0 < dt_tracer < 20000.0
    assert dt_hv > 0


def test_cfl_scales_with_resolution():
    m8 = build_model(Config(ne=8, nlev=16, qsize=1, vcoord="dcmip16",
                            tstep=400.0, nmax=1))
    dt8, _ = print_cfl(m8, m8.cfg, verbose=False)
    m4 = build_model(CFG)
    dt4, _ = print_cfl(m4, CFG, verbose=False)
    # halving element size halves the advective dt limit
    assert 1.7 < dt4 / dt8 < 2.3


def test_print_state(model, capsys):
    Qdp = np.asarray(initial_qdp(model))
    ps = np.full((model.grid.nelem, 4, 4), 1.0e5)
    out = print_state(model, Qdp, ps)
    assert "ps" in out and "Q1dp" in out and "Q2dp" in out
    # area-weighted mean surface pressure is ps itself for constant ps
    line = [ln for ln in out.splitlines() if ln.strip().startswith("ps")][0]
    mean = float(line.split()[-1])
    np.testing.assert_allclose(mean, 1.0e5, rtol=1e-12)


def test_energy_diagnostics(model):
    from transport_se_tpu.diagnostics import energy_diagnostics
    from transport_se_tpu.constants import CP, T0, P0, G

    e = energy_diagnostics(model, 0)
    assert e["KE"] > 0 and e["PE"] > 0
    # isothermal IE = cp*T0*(total mass)/g with total column mass p0-ptop
    import numpy as np
    ptop = float(np.asarray(model.etai)[0]) * P0
    np.testing.assert_allclose(e["IE"], CP * T0 * (P0 - ptop) / G,
                               rtol=1e-10)
