"""Factored wind basis (model/wind_basis.py) vs direct formula evaluation.

The basis must reproduce dcmip.winds / divergence_sphere(vn0) / the DSS'd
divdp_proj exactly (up to f64 roundoff of the angle-addition expansion).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transport_se_tpu.config import Config
from transport_se_tpu.model import dcmip
from transport_se_tpu.model.core import _tp, build_model
from transport_se_tpu.model.wind_basis import build_wind_basis
from transport_se_tpu.ops import sphere_ops as so

TIMES = [0.0, 3600.0, 123456.0, 518400.0]


@pytest.mark.parametrize("test_case", ["dcmip1-1", "dcmip1-2"])
def test_wind_basis_matches_direct(test_case):
    cfg = Config(ne=4, qsize=4, test_case=test_case, nmax=3,
                 nu_q=6e16, dss_mode="face", elem_order="raster")
    m = build_model(cfg)
    wb = build_wind_basis(m)
    E = m.grid.nelem
    nk = cfg.nlev
    for t in TIMES:
        u_t, v_t, un0_t, vn0_t, divdp_t, proj_t = wb.eval(t)
        v = dcmip.winds(test_case, m.lon, m.lat, m.etam, t)
        vn0 = v * m.dp0col[None, :, None, None, None]
        u_ref = _tp(v[:, :, 0], E, nk)
        v_ref = _tp(v[:, :, 1], E, nk)
        np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_ref),
                                   rtol=0, atol=2e-9)
        np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_ref),
                                   rtol=0, atol=2e-9)
        divdp = so.divergence_sphere(vn0, m.deriv, m.Dinv, m.metdet,
                                     m.rmetdet)
        divdp_ref = _tp(divdp, E, nk)
        scale = float(jnp.abs(divdp_ref).max())
        np.testing.assert_allclose(np.asarray(divdp_t),
                                   np.asarray(divdp_ref),
                                   rtol=0, atol=1e-9 * scale)
        proj_ref = m.tables.dss_scale_t(
            divdp_ref * m.spheremp.reshape(E, 16, 1),
            m.rspheremp.reshape(E, 16))
        np.testing.assert_allclose(np.asarray(proj_t),
                                   np.asarray(proj_ref),
                                   rtol=0, atol=1e-9 * scale)
