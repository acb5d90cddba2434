"""ppm_search="general" escape hatch (config.py): deformation beyond the
fast path's +-2-cell window runs through the unbounded counting search
(reference prim_advection_mod.F90:159-173) instead of aborting."""

import jax.numpy as jnp
import numpy as np

from transport_se_tpu.config import Config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         vertical_remap)
from transport_se_tpu.ops.ppm import remap_q_ppm_general


def _big_deformation(m):
    """divdp_proj moving mid-column interfaces ~3.5 local cells while every
    Lagrangian layer stays positive: interface displacement w ramps up over
    16 cells (compression spread thin), holds a >2-cell plateau, ramps
    back."""
    dp0 = np.asarray(m.dp0col)
    nlev = dp0.size
    w = np.zeros(nlev + 1)
    # plateau displacement: 3.5x the local cell width at the plateau center
    W = 3.5 * dp0[44]
    for k in range(21, 37):
        w[k] = W * (k - 20) / 16.0
    w[37:53] = W
    # ramp back over 16 cells too: W/16 ~ 810 Pa per layer stays below the
    # thinnest dp0 in 53..68 (~915 Pa), so every layer stays positive
    for k in range(53, 69):
        w[k] = W * (69 - k) / 16.0
    dt = m.cfg.dt_remap
    div_col = -(w[1:] - w[:-1]) / dt                    # [nlev]
    E = m.grid.nelem
    return jnp.broadcast_to(
        jnp.asarray(div_col)[None, :, None, None], (E, nlev, 4, 4))


def test_general_flag_survives_big_deformation():
    cfg = Config(ne=2, qsize=2, nmax=1, nu_q=6e16, ppm_search="general")
    m = build_model(cfg)
    divdp = _big_deformation(m)
    Qdp = initial_qdp(m)
    Qnew, ps_v, dp_ref, min_dp = vertical_remap(m, Qdp, divdp,
                                                m.cfg.dt_remap)
    # advisory guard: layers positive, so no abort
    assert float(min_dp) > 0.0
    # column mass conserved
    m0 = np.asarray(Qdp).sum(axis=2)
    m1 = np.asarray(Qnew).sum(axis=2)
    assert np.abs((m1 - m0) / np.abs(m0).max()).max() < 1e-12
    # matches the general-search oracle applied directly
    dp_star = np.asarray(m.dp0col)[None, :, None, None] \
        - m.cfg.dt_remap * np.asarray(divdp)
    d1 = jnp.moveaxis(jnp.asarray(dp_star), 1, 3)
    d2 = jnp.moveaxis(jnp.asarray(dp_ref), 1, 3)
    Qcol = jnp.moveaxis(Qdp, (1, 2), (3, 4))
    oracle = remap_q_ppm_general(Qcol, d1, d2)
    got = jnp.moveaxis(jnp.asarray(Qnew), (1, 2), (3, 4))
    assert np.abs(np.asarray(oracle - got)).max() == 0.0


def test_fast_guard_fires_on_big_deformation():
    cfg = Config(ne=2, qsize=2, nmax=1, nu_q=6e16)   # ppm_search="fast"
    m = build_model(cfg)
    divdp = _big_deformation(m)
    Qdp = initial_qdp(m)
    _, _, _, min_dp = vertical_remap(m, Qdp, divdp, m.cfg.dt_remap)
    # the window guard must flag the >2-cell deformation for the driver
    assert float(min_dp) < 0.0


def test_namelist_accepts_ppm_search():
    from transport_se_tpu.io.namelist import config_from_namelist
    nl = """
&ctl_nl
  test_case = "dcmip1-1"
  ne = 4
  qsize = 2
  nmax = 3
  tstep = 1200
  tstep_type = 1
  rsplit = 3
  nu_q = 6e16
  limiter_option = 8
  prescribed_wind = 1
  ppm_search = 'general'
/
"""
    rs = config_from_namelist(nl)
    assert rs.cfg.ppm_search == "general"
