"""I/O stack tests: history NetCDF, exact restart, namelist parsing.

Mirrors the reference's implied-but-unscripted restart BFB check
(SURVEY.md §4.7; prim_driver_mod.F90:512-521 "Exact Restart") and verifies
the history file layout the NCL norm scripts depend on
(test/dcmip1-1/dcmip1-1_error_norm_ng.ncl reads Q(time,lev,ncol), lat, lon).
"""

import dataclasses
import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from transport_se_tpu.config import Config
from transport_se_tpu.io import restart as restart_io
from transport_se_tpu.io.history import HistoryWriter
from transport_se_tpu.io.namelist import config_from_namelist
from transport_se_tpu.model.core import build_model, initial_qdp
from transport_se_tpu.model.driver import run_simulation

CFG = Config(ne=2, nlev=16, qsize=2, tstep=1200.0, vcoord="dcmip16",
             test_case="dcmip1-1", nu_q=6e16, nmax=6, rsplit=3,
             statefreq=3, dtype="f64")


@pytest.fixture(scope="module")
def model():
    return build_model(CFG)


def test_history_roundtrip(model, tmp_path):
    path = str(tmp_path / "hist.nc")
    hist = HistoryWriter(path, model, varnames=("ps", "Q", "geo"),
                         output_frequency=3, output_timeunits=0)
    Qdp = np.asarray(initial_qdp(model))
    dp0 = np.asarray(model.dp0col)
    Q = Qdp / dp0[None, None, :, None, None]
    ps = np.full((model.grid.nelem, 4, 4), 100000.0)
    hist.write(model, 0, Q, ps)
    hist.write(model, 3, Q * 0.5, ps)
    hist.close()

    with netcdf_file(path, "r") as f:
        ncol = f.dimensions["ncol"]
        assert ncol == model.grid.ngid
        assert f.variables["Q"].shape[0] == 2
        assert f.variables["Q"].dimensions == ("time", "lev", "ncol")
        lat = f.variables["lat"][:]
        assert lat.min() >= -90.0 - 1e-9 and lat.max() <= 90.0 + 1e-9
        # unique-point gather preserves values: every written column value
        # appears in the element field
        q_read = f.variables["Q"][0].copy()       # [lev, ncol]
        src = model.grid.uniq_src
        q_flat = np.moveaxis(Q[:, 0], 1, 0).reshape(CFG.nlev, -1)
        np.testing.assert_array_equal(q_read, q_flat[:, src])
        t = f.variables["time"][:].copy()
        np.testing.assert_allclose(
            t, [0.0, 3 * CFG.tstep / 86400.0])
        # second record actually holds the halved field
        np.testing.assert_array_equal(f.variables["Q"][1].copy(),
                                      0.5 * q_flat[:, src])


def test_exact_restart_bitwise(model, tmp_path):
    """runtype=1: 6 steps straight == 3 steps + restart + 3 steps, to the bit."""
    res_full = run_simulation(CFG, model=model, verbose=False)

    cfg_half = dataclasses.replace(CFG, nmax=3)
    path = str(tmp_path / "R0001")
    saved = {}

    def writer(m, nstep, Qdp, ps_v):
        restart_io.write_restart(path, m, Qdp, ps_v, nstep)
        saved["nstep"] = nstep

    run_simulation(cfg_half, model=model, verbose=False,
                   restartfreq=3, restart_writer=writer)
    assert saved["nstep"] == 3

    state = restart_io.read_restart(path)
    assert state.nstep == 3
    Qdp, ps_v, nstep0 = restart_io.resume(state, model, runtype=1)
    res_resumed = run_simulation(CFG, model=model, verbose=False,
                                 init_state=(Qdp, nstep0))

    np.testing.assert_array_equal(res_full.q_final, res_resumed.q_final)
    np.testing.assert_array_equal(res_full.ps_final, res_resumed.ps_final)


def test_restart_branch(model, tmp_path):
    """runtype=2: state loads, counters reset, Qdp rebuilt from Q."""
    path = str(tmp_path / "R0002")
    Qdp = np.asarray(initial_qdp(model))
    ps = np.full((model.grid.nelem, 4, 4), 100000.0)
    restart_io.write_restart(path, model, Qdp, ps, 3)
    state = restart_io.read_restart(path)
    Qdp2, ps2, nstep0 = restart_io.resume(state, model, runtype=2)
    assert nstep0 == 0
    np.testing.assert_allclose(np.asarray(Qdp2), Qdp, rtol=1e-12)


def test_restart_dimension_mismatch(model, tmp_path):
    path = str(tmp_path / "R0003")
    Qdp = np.asarray(initial_qdp(model))
    ps = np.full((model.grid.nelem, 4, 4), 100000.0)
    restart_io.write_restart(path, model, Qdp, ps, 0)
    state = restart_io.read_restart(path)
    bad = dataclasses.replace(CFG, qsize=5)
    with pytest.raises(ValueError):
        restart_io.check_compatible(state, bad, exact=True)


REF_NL = """
&ctl_nl
  NThreads          = 1
  partmethod        = 4
  topology          = "cube"
  test_case         = "dcmip1-1"
  ne                = 8
  qsize             = 2
  ndays             = 12                ! num simulation days, 0=>use nmax
  statefreq         = 20
  restartfreq       = 43200
  restartfile       = "./R0001"
  runtype           = 0
  tstep             = 400
  tstep_type        = 1
  qsplit            = 1
  rsplit            = 3
  integration       = "explicit"
  smooth            = 0.00        ! disabled
  nu                = 0
  nu_q              = 0 !2e16
  limiter_option    = 8
  hypervis_order    = 2
  hypervis_subcycle = 1
  prescribed_wind   = 1
  energy_fixer      = -1
/
&filter_nl
  filter_type       = "taylor"
  filter_freq       = 0
  filter_mu         = 0.04D0
  p_bv              = 12.0D0
/
&vert_nl
  vform             = "ccm"
  vfile_mid         = "vcoord/acme-72m.ascii"
  vfile_int         = "vcoord/acme-72i.ascii"
/
&analysis_nl
  output_dir       = "./movies/"
  output_timeunits = 1
  output_frequency = 6
  output_varnames1 = 'Q','Q3','geo'
  output_type      ='netcdf'
  num_io_procs     = 16
/
&prof_inparm
  profile_timer       = 4
/
"""


def test_namelist_reference_file():
    rs = config_from_namelist(REF_NL)
    cfg = rs.cfg
    assert cfg.ne == 8 and cfg.qsize == 2 and cfg.rsplit == 3
    assert cfg.tstep == 400.0 and cfg.ndays == 12
    assert cfg.limiter_option == 8 and cfg.nu_q == 0.0
    assert cfg.test_case == "dcmip1-1"
    assert cfg.vcoord == "acme72" and cfg.nlev == 72
    assert cfg.nsteps == 12 * 86400 // 400
    assert rs.output_frequency == 6 and rs.output_timeunits == 1
    assert rs.output_varnames == ("Q", "Q3", "geo")
    assert rs.restartfreq == 43200 and rs.runtype == 0


def test_namelist_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        config_from_namelist(REF_NL.replace("tstep_type        = 1",
                                            "tstep_type        = 5"))
    with pytest.raises(NotImplementedError):
        config_from_namelist(REF_NL.replace("filter_freq       = 0",
                                            "filter_freq       = 4"))


def test_history_due_matches_reference_nextoutputstep():
    """due(nstep) must fire exactly when the reference main loop would:
    prim_main runs subcycles until nstep >= nextoutputstep = n + f -
    mod(n, f) then writes (common_movie_mod.F90:167-189)."""
    from transport_se_tpu.io.history import HistoryWriter

    class C:  # minimal cfg stub
        tstep = 100.0

    for freq, rsplit, nend in [(5, 3, 99), (7, 3, 99), (6, 4, 96),
                               (10, 3, 99), (4, 4, 100), (3, 2, 100),
                               (1, 3, 30)]:
        C.rsplit = rsplit
        h = HistoryWriter.__new__(HistoryWriter)
        h.output_frequency = freq
        h.output_timeunits = 0
        # reference loop: nextoutputstep capped at nEndStep (:173), so
        # the final state is always written
        ref_outs = []
        n = 0
        while n < nend:
            target = min(n + freq - (n % freq), nend)
            while n < target:
                n += rsplit
            ref_outs.append(n)
        # driver analog: due() plus the forced final write
        got = [s for s in range(rsplit, nend + rsplit, rsplit)
               if h.due(s, C) or s + rsplit > nend]
        got = sorted(set(got))
        assert got == sorted(set(ref_outs)), (freq, rsplit, got[:9],
                                              ref_outs[:9])
