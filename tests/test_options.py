"""Capability options: qsplit>1 (ur_weights), limiter_option 0/4,
hypervis_subcycle_q>1, limiter2d_minmax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transport_se_tpu.config import Config
from transport_se_tpu.model.core import (build_model, initial_qdp,
                                         make_subcycle_fn)
from transport_se_tpu.ops.limiter import limiter2d_minmax


def _limiter2d_minmax_ref(qdp, dp, sp, qmin, qmax):
    """Direct scalar port of prim_advection_mod.F90:1100-1183."""
    q = qdp / dp
    mass = float((qdp * sp).sum())
    area = float((dp * sp).sum())
    if q.max() > qmax:
        q = qmax - q
        mass2 = area * qmax - mass
        if mass2 < 0:
            q = -q
        mass_new = 0.0
        for i in range(q.size):
            if q.flat[i] < 0:
                q.flat[i] = 0
            else:
                mass_new += q.flat[i] * dp.flat[i] * sp.flat[i]
        if mass_new > 0:
            q = q * abs(mass2) / mass_new
        if mass2 < 0:
            q = -q
        q = qmax - q
    if q.min() < qmin:
        q = q - qmin
        mass2 = mass - area * qmin
        if mass2 < 0:
            q = -q
        mass_new = 0.0
        for i in range(q.size):
            if q.flat[i] < 0:
                q.flat[i] = 0
            else:
                mass_new += q.flat[i] * dp.flat[i] * sp.flat[i]
        if mass_new > 0:
            q = q * abs(mass2) / mass_new
        if mass2 < 0:
            q = -q
        q = q + qmin
    return q * dp


def test_limiter2d_minmax_matches_reference_port():
    rng = np.random.default_rng(0)
    B = 40
    qdp = rng.uniform(-0.2, 1.5, (B, 16))
    dp = rng.uniform(0.5, 2.0, (B, 16))
    sp = rng.uniform(0.1, 1.0, (B, 16))
    qmin = rng.uniform(0.0, 0.2, B)
    qmax = rng.uniform(0.6, 1.2, B)
    got = np.asarray(limiter2d_minmax(jnp.asarray(qdp), jnp.asarray(dp),
                                      jnp.asarray(sp), jnp.asarray(qmin),
                                      jnp.asarray(qmax)))
    for b in range(B):
        ref = _limiter2d_minmax_ref(qdp[b].copy(), dp[b], sp[b],
                                    qmin[b], qmax[b])
        np.testing.assert_allclose(got[b], ref, rtol=1e-12, atol=1e-13)
        # mass conservation
        np.testing.assert_allclose((got[b] * sp[b]).sum(),
                                   (qdp[b] * sp[b]).sum(), rtol=1e-12)


@pytest.mark.parametrize("qsplit", [2, 3, 4])
def test_ur_weights_formula(qsplit):
    """ur_weights sum to 1 and match prim_advance_mod.F90:53-67."""
    w = np.zeros(qsplit)
    if qsplit % 2:
        w[0] = 1.0 / qsplit
        w[2::2] = 2.0 / qsplit
    else:
        w[1::2] = 2.0 / qsplit
    assert abs(w.sum() - 1.0) < 1e-15
    # spot-check published patterns
    if qsplit == 4:
        np.testing.assert_allclose(w, [0.0, 0.5, 0.0, 0.5])
    if qsplit == 3:
        np.testing.assert_allclose(w, [1 / 3, 0.0, 2 / 3])


@pytest.mark.parametrize("opts", [dict(qsplit=2),
                                  dict(limiter_option=0),
                                  dict(limiter_option=4),
                                  dict(hypervis_subcycle_q=2,
                                       limiter_option=0)])
def test_option_configs_run_and_conserve(opts):
    """Each previously-rejected option is accepted and conserves mass."""
    cfg = Config(ne=2, qsize=2, nmax=3, tstep=600.0, nu_q=6e16, **opts)
    m = build_model(cfg)
    step = jax.jit(make_subcycle_fn(m))
    Qdp = initial_qdp(m)
    sp3 = m.spheremp[:, None, None, :, :]
    mass0 = np.asarray((Qdp * sp3).sum(axis=(0, 2, 3, 4)))
    Qdp2, ps, nstep, min_dp = step(Qdp, jnp.asarray(0, jnp.int32))
    mass1 = np.asarray((Qdp2 * sp3).sum(axis=(0, 2, 3, 4)))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-12)
    assert float(min_dp) > 0
