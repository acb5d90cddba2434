"""Pallas limiter kernel == XLA reference limiter, bit-for-bit-ish.

Runs the kernel in interpret mode on CPU (hardware path is exercised by
bench/verify on the TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from transport_se_tpu.ops.limiter import limiter_optim_iter_full
from transport_se_tpu.ops.pallas_limiter import \
    limiter_optim_iter_full_pallas


def _random_problem(rng, n, hard_frac=0.3):
    """Mix of easy rows and rows violating bounds hard."""
    x = rng.uniform(0.0, 1.0, (n, 16))
    dp = rng.uniform(0.5, 2.0, (n, 16))
    sph = rng.uniform(0.1, 1.0, (n, 16))
    qmin = np.quantile(x, 0.2, axis=1)
    qmax = np.quantile(x, 0.8, axis=1)
    # some rows get infeasible bounds to exercise the relaxation path
    k = int(n * hard_frac)
    qmin[:k] = 0.9
    qmax[n - k:] = 0.1 + qmin[n - k:] * 0  # force max < typical mass/sumc
    return (jnp.asarray(x * dp), jnp.asarray(sph), jnp.asarray(qmin),
            jnp.asarray(qmax), jnp.asarray(dp))


@pytest.mark.parametrize("n", [64, 2048, 3000])
def test_matches_xla_limiter(n):
    rng = np.random.default_rng(0)
    ptens, sph, qmin, qmax, dp = _random_problem(rng, n)
    want, wmin, wmax = limiter_optim_iter_full(ptens, sph, qmin, qmax, dp)
    got, gmin, gmax = limiter_optim_iter_full_pallas(
        ptens, sph, qmin, qmax, dp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(gmin), np.asarray(wmin), atol=0)
    np.testing.assert_allclose(np.asarray(gmax), np.asarray(wmax), atol=0)


def test_mass_preserved_and_bounds():
    rng = np.random.default_rng(1)
    ptens, sph, qmin, qmax, dp = _random_problem(rng, 4096)
    got, gmin, gmax = limiter_optim_iter_full_pallas(
        ptens, sph, qmin, qmax, dp, interpret=True)
    mass_in = np.asarray((sph * ptens).sum(-1))
    mass_out = np.asarray((sph * got).sum(-1))
    np.testing.assert_allclose(mass_out, mass_in, rtol=1e-12)
    q = np.asarray(got / dp)
    assert (q <= np.asarray(gmax)[:, None] + 1e-11).all()
    assert (q >= np.asarray(gmin)[:, None] - 1e-11).all()


def test_batched_shapes():
    rng = np.random.default_rng(2)
    ptens, sph, qmin, qmax, dp = _random_problem(rng, 6 * 5 * 4)
    shp = (6, 5, 4, 16)
    want, _, _ = limiter_optim_iter_full(ptens, sph, qmin, qmax, dp)
    got, _, _ = limiter_optim_iter_full_pallas(
        ptens.reshape(shp), sph.reshape(shp),
        qmin.reshape(shp[:-1]), qmax.reshape(shp[:-1]), dp.reshape(shp),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 16),
                               np.asarray(want), atol=1e-13)


def test_euler_step_pallas_path_matches():
    """use_pallas=True end-to-end subcycle == XLA path (interpret on CPU)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from transport_se_tpu.config import Config
    from transport_se_tpu.model.core import (build_model, initial_qdp,
                                             make_subcycle_fn)

    cfg = Config(ne=2, nlev=16, qsize=2, tstep=1200.0, vcoord="dcmip16",
                 test_case="dcmip1-1", nu_q=6e16, nmax=3, dtype="f64")
    m = build_model(cfg)
    Qdp = initial_qdp(m)
    ref, *_ = jax.jit(make_subcycle_fn(m))(Qdp, jnp.asarray(0, jnp.int32))

    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    mp = dataclasses.replace(m, cfg=cfg_p)
    got, *_ = jax.jit(make_subcycle_fn(mp))(Qdp, jnp.asarray(0, jnp.int32))
    # the kernel reduces over the transposed layout, so mass/addmass sums
    # associate differently: agreement is to roundoff (values are O(1e3)
    # tracer mass in Pa), not bitwise
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-9)
