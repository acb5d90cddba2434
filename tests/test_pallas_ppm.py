"""Pallas PPM remap kernel == the XLA remap (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from transport_se_tpu.ops.pallas_ppm import remap_q_ppm_pallas_t
from transport_se_tpu.ops.ppm import remap_q_ppm, remap_q_ppm_general


def _problem(seed, E=5, nq=3, nk=24, deform=0.25):
    rng = np.random.default_rng(seed)
    dp1 = rng.uniform(0.6, 1.6, (E, 16, nk))
    pert = rng.uniform(-deform, deform, (E, 16, nk))
    dp2 = dp1 * (1.0 + pert)
    dp2 *= dp1.sum(-1, keepdims=True) / dp2.sum(-1, keepdims=True)
    q = rng.uniform(0.0, 1.0, (E, 16, nq, nk))
    qdp = (q * dp1[:, :, None]).reshape(E, 16, nq * nk)
    return (jnp.asarray(qdp), jnp.asarray(dp1), jnp.asarray(dp2), nq, nk)


@pytest.mark.parametrize("alg", [0, 2])
def test_kernel_matches_xla(alg):
    qdp, dp1, dp2, nq, nk = _problem(0)
    got = remap_q_ppm_pallas_t(qdp, dp1, dp2, alg=alg, interpret=True)
    want = remap_q_ppm(qdp.reshape(-1, 16, nq, nk).swapaxes(0, 0),
                       dp1, dp2, alg=alg)
    # XLA path wants [..., Q, k]: reshape T layout accordingly
    E = qdp.shape[0]
    want = remap_q_ppm(qdp.reshape(E, 16, nq, nk), dp1, dp2, alg=alg)
    np.testing.assert_allclose(
        np.asarray(got).reshape(E, 16, nq, nk), np.asarray(want),
        rtol=1e-12, atol=1e-13)


def test_kernel_conserves_and_heavy_deform():
    # strong deformation and rough fields
    qdp, dp1, dp2, nq, nk = _problem(7, deform=0.33)
    E = qdp.shape[0]
    got = remap_q_ppm_pallas_t(qdp, dp1, dp2, interpret=True)
    # within the supported +-2-cell range the kernel must match the
    # unbounded general path ...
    import jax.numpy as jnp
    pio = jnp.concatenate([jnp.zeros((E, 16, 1)),
                           jnp.cumsum(dp1, -1)], -1)
    pin = jnp.concatenate([jnp.zeros((E, 16, 1)),
                           jnp.cumsum(dp2, -1)], -1)
    pio_s = jnp.concatenate([pio, pio[..., -1:] + 1], -1)
    cnt = (pio_s[..., None, :] <= pin[..., 1:][..., :, None]).sum(-1)
    disp = jnp.minimum(cnt, nk) - 1 - jnp.arange(nk)
    assert int(jnp.abs(disp).max()) <= 2, "test exceeds design range"
    gen = remap_q_ppm_general(qdp.reshape(E, 16, nq, nk), dp1, dp2)
    np.testing.assert_allclose(
        np.asarray(got).reshape(E, 16, nq, nk), np.asarray(gen),
        rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(got.reshape(E, 16, nq, nk).sum(-1)),
        np.asarray(qdp.reshape(E, 16, nq, nk).sum(-1)), rtol=1e-12)


def test_kernel_matches_fast_path_beyond_range():
    # past +-2 cells both bounded implementations truncate identically
    qdp, dp1, dp2, nq, nk = _problem(7, deform=0.6)
    E = qdp.shape[0]
    got = remap_q_ppm_pallas_t(qdp, dp1, dp2, interpret=True)
    fast = remap_q_ppm(qdp.reshape(E, 16, nq, nk), dp1, dp2)
    np.testing.assert_allclose(
        np.asarray(got).reshape(E, 16, nq, nk), np.asarray(fast),
        rtol=1e-12, atol=1e-13)


def test_kernel_identity_when_grids_equal():
    qdp, dp1, _, nq, nk = _problem(3)
    E = qdp.shape[0]
    got = remap_q_ppm_pallas_t(qdp, dp1, dp1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(qdp),
                               rtol=1e-12, atol=1e-13)
