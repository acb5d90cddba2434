"""repro_sum: bitwise order/shard independence + correct rounding."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from transport_se_tpu.utils import repro_sum, repro_sum_host


def _rand(n, seed, spread):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n)
            * np.exp(rng.uniform(-spread, spread, n))).astype(np.float64)


def _ulps(a, b):
    if a == b:
        return 0
    lo, hi = sorted((a, b))
    n = 0
    while lo < hi and n <= 8:
        lo = math.nextafter(lo, math.inf)
        n += 1
    return n


def test_matches_fsum_within_2ulp():
    for seed, spread in [(0, 1), (1, 10), (2, 20)]:
        x = _rand(10000, seed, spread)
        got = float(repro_sum(jnp.asarray(x)))
        want = math.fsum(x)
        assert _ulps(got, want) <= 2, (got, want, seed)


def test_cancellation():
    # pairs that cancel to a tiny residual: the windows below the max
    # carry it exactly
    x = _rand(5000, 3, 5)
    data = np.concatenate([x, -x, np.full(7, 1e-9)])
    got = float(repro_sum(jnp.asarray(data)))
    assert _ulps(got, math.fsum(data)) <= 2


def test_bitwise_permutation_invariance():
    x = _rand(20000, 4, 12)
    a = float(repro_sum(jnp.asarray(x)))
    rng = np.random.default_rng(5)
    for _ in range(3):
        b = float(repro_sum(jnp.asarray(rng.permutation(x))))
        assert a == b  # bitwise


def test_bitwise_chunked_reduction():
    """Summing int64 window partials of chunks == summing all at once —
    the property that makes any sharding/psum topology give identical
    bits.  Emulated by comparing full-array repro_sum with a reshaped
    two-axis reduction."""
    x = _rand(8192, 6, 8)
    a = float(repro_sum(jnp.asarray(x)))
    b = float(repro_sum(jnp.asarray(x).reshape(64, 128),
                        axis=(0, 1)))
    assert a == b


def test_axis_reduction_shape_and_values():
    x = jnp.asarray(_rand(6 * 5 * 4, 7, 6).reshape(6, 5, 4))
    out = repro_sum(x, axis=(0, 2))
    assert out.shape == (5,)
    for i in range(5):
        want = math.fsum(np.asarray(x[:, i, :], np.float64).ravel())
        assert _ulps(float(out[i]), want) <= 2


def test_host_oracle():
    x = _rand(1000, 8, 15)
    assert repro_sum_host(x) == math.fsum(x)


def test_f32_falls_back():
    x = jnp.asarray(np.ones(10, np.float32))
    assert float(repro_sum(x)) == 10.0


def test_zero_and_empty_columns():
    x = jnp.zeros((4, 3), jnp.float64)
    out = repro_sum(x, axis=0)
    assert out.shape == (3,)
    assert np.all(np.asarray(out) == 0.0)
