"""Face-shift DSS (ops/dss_face.py) vs the partner-table DSS.

The face formulation reassociates sums (direction order instead of partner
order), so sums match to roundoff; min/max match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transport_se_tpu.grid.cubesphere import build_grid
from transport_se_tpu.ops.dss import DssTables


@pytest.fixture(scope="module", params=[2, 4])
def grids(request):
    ne = request.param
    g = build_grid(ne, order="raster")
    return g, DssTables.from_grid(g, mode="gather"), \
        DssTables.from_grid(g, mode="face")


def test_dss_sum_t_matches(grids):
    g, tg, tf = grids
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (g.nelem, 16, 7)))
    a = tg.dss_sum_t(x)
    b = tf.dss_sum_t(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-13)


def test_dss_sum_standard_layout(grids):
    g, tg, tf = grids
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (g.nelem, 3, 5, 4, 4)))
    a = tg.dss_sum(x)
    b = tf.dss_sum(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-13)


def test_dss_multiplicity(grids):
    """DSS of a constant-1 field counts coincident slots: 2 on edges,
    4 at regular corners, 3 at the 8 cube vertices, 1 inside."""
    g, tg, tf = grids
    ones = jnp.ones((g.nelem, 16, 1))
    m = np.asarray(tf.dss_sum_t(ones))[..., 0]
    mg = np.asarray(tg.dss_sum_t(ones))[..., 0]
    np.testing.assert_array_equal(m, mg)
    vals, counts = np.unique(m.reshape(-1), return_counts=True)
    assert set(vals.astype(int)) == {1, 2, 3, 4}
    # exactly 8 cube vertices, each represented by 3 slots
    assert counts[list(vals).index(3.0)] == 24


def test_neighbor_minmax_matches(grids):
    g, tg, tf = grids
    rng = np.random.default_rng(2)
    qmin = jnp.asarray(rng.uniform(-1, 1, (g.nelem, 3, 4)))
    qmax = jnp.asarray(rng.uniform(-1, 1, (g.nelem, 3, 4)))
    a_min, a_max = tg.neighbor_minmax(qmin, qmax)
    b_min, b_max = tf.neighbor_minmax(qmin, qmax)
    np.testing.assert_array_equal(np.asarray(a_min), np.asarray(b_min))
    np.testing.assert_array_equal(np.asarray(a_max), np.asarray(b_max))


def test_raster_grid_equivalence():
    """Raster and gilbert orders hold identical per-element data (the
    order is a permutation; physical content must agree)."""
    gr = build_grid(2, order="raster")
    gg = build_grid(2, order="gilbert")
    # match elements by (face, ex, ey)
    key_r = gr.face * 10000 + gr.ey * 100 + gr.ex
    key_g = gg.face * 10000 + gg.ey * 100 + gg.ex
    pr, pg = np.argsort(key_r), np.argsort(key_g)
    np.testing.assert_allclose(gr.spheremp[pr], gg.spheremp[pg], rtol=1e-15)
    np.testing.assert_allclose(gr.lon[pr], gg.lon[pg], rtol=0, atol=1e-14)
    np.testing.assert_allclose(gr.rspheremp[pr], gg.rspheremp[pg],
                               rtol=1e-15)


def test_neighbor_minmax_pallas_row_blocks(grids, monkeypatch):
    """The Pallas neighbor-minmax kernel with by < ne (several row blocks
    per face) must match the XLA face version across block boundaries
    (rows above/below come from clamped specs + seam strips)."""
    from transport_se_tpu.ops import pallas_dss
    from transport_se_tpu.ops.dss_face import neighbor_minmax_face
    g, tg, tf = grids
    if g.ne < 4:
        pytest.skip("needs ne >= 4 for nr > 1")
    monkeypatch.setattr(pallas_dss, "DSS_BLOCK_CAP", 100000)
    rng = np.random.default_rng(5)
    qmin = jnp.asarray(rng.uniform(-1, 1, (g.nelem, 7)))
    qmax = jnp.asarray(rng.uniform(-1, 1, (g.nelem, 7)))
    assert pallas_dss._pick_by(g.ne, 128) < g.ne
    a_min, a_max = pallas_dss.neighbor_minmax_pallas(qmin, qmax, tf.face)
    b_min, b_max = neighbor_minmax_face(qmin, qmax, tf.face)
    np.testing.assert_array_equal(np.asarray(a_min), np.asarray(b_min))
    np.testing.assert_array_equal(np.asarray(a_max), np.asarray(b_max))


def test_dss_scale_minmax_avg_epilogue(grids):
    """The combined qdp_time_avg + bound-prep epilogue must equal the
    unfused sequence: scale -> (avg + 2x)/3 -> min/max of out/dp (the
    cross-step bound chain gives these bounds to the next tracer step's
    stage 0, whose dp is the static dp0)."""
    g, tg, tf = grids
    rng = np.random.default_rng(7)
    E = g.nelem
    nq, nk = 2, 8
    x = jnp.asarray(rng.uniform(0.5, 2.0, (E, 16, nq * nk)))
    avg = jnp.asarray(rng.uniform(0.5, 2.0, (E, 16, nq * nk)))
    dp = jnp.asarray(rng.uniform(0.5, 2.0, (E, 16, nk)))
    rsp = jnp.asarray(rng.uniform(0.5, 2.0, (E, 16)))
    out, qmn, qmx, _ = tf.dss_scale_minmax_t(x, rsp, dp, nq, avg=avg)
    want = (avg + 2.0 * (tf.dss_sum_t(x) * rsp[:, :, None])) / 3.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-13, atol=1e-13)
    q = np.asarray(want).reshape(E, 16, nq, nk) / np.asarray(dp)[:, :, None]
    np.testing.assert_allclose(np.asarray(qmn),
                               q.min(axis=1).reshape(E, -1),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(np.asarray(qmx),
                               q.max(axis=1).reshape(E, -1),
                               rtol=1e-13, atol=0)
