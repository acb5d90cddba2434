"""Communication self-test: the `testchecksum` harness (SURVEY §4.2).

The reference validates new schedules/edge buffers by packing an analytic
pattern, exchanging, and comparing the unpacked sums against independently
computed expected values (src/checksum_mod.F90:21-341).  Here the same idea
validates every DSS implementation (gather tables, segment-sum, T layout,
sharded halo exchange) against a brute-force numpy assembly computed purely
from the geometric point identification.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transport_se_tpu.grid.cubesphere import build_grid
from transport_se_tpu.ops.dss import DssTables
from transport_se_tpu.parallel.halo import build_shard_plan
from transport_se_tpu.parallel.sharded import make_mesh


@pytest.fixture(scope="module")
def grid():
    return build_grid(3)


def _pattern(grid, nlyr=3):
    """Analytic per-slot pattern: value encodes (element, slot, layer)."""
    E = grid.nelem
    e = np.arange(E)[:, None, None, None]
    s = np.arange(16).reshape(1, 1, 4, 4)
    l = np.arange(nlyr)[None, :, None, None]
    return (np.sin(0.1 * e + 1.0) * (s + 1) + 100.0 * l).astype(np.float64)


def _expected(grid, x):
    """Brute-force DSS from the gid map alone (independent of tables)."""
    E = grid.nelem
    nlyr = x.shape[1]
    gid = grid.gid.reshape(-1)
    out = np.empty_like(x)
    for layer in range(nlyr):
        flat = x[:, layer].reshape(-1)
        acc = np.zeros(grid.ngid)
        np.add.at(acc, gid, flat)
        out[:, layer] = acc[gid].reshape(E, 4, 4)
    return out


def test_checksum_gather_tables(grid):
    x = _pattern(grid)
    want = _expected(grid, x)
    t = DssTables.from_grid(grid, mode="gather")
    got = np.asarray(t.dss_sum(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-14)


def test_checksum_segsum(grid):
    x = _pattern(grid)
    want = _expected(grid, x)
    t = DssTables.from_grid(grid, mode="segsum")
    got = np.asarray(t.dss_sum(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-14)


def test_checksum_t_layout(grid):
    x = _pattern(grid)
    want = _expected(grid, x)
    E = grid.nelem
    xt = jnp.moveaxis(jnp.asarray(x).reshape(E, -1, 16), -1, 1)
    for mode in ("gather", "segsum"):
        t = DssTables.from_grid(grid, mode=mode)
        got_t = np.asarray(t.dss_sum_t(xt))
        got = np.moveaxis(got_t, 1, -1).reshape(x.shape)
        np.testing.assert_allclose(got, want, rtol=1e-14,
                                   err_msg=f"mode={mode}")


def test_checksum_sharded_halo(grid):
    """The ppermute halo-exchange DSS reproduces the brute-force assembly
    on a 6-shard mesh (one shard per cube face at ne=3)."""
    from transport_se_tpu.parallel.halo import ShardedDssTables

    x = _pattern(grid)
    want = _expected(grid, x)
    S = 6
    mesh = make_mesh(jax.devices()[:S])
    plan = build_shard_plan(grid, S)
    from jax.sharding import PartitionSpec as P

    tabs = dict(send_elem=jnp.asarray(plan.send_elem),
                send_mask=jnp.asarray(plan.send_mask),
                recv_slot=jnp.asarray(plan.recv_slot),
                recv_mask=jnp.asarray(plan.recv_mask),
                part_idx=jnp.asarray(plan.part_idx),
                part_mask=jnp.asarray(plan.part_mask),
                nbr=jnp.asarray(plan.nbr))

    def body(xs, tabs_l):
        t = ShardedDssTables(
            axis_name="e", eloc=plan.eloc, nhalo=plan.nhalo,
            perms=plan.perms, **{k: v[0] for k, v in tabs_l.items()})
        return t.dss_sum(xs)

    smapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("e"), {k: P("e") for k in tabs}),
        out_specs=P("e"), check_vma=False)
    got = np.asarray(smapped(jnp.asarray(x), tabs))
    np.testing.assert_allclose(got, want, rtol=1e-14)
