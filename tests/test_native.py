"""Native (C++) grid-table builder vs numpy fallback: identical output.

The native path (transport_se_tpu/native/gridtables.cpp) and the numpy
fallback in grid/cubesphere.py must produce bit-identical tables — gid
numbering is canonicalized by first occurrence in both.
"""

import os

import numpy as np
import pytest

from transport_se_tpu import native
from transport_se_tpu.grid import cubesphere


@pytest.mark.parametrize("ne", [2, 5])
def test_native_matches_numpy(ne, monkeypatch):
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    g_native = cubesphere.build_grid(ne)

    monkeypatch.setenv("TRANSPORT_SE_NO_NATIVE", "1")
    g_py = cubesphere.build_grid(ne)

    np.testing.assert_array_equal(g_native.gid, g_py.gid)
    np.testing.assert_array_equal(g_native.part_idx, g_py.part_idx)
    np.testing.assert_array_equal(g_native.part_mask, g_py.part_mask)
    np.testing.assert_array_equal(g_native.nbr, g_py.nbr)
    np.testing.assert_array_equal(g_native.uniq_src, g_py.uniq_src)
    np.testing.assert_array_equal(g_native.col_of_gid, g_py.col_of_gid)
    assert g_native.ngid == g_py.ngid


def test_canonical_gid_numbering():
    g = cubesphere.build_grid(3)
    # first-occurrence canonicalization: the owner slot of gid g holds g,
    # and owners are strictly increasing
    gid_flat = g.gid.reshape(-1)
    np.testing.assert_array_equal(gid_flat[g.uniq_src],
                                  np.arange(g.ngid))
    assert (np.diff(g.uniq_src) > 0).all()
    # every slot's gid appeared first at or before it
    first_seen = np.minimum.accumulate(g.uniq_src[gid_flat])
    assert (g.uniq_src[gid_flat] <= np.arange(gid_flat.size)).all()
