"""Grid/metric/DSS-table checks (reference startup self-check analogs:
global_norms_mod.F90:96 `test_global_integral`, metric identities)."""

import numpy as np
import pytest

from transport_se_tpu.constants import DD_PI
from transport_se_tpu.grid.cubesphere import build_grid, face_to_lonlat
from transport_se_tpu.grid.sfc import gilbert_curve


@pytest.fixture(scope="module")
def grid():
    return build_grid(4)


def test_sphere_area(grid):
    # DSS-assembled sphere area == 4*pi to roundoff after renormalization
    area = grid.spheremp.sum()
    assert abs(area / (4 * DD_PI) - 1) < 1e-14


def test_unique_point_count(grid):
    ne = grid.ne
    assert grid.ngid == 6 * (3 * ne) ** 2 + 2


def test_point_multiplicity(grid):
    # interior points unshared; edges 2; corners 4 except 8 cube vertices (3)
    mult = grid.part_mask.sum(axis=1) + 1
    mult = mult.reshape(grid.nelem, 4, 4)
    assert (mult[:, 1:3, 1:3] == 1).all()
    assert (mult[:, 1:3, 0] == 2).all() and (mult[:, 0, 1:3] == 2).all()
    corners = mult[:, [0, 0, 3, 3], [0, 3, 0, 3]]
    assert set(np.unique(corners)) <= {3, 4}
    assert (corners == 3).sum() == 8 * 3  # 8 cube vertices x 3 elements


def test_partner_symmetry(grid):
    # if b is a partner of a, then a is a partner of b
    E16 = grid.nelem * 16
    pairs = set()
    for s in range(E16):
        for c in range(3):
            if grid.part_mask[s, c]:
                pairs.add((s, int(grid.part_idx[s, c])))
    for a, b in pairs:
        assert (b, a) in pairs


def test_metric_identities(grid):
    # Dinv is the exact inverse of D; metdet = |det D|
    D = grid.D
    I = np.einsum('...ab,...bc->...ac', D, grid.Dinv)
    eye = np.broadcast_to(np.eye(2), I.shape)
    assert np.abs(I - eye).max() < 1e-13
    det = D[..., 0, 0] * D[..., 1, 1] - D[..., 0, 1] * D[..., 1, 0]
    assert np.abs(np.abs(det) - grid.metdet).max() < 1e-15


def test_coordinates_on_sphere(grid):
    # lat/lon consistent across faces: shared points have identical coords
    flat_lon = grid.lon.reshape(-1)
    flat_lat = grid.lat.reshape(-1)
    gid = grid.gid.reshape(-1)
    x = np.cos(flat_lat) * np.cos(flat_lon)
    y = np.cos(flat_lat) * np.sin(flat_lon)
    z = np.sin(flat_lat)
    for arr in (x, y, z):
        by_gid_min = np.full(grid.ngid, np.inf)
        by_gid_max = np.full(grid.ngid, -np.inf)
        np.minimum.at(by_gid_min, gid, arr)
        np.maximum.at(by_gid_max, gid, arr)
        assert np.abs(by_gid_max - by_gid_min).max() < 1e-12


def test_neighbor_table(grid):
    # every element has 8 neighbors except those at cube vertices (7)
    counts = np.array([len(set(row) - {e}) for e, row in enumerate(grid.nbr)])
    assert set(np.unique(counts)) <= {7, 8}
    n7 = (counts == 7).sum()
    assert n7 == 8 * 3  # 3 elements at each of 8 cube vertices


def test_gilbert_curve_covers_and_is_contiguous():
    for w, h in [(4, 4), (8, 8), (30, 30), (5, 3)]:
        c = gilbert_curve(w, h)
        assert len({(int(a), int(b)) for a, b in c}) == w * h
        d = np.abs(np.diff(c, axis=0)).sum(axis=1)
        assert (d == 1).all()  # every step is a unit move


def test_lonlat_matches_known_points():
    # center of face 1 is (lon=0, lat=0); face 6 center is the north pole
    lon, lat = face_to_lonlat(np.array(1), np.array(0.0), np.array(0.0))
    assert abs(lon) < 1e-15 and abs(lat) < 1e-15
    lon2, lat2 = face_to_lonlat(np.array(2), np.array(0.0), np.array(0.0))
    assert abs(lon2 - DD_PI / 2) < 1e-15
    _, lat6 = face_to_lonlat(np.array(6), np.array(0.0), np.array(0.0))
    assert abs(lat6 - DD_PI / 2) < 1e-15
