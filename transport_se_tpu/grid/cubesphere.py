"""Equiangular cubed-sphere grid, SE metric terms, and DSS assembly tables.

TPU-native re-design of the reference grid stack (reference:
src/share/cube_mod.F90 `CubeTopology`/`cube_init_atomic`/`metric_atomic`,
src/share/mass_matrix_mod.F90 `mass_matrix`, src/share/dof_mod.F90
`global_dof`/`CreateUniqueIndex`).  Everything is host-side numpy, batched
over elements as flat arrays [E, np, np, ...] — no element objects.

Design differences from the reference (intentional, TPU-first):

* Inter-element connectivity is NOT described by edge pack/unpack buffers and
  communication schedules.  Instead we build, once, a *partner table*: for
  every (element, GLL point) slot, the (up to 3) other slots that hold the
  same physical grid point.  Direct stiffness summation (DSS) then becomes
  three masked gathers + adds, which XLA vectorizes over (level, tracer)
  batch dimensions (cf. reference edge_mod.F90:366 `edgeVpack`,
  :648 `edgeVunpack`, bndry_mod.F90:21 `bndry_exchangeV`).
* Point identity is established geometrically (union-find over quantized
  unit-sphere coordinates with dual-offset quantization, provably robust for
  tolerance << grid spacing) instead of replicating the cube edge-orientation
  bookkeeping (cube_mod.F90:2346 `CubeSetupEdgeIndex`, edge reversal flags),
  which the survey flags as the classic failure mode.

Face conventions match the reference (coordinate_systems_mod.F90:404-498):
faces 1-4 around the equator starting at lon=0 (face 1 at +X), face 5 south
(-Z), face 6 north (+Z); each face carries equiangular coordinates
(x1, x2) in [-pi/4, pi/4].
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import DD_PI
from .quadrature import gll_points_weights, gll_derivative_matrix
from .sfc import gilbert_curve

NP = 4  # GLL points per element edge (reference is compiled with NP=4)

__all__ = ["Grid", "build_grid", "NP"]


# --------------------------------------------------------------------------
# face geometry
# --------------------------------------------------------------------------

def face_to_xyz(face: np.ndarray, a: np.ndarray, b: np.ndarray):
    """Unit-sphere 3D coordinates from equiangular face coords (a, b).

    Directions per face (derived from coordinate_systems_mod.F90:616-647
    `cart2cubedsphere`):
      f1: ( 1,  ta,  tb)   f2: (-ta,  1,  tb)   f3: (-1, -ta,  tb)
      f4: ( ta, -1,  tb)   f5: ( tb,  ta, -1)   f6: (-tb,  ta,  1)
    """
    ta, tb = np.tan(a), np.tan(b)
    one = np.ones_like(ta)
    X = np.where(face == 1, one, 0) + np.where(face == 2, -ta, 0) \
        + np.where(face == 3, -one, 0) + np.where(face == 4, ta, 0) \
        + np.where(face == 5, tb, 0) + np.where(face == 6, -tb, 0)
    Y = np.where(face == 1, ta, 0) + np.where(face == 2, one, 0) \
        + np.where(face == 3, -ta, 0) + np.where(face == 4, -one, 0) \
        + np.where(face == 5, ta, 0) + np.where(face == 6, ta, 0)
    Z = np.where(face <= 4, tb, 0) + np.where(face == 5, -one, 0) \
        + np.where(face == 6, one, 0)
    r = np.sqrt(X * X + Y * Y + Z * Z)
    return X / r, Y / r, Z / r


def face_to_lonlat(face, a, b):
    """lon in [0, 2pi), lat — matches cart2spherical conventions."""
    X, Y, Z = face_to_xyz(face, a, b)
    lon = np.arctan2(Y, X)
    lon = np.where(lon < 0, lon + 2 * DD_PI, lon)
    lat = np.arcsin(np.clip(Z, -1.0, 1.0))
    return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)


def _vmap_D(face, x1, x2):
    """Gnomonic map Jacobian: sphere components of the contravariant basis.

    Re-derivation of the equiangular gnomonic projection Jacobian
    (cf. cube_mod.F90:658 `vmap`).  Rows: (zonal, meridional); columns:
    (d/dx1, d/dx2).  Arrays broadcast; x1, x2 in face-local [-pi/4, pi/4].
    """
    t1, t2 = np.tan(x1), np.tan(x2)
    r2 = 1.0 + t1 * t1 + t2 * t2
    r = np.sqrt(r2)
    c1, c2 = np.cos(x1), np.cos(x2)
    D = np.zeros(np.broadcast(x1, x2).shape + (2, 2), dtype=np.float64)

    eq = face <= 4
    # equatorial faces (vmap face 1-4 branch)
    D11_eq = 1.0 / (r * c1)
    D21_eq = -t1 * t2 / (c1 * r2)
    D22_eq = 1.0 / (r2 * c1 * c2 * c2)

    pol = np.sqrt(t1 * t1 + t2 * t2)
    pol_safe = np.where(pol == 0, 1.0, pol)
    # north pole (face 6 branch)
    D11_n = -t2 / (pol_safe * c1 * c1 * r)
    D12_n = t1 / (pol_safe * c2 * c2 * r)
    D21_n = -t1 / (pol_safe * c1 * c1 * r2)
    D22_n = -t2 / (pol_safe * c2 * c2 * r2)
    # south pole (face 5 branch): all four entries flip sign
    D11_s, D12_s, D21_s, D22_s = -D11_n, -D12_n, -D21_n, -D22_n

    at_pole = pol == 0
    D[..., 0, 0] = np.where(eq, D11_eq,
                            np.where(at_pole, 1.0,
                                     np.where(face == 6, D11_n, D11_s)))
    D[..., 0, 1] = np.where(eq, 0.0,
                            np.where(at_pole, 0.0,
                                     np.where(face == 6, D12_n, D12_s)))
    D[..., 1, 0] = np.where(eq, D21_eq,
                            np.where(at_pole, 0.0,
                                     np.where(face == 6, D21_n, D21_s)))
    D[..., 1, 1] = np.where(eq, D22_eq,
                            np.where(at_pole, 1.0,
                                     np.where(face == 6, D22_n, D22_s)))
    return D


# --------------------------------------------------------------------------
# grid container
# --------------------------------------------------------------------------

@dataclasses.dataclass
class Grid:
    """All static per-element data, flat over elements in SFC order."""
    ne: int
    nelem: int                 # E = 6 * ne^2
    face: np.ndarray           # [E] int, 1..6
    ex: np.ndarray             # [E] element x-index within face
    ey: np.ndarray             # [E]
    lon: np.ndarray            # [E, NP, NP]
    lat: np.ndarray            # [E, NP, NP]
    D: np.ndarray              # [E, NP, NP, 2, 2]  contra->sphere
    Dinv: np.ndarray           # [E, NP, NP, 2, 2]  sphere->contra
    metdet: np.ndarray         # [E, NP, NP]
    rmetdet: np.ndarray        # [E, NP, NP]
    mp: np.ndarray             # [E, NP, NP]   GLL weights outer product
    spheremp: np.ndarray       # [E, NP, NP]   mp * metdet
    rspheremp: np.ndarray      # [E, NP, NP]   1 / DSS(spheremp)
    gll_w: np.ndarray          # [NP]
    gll_x: np.ndarray          # [NP]
    deriv: np.ndarray          # [NP, NP]  deriv[l,i] = ell_i'(x_l)
    gid: np.ndarray            # [E, NP, NP] int32 global point id
    ngid: int                  # number of unique points (= ncol)
    part_idx: np.ndarray       # [E*16, 3] int32 flat partner slots
    part_mask: np.ndarray      # [E*16, 3] bool
    nbr: np.ndarray            # [E, 9] int32 neighbor elements (self first,
                               #        padded with self)
    uniq_src: np.ndarray       # [ncol] int64 flat (e*16+slot) owner per gid
    col_of_gid: np.ndarray     # [ngid] int64 history column index per gid
    alpha: float               # area renormalization factor

    @property
    def np(self):
        return NP


# --------------------------------------------------------------------------
# point identification (union-find over quantized coordinates)
# --------------------------------------------------------------------------

def _union_find_gids(xyz: np.ndarray, quantum: float) -> np.ndarray:
    """Group rows of xyz [N,3] that coincide within << quantum.

    Two quantization passes (offset by 0 and quantum/2) guarantee that any
    two points closer than ~quantum/4 share a key in at least one pass, while
    points farther than 2*quantum never do.
    """
    n = xyz.shape[0]
    parent = np.arange(n, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    def union_groups(keys):
        order = np.lexsort(keys.T)
        k = keys[order]
        same = np.all(k[1:] == k[:-1], axis=1)
        for a, b in zip(order[:-1][same], order[1:][same]):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

    q = quantum
    for offset in (0.0, 0.5 * q):
        keys = np.floor((xyz + offset) / q).astype(np.int64)
        union_groups(keys)

    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    _, gid = np.unique(roots, return_inverse=True)
    return gid.astype(np.int32)


def _dss_sum_np(x: np.ndarray, gid_flat: np.ndarray, ngid: int) -> np.ndarray:
    """Host-side DSS: scatter-add by gid, gather back (numpy, any [N] x)."""
    acc = np.zeros(ngid, dtype=x.dtype)
    np.add.at(acc, gid_flat, x)
    return acc[gid_flat]


# --------------------------------------------------------------------------
# grid construction
# --------------------------------------------------------------------------

def build_grid(ne: int) -> Grid:
    """Build the full grid for 6*ne^2 elements (cf. prim_init1 call stack)."""
    E = 6 * ne * ne
    gx, gw = gll_points_weights(NP)
    deriv = gll_derivative_matrix(NP)

    # --- element ordering: face-major, gilbert SFC within each face
    curve = gilbert_curve(ne, ne)                       # [ne*ne, 2]
    face = np.repeat(np.arange(1, 7), ne * ne)
    ex = np.tile(curve[:, 0], 6)
    ey = np.tile(curve[:, 1], 6)

    # --- GLL point face coordinates, in longdouble for cross-face matching
    delta = np.longdouble(DD_PI) / (2 * ne)             # element angular size
    half = np.longdouble(DD_PI) / 4
    gx_ld = np.asarray(gx, dtype=np.longdouble)
    # a[e, i] = -pi/4 + delta*(ex + (x_i+1)/2)
    a = (-half + delta * (ex[:, None] + (gx_ld[None, :] + 1) / 2))
    b = (-half + delta * (ey[:, None] + (gx_ld[None, :] + 1) / 2))
    A = np.broadcast_to(a[:, :, None], (E, NP, NP))     # x1 varies with i
    B = np.broadcast_to(b[:, None, :], (E, NP, NP))     # x2 varies with j
    F = face[:, None, None]

    Xl, Yl, Zl = face_to_xyz(F, A, B)
    xyz = np.stack([np.asarray(Xl, dtype=np.float64),
                    np.asarray(Yl, dtype=np.float64),
                    np.asarray(Zl, dtype=np.float64)], axis=-1)

    lon, lat = face_to_lonlat(F, np.asarray(A, np.float64),
                              np.asarray(B, np.float64))

    # --- global point ids.  Min distinct-point chord distance is
    # ~0.276*delta; use quantum far below that and far above the longdouble
    # trig noise (~1e-18).
    quantum = min(1e-7, float(delta) * 1e-4)
    gid = _union_find_gids(xyz.reshape(-1, 3), quantum).reshape(E, NP, NP)
    ngid = int(gid.max()) + 1
    expected = 6 * (ne * (NP - 1)) ** 2 + 2
    if ngid != expected:
        raise RuntimeError(
            f"grid point identification failed: {ngid} unique points, "
            f"expected {expected}")

    # --- partner table: for each flat slot, other slots with the same gid
    gid_flat = gid.reshape(-1)
    order = np.argsort(gid_flat, kind="stable")
    sorted_gid = gid_flat[order]
    starts = np.searchsorted(sorted_gid, np.arange(ngid))
    ends = np.searchsorted(sorted_gid, np.arange(ngid), side="right")
    max_mult = int((ends - starts).max())
    if max_mult > 4:
        raise RuntimeError(f"point multiplicity {max_mult} > 4")
    part_idx = np.tile(np.arange(E * NP * NP, dtype=np.int64)[:, None], (1, 3))
    part_mask = np.zeros((E * NP * NP, 3), dtype=bool)
    for g in range(ngid):
        mem = order[starts[g]:ends[g]]
        for pos, s in enumerate(mem):
            others = [m for m in mem if m != s]
            for c, o in enumerate(others):
                part_idx[s, c] = o
                part_mask[s, c] = True
    part_idx = part_idx.astype(np.int32)

    # --- unique-point owner: first flat slot per gid, columns ordered by
    # owner slot (analog of dof_mod.F90:322 CreateUniqueIndex)
    firsts = order[starts]  # stable sort => min flat slot per gid
    uniq_src = np.sort(firsts)
    col_of_gid = np.empty(ngid, dtype=np.int64)
    col_of_gid[gid_flat[uniq_src]] = np.arange(ngid)

    # --- element neighbor table (elements sharing >= 1 point, self first)
    elem_of_slot = np.arange(E * NP * NP) // (NP * NP)
    nbr_sets = [set() for _ in range(E)]
    for g in range(ngid):
        mem = order[starts[g]:ends[g]]
        es = {int(elem_of_slot[m]) for m in mem}
        if len(es) > 1:
            for e in es:
                nbr_sets[e].update(es - {e})
    max_nbr = max(len(s) for s in nbr_sets)
    nbr = np.tile(np.arange(E, dtype=np.int32)[:, None], (1, 1 + 8))
    for e, s in enumerate(nbr_sets):
        lst = sorted(s)
        nbr[e, 1:1 + len(lst)] = lst
    if max_nbr > 8:
        raise RuntimeError(f"element has {max_nbr} neighbors > 8")

    # --- metric, two passes with area renormalization
    # (cf. metric_atomic cube_mod.F90:241 and prim_init1 area correction
    #  prim_driver_mod.F90:265-283)
    Af = np.asarray(A, dtype=np.float64)
    Bf = np.asarray(B, dtype=np.float64)
    Jhalf = float(delta) / 2.0          # bilinear ref->face Jacobian (square)
    Dv = _vmap_D(F, Af, Bf)             # [E,NP,NP,2,2]
    D = Dv * Jhalf
    detD = D[..., 0, 0] * D[..., 1, 1] - D[..., 0, 1] * D[..., 1, 0]
    metdet = np.abs(detD)

    mp = np.asarray(gw)[:, None] * np.asarray(gw)[None, :]
    mp = np.broadcast_to(mp, (E, NP, NP)).copy()

    # area correction: deterministic, math.fsum over all element integrals
    import math
    area = math.fsum((mp * metdet).reshape(-1).tolist())
    alpha = 4 * DD_PI / area

    D = D * np.sqrt(alpha)
    detD = detD * alpha
    metdet = metdet * alpha
    rmetdet = 1.0 / metdet
    Dinv = np.empty_like(D)
    Dinv[..., 0, 0] = D[..., 1, 1] / detD
    Dinv[..., 0, 1] = -D[..., 0, 1] / detD
    Dinv[..., 1, 0] = -D[..., 1, 0] / detD
    Dinv[..., 1, 1] = D[..., 0, 0] / detD

    spheremp = mp * metdet
    dss_sp = _dss_sum_np(spheremp.reshape(-1), gid_flat, ngid)
    rspheremp = (1.0 / dss_sp).reshape(E, NP, NP)

    return Grid(
        ne=ne, nelem=E, face=face, ex=ex, ey=ey, lon=lon, lat=lat,
        D=D, Dinv=Dinv, metdet=metdet, rmetdet=rmetdet, mp=mp,
        spheremp=spheremp, rspheremp=rspheremp,
        gll_w=np.asarray(gw), gll_x=np.asarray(gx), deriv=deriv,
        gid=gid, ngid=ngid, part_idx=part_idx, part_mask=part_mask,
        nbr=nbr, uniq_src=uniq_src, col_of_gid=col_of_gid,
        alpha=float(alpha),
    )
