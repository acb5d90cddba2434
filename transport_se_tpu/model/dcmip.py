"""DCMIP-2012 test-case 1-1 / 1-2 analytic fields, evaluated on device.

Closed-form jnp re-implementations of the prescribed winds and initial
tracers (reference: src/share/dcmip_123_mod.F90:85
`test1_advection_deformation`, :279 `test1_advection_hadley`; wrapper
conventions from src/share/dcmip_wrapper_mod.F90:49,106).

Wrapper conventions preserved exactly (they affect the published norms):
* midpoint height z_m = H*log(1/etam(k)); since zcoords=1 the pressure used
  by the formulas is p = p0*exp(-z/H) = p0*etam(k) (dcmip_wrapper_mod:69-70);
* interface pressure p_i = p0*etai(k), so dp3d(k) = p0*(etai(k+1)-etai(k))
  and, because ps == p0 at all times in these tests, the layer thickness
  seen by the tracer scheme is constant in time and space;
* 'extra' tracers are a checkerboard sign(sin(9*lon)*sin(9*lat)) pattern
  (dcmip_wrapper_mod:215-243): dcmip1-1 fills tracers 5..qsize, dcmip1-2
  fills tracer 1 and tracers 3..qsize (1-based).

Everything is batched: lon/lat are [E, np, np]; level coordinates are [K];
outputs carry [E, K, ...] with level axis second.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import DD_PI as PI, G, P0, RGAS, REARTH, SCALE_HEIGHT, T0

SECPDAY = 86400.0

# ---- test 1-1 parameters (dcmip_123_mod.F90:116-129)
TAU_11 = 12.0 * SECPDAY
U0_11 = 2.0 * PI * REARTH / TAU_11
K0_11 = 10.0 * REARTH / TAU_11
OMEGA0_11 = 23000.0 * PI / TAU_11
RR_11 = 0.5
ZZ_11 = 1000.0
Z0_11 = 5000.0
LAMBDA0_11 = 5.0 * PI / 6.0
LAMBDA1_11 = 7.0 * PI / 6.0
BS_11 = 0.2
ZTOP_11 = 12000.0

# ---- test 1-2 parameters (dcmip_123_mod.F90:309-319)
TAU_12 = 1.0 * SECPDAY
U0_12 = 40.0
W0_12 = 0.15
K_12 = 5.0
Z1_12 = 2000.0
Z2_12 = 5000.0
Z0_12 = 0.5 * (Z1_12 + Z2_12)
ZTOP_12 = 12000.0


def _bcast(lon, lat, eta):
    """lon/lat [E,n,n], eta [K] -> broadcastable [E,K,n,n] pieces."""
    lon = lon[:, None, :, :]
    lat = lat[:, None, :, :]
    eta = eta[None, :, None, None]
    return lon, lat, eta


# ---------------------------------------------------------------------------
# test 1-1: 3D deformational flow
# ---------------------------------------------------------------------------

def winds_11(lon, lat, etam, time):
    """Horizontal winds (zonal, meridional) -> [E, K, 2, n, n]."""
    lon, lat, eta = _bcast(lon, lat, etam)
    dtype = lon.dtype
    p = P0 * eta
    ptop = P0 * jnp.exp(jnp.asarray(-ZTOP_11 / SCALE_HEIGHT, dtype))
    plim = jnp.maximum(p, ptop)

    lonp = lon - 2.0 * PI * time / TAU_11
    cos2t = jnp.cos(2.0 * PI * time / TAU_11)
    cost = jnp.cos(PI * time / TAU_11)

    bsp = BS_11 * ptop
    ud = (OMEGA0_11 * REARTH / bsp) * jnp.cos(lonp) * jnp.cos(lat) ** 2 \
        * cos2t * (-jnp.exp((plim - P0) / bsp) + jnp.exp((ptop - plim) / bsp))
    u = (K0_11 * jnp.sin(lonp) ** 2 * jnp.sin(2.0 * lat) * cost
         + U0_11 * jnp.cos(lat) + ud)
    v = K0_11 * jnp.sin(2.0 * lonp) * jnp.cos(lat) * cost
    return jnp.stack(jnp.broadcast_arrays(u, v), axis=2)


def eta_dot_dpdn_11(lon, lat, etai, time):
    """-g*rho*w at interfaces -> [E, K+1, n, n] (diagnostic only here)."""
    lon, lat, eta = _bcast(lon, lat, etai)
    p = P0 * eta
    ptop = P0 * jnp.exp(jnp.asarray(-ZTOP_11 / SCALE_HEIGHT, lon.dtype))
    plim = jnp.maximum(p, ptop)
    lonp = lon - 2.0 * PI * time / TAU_11
    cos2t = jnp.cos(2.0 * PI * time / TAU_11)
    bsp = BS_11 * ptop
    s = (1.0 + jnp.exp((ptop - P0) / bsp) - jnp.exp((plim - P0) / bsp)
         - jnp.exp((ptop - plim) / bsp))
    w = -((RGAS * T0) / (G * plim)) * OMEGA0_11 * jnp.sin(lonp) \
        * jnp.cos(lat) * cos2t * s
    rho = p / (RGAS * T0)
    return jnp.broadcast_to(-G * rho * w, lon.shape[:1] + (eta.shape[1],)
                            + lon.shape[2:])


def tracers_11(lon, lat, etam):
    """Initial tracers q1..q4 -> [E, 4, K, n, n]."""
    lon, lat, eta = _bcast(lon, lat, etam)
    height = SCALE_HEIGHT * jnp.log(1.0 / eta)

    sin_tmp = jnp.sin(lat) * jnp.sin(0.0)
    cos_tmp = jnp.cos(lat) * jnp.cos(0.0)
    r1 = jnp.arccos(jnp.clip(sin_tmp + cos_tmp * jnp.cos(lon - LAMBDA0_11),
                             -1.0, 1.0))
    r2 = jnp.arccos(jnp.clip(sin_tmp + cos_tmp * jnp.cos(lon - LAMBDA1_11),
                             -1.0, 1.0))
    zdev = ((height - Z0_11) / ZZ_11) ** 2
    d1 = jnp.minimum(1.0, (r1 / RR_11) ** 2 + zdev)
    d2 = jnp.minimum(1.0, (r2 / RR_11) ** 2 + zdev)

    q1 = 0.5 * (1.0 + jnp.cos(PI * d1)) + 0.5 * (1.0 + jnp.cos(PI * d2))
    q2 = 0.9 - 0.8 * q1 ** 2
    q3 = jnp.where((d1 <= RR_11) | (d2 <= RR_11), 1.0, 0.1)
    q3 = jnp.where((height > Z0_11) & (jnp.abs(lat) < 0.125), 0.1, q3)
    q3 = jnp.broadcast_to(q3, q1.shape)
    q4 = 1.0 - 0.3 * (q1 + q2 + q3)
    return jnp.stack([q1, q2, q3, q4], axis=1)


# ---------------------------------------------------------------------------
# test 1-2: Hadley-like meridional circulation
# ---------------------------------------------------------------------------

def winds_12(lon, lat, etam, time):
    lon, lat, eta = _bcast(lon, lat, etam)
    dtype = lon.dtype
    height = SCALE_HEIGHT * jnp.log(1.0 / eta)
    p = P0 * eta
    ptop = P0 * jnp.exp(jnp.asarray(-ZTOP_12 / SCALE_HEIGHT, dtype))
    rho_ratio = P0 / jnp.maximum(p, ptop)          # rho0/rho

    u = U0_12 * jnp.cos(lat)
    hstar = jnp.minimum(height / ZTOP_12, 1.0)
    v = -rho_ratio * (REARTH * W0_12 * PI) / (K_12 * ZTOP_12) \
        * jnp.cos(lat) * jnp.sin(K_12 * lat) * jnp.cos(PI * hstar) \
        * jnp.cos(PI * time / TAU_12)
    return jnp.stack(jnp.broadcast_arrays(u, v), axis=2)


def eta_dot_dpdn_12(lon, lat, etai, time):
    lon, lat, eta = _bcast(lon, lat, etai)
    height = SCALE_HEIGHT * jnp.log(1.0 / eta)
    p = P0 * eta
    ptop = P0 * jnp.exp(jnp.asarray(-ZTOP_12 / SCALE_HEIGHT, lon.dtype))
    rho = jnp.maximum(p, ptop) / (RGAS * T0)
    rho0 = P0 / (RGAS * T0)
    hstar = jnp.minimum(height / ZTOP_12, 1.0)
    w = (rho0 / rho) * (W0_12 / K_12) \
        * (-2.0 * jnp.sin(K_12 * lat) * jnp.sin(lat)
           + K_12 * jnp.cos(lat) * jnp.cos(K_12 * lat)) \
        * jnp.sin(PI * hstar) * jnp.cos(PI * time / TAU_12)
    out = -G * rho * w
    return jnp.broadcast_to(out, lon.shape[:1] + (eta.shape[1],)
                            + lon.shape[2:])


def tracer_12(lon, lat, etam):
    """The Hadley layer tracer -> [E, 1, K, n, n]."""
    lon, lat, eta = _bcast(lon, lat, etam)
    height = SCALE_HEIGHT * jnp.log(1.0 / eta)
    q = jnp.where((height < Z2_12) & (height > Z1_12),
                  0.5 * (1.0 + jnp.cos(2.0 * PI * (height - Z0_12)
                                       / (Z2_12 - Z1_12))),
                  0.0)
    q = jnp.broadcast_to(q, lon.shape[:1] + (eta.shape[1],) + lon.shape[2:])
    return q[:, None]


# ---------------------------------------------------------------------------
# shared
# ---------------------------------------------------------------------------

def checkerboard(lon, lat, nlev):
    """sign(sin(9 lon) * sin(9 lat)) >= 0 -> 1 else 0; [E, K, n, n]."""
    term = jnp.sin(9.0 * lon) * jnp.sin(9.0 * lat)
    q2d = jnp.where(term < 0.0, 0.0, 1.0)
    return jnp.broadcast_to(q2d[:, None], q2d.shape[:1] + (nlev,)
                            + q2d.shape[1:])


def initial_tracers(test_case, lon, lat, etam, qsize):
    """Full initial tracer stack [E, qsize, K, n, n] (wrapper semantics)."""
    nlev = etam.shape[0]
    chk = checkerboard(lon, lat, nlev)[:, None]
    if test_case == "dcmip1-1":
        qs = tracers_11(lon, lat, etam)          # tracers 1..4
        extra = [chk] * max(0, qsize - 4)
        q = jnp.concatenate([qs[:, :min(4, qsize)]] + extra, axis=1)
    elif test_case == "dcmip1-2":
        # tracer 1: checkerboard; tracer 2: hadley layer; 3..: checkerboard
        layer = tracer_12(lon, lat, etam)
        parts = [chk, layer] + [chk] * max(0, qsize - 2)
        q = jnp.concatenate(parts[:qsize] if qsize >= 2 else [chk], axis=1)
    else:
        raise ValueError(f"unknown test case {test_case}")
    return q[:, :qsize]


def winds(test_case, lon, lat, etam, time):
    if test_case == "dcmip1-1":
        return winds_11(lon, lat, etam, time)
    elif test_case == "dcmip1-2":
        return winds_12(lon, lat, etam, time)
    raise ValueError(f"unknown test case {test_case}")


def eta_dot_dpdn(test_case, lon, lat, etai, time):
    if test_case == "dcmip1-1":
        return eta_dot_dpdn_11(lon, lat, etai, time)
    elif test_case == "dcmip1-2":
        return eta_dot_dpdn_12(lon, lat, etai, time)
    raise ValueError(f"unknown test case {test_case}")
