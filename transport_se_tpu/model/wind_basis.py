"""Factored prescribed-wind evaluation for the perf (T-layout) pipeline.

The DCMIP 1-1 / 1-2 wind fields (reference: dcmip_123_mod.F90:161-184,
:321-341) separate exactly into sums of

    (2D horizontal field) x (vertical profile) x (scalar function of t)

after expanding the rotating-longitude terms with angle-addition
(sin^2(lon - wt), cos(lon - wt), sin(2(lon - wt))).  Evaluating the raw
formulas per step re-runs trig/exp at the full [E, K, 16] size inside XLA
fusions (~6 ms at NE30); with the basis precomputed at model build, a step
costs a handful of broadcast FMAs (~0.3 ms).

Because divergence and DSS are linear, the same basis yields divdp and the
DSS-projected divdp_proj from precomputed per-term divergence fields —
eliminating the per-step divergence_sphere and one DSS round
(prim_advection_mod.F90:614-623 divdp staging).

Used by the perf path only; the verification (f64) path keeps the direct
formula evaluation in model/dcmip.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..constants import DD_PI as PI, P0, REARTH, SCALE_HEIGHT
from ..ops import sphere_ops as so
from . import dcmip


@dataclasses.dataclass(frozen=True)
class WindBasis:
    """Per-term arrays, all device-resident, T layout.

    Everything is stored as 2D fields x vertical profiles (the divergence
    and the DSS both act per point independently of the lane/level axis,
    so they commute with the outer product) — a few MB total, small
    enough to close over a jit without bloating the HLO.

    u2d/v2d: [T, E, 16]  horizontal coefficient fields
    fk:      [T, K]      vertical profiles
    g2d:     [T, E, 16]  div_sphere of (u2d, v2d)
    gp2d:    [T, E, 16]  DSS-projected (rsp * DSS(sp * g2d))
    prof:    [T, K]      fk * dp0 (the profile of vn0 and of divdp)
    tfns:    scalar time functions, one per term
    dp0:     [K]
    """
    u2d: Any
    v2d: Any
    fk: Any
    g2d: Any
    gp2d: Any
    prof: Any
    tfns: Sequence[Callable]
    dp0: Any

    def eval(self, t):
        """-> (u_t, v_t, un0_t, vn0_t, divdp_t, divdp_proj_t), all
        [E, 16, K]; un0/vn0 include the dp0 weight (the mean-flux vn0).

        Single tensordot contractions over the term axis — a Python
        accumulation chain kept ~10 un-fused [E,16,K] temps live (6.7 GB
        at NE120) in the XLA buffer assignment."""
        s = jnp.stack([jnp.asarray(fn(t), self.dp0.dtype)
                       for fn in self.tfns])
        fks = self.fk * s[:, None]                       # [T, K]
        prs = self.prof * s[:, None]
        u = jnp.einsum("tep,tk->epk", self.u2d, fks)
        v = jnp.einsum("tep,tk->epk", self.v2d, fks)
        d = jnp.einsum("tep,tk->epk", self.g2d, prs)
        p = jnp.einsum("tep,tk->epk", self.gp2d, prs)
        dp0 = self.dp0[None, None, :]
        return u, v, u * dp0, v * dp0, d, p


def build_wind_basis(m) -> WindBasis:
    """Precompute the factored wind basis for m.cfg.test_case.

    Term tables (omega = 2*pi/tau; c(t)=cos, s(t)=sin):

    dcmip1-1 (u = K0 sin^2(lon') sin(2lat) cos(pi t/tau) + U0 cos(lat) + ud,
              v = K0 sin(2lon') cos(lat) cos(pi t/tau),
              ud = C cos(lon') cos^2(lat) cos(2pi t/tau) F(p),
              lon' = lon - omega t, C = OMEGA0*REARTH/(BS*ptop)):
      1: (U0 cos(lat), 0)                 x 1    x 1
      2: (K0/2 sin(2lat), 0)              x 1    x c(pi t/tau)
      3: (-K0/2 sin2lat cos2lon, K0 coslat sin2lon) x 1 x c(pi t/tau) c(2wt)
      4: (-K0/2 sin2lat sin2lon, -K0 coslat cos2lon) x 1 x c(pi t/tau) s(2wt)
      5: (C cos^2lat coslon, 0)           x F(k) x c(wt)^2
      6: (C cos^2lat sinlon, 0)           x F(k) x s(wt) c(wt)

    dcmip1-2 (u = U0 cos(lat); v = A(lat) B(k) cos(pi t/tau)):
      1: (U0 cos(lat), 0)  x 1     x 1
      2: (0, A(lat))       x B(k)  x c(pi t/tau)
    """
    cfg = m.cfg
    dt = cfg.np_dtype
    # m.lon/m.lat so the basis also builds per-shard inside shard_map
    # (where the element axis is the local slice); jnp throughout the 2D
    # fields keeps this traceable
    E = m.lon.shape[0]
    lon = m.lon.reshape(E, 16)
    lat = m.lat.reshape(E, 16)
    etam = np.asarray(m.hv.etam, np.float64)
    K = etam.shape[0]
    zeros = jnp.zeros((E, 16), lon.dtype)
    ones_k = np.ones(K)

    if cfg.test_case == "dcmip1-1":
        tau = dcmip.TAU_11
        om = 2.0 * PI / tau
        ptop = P0 * np.exp(-dcmip.ZTOP_11 / SCALE_HEIGHT)
        bsp = dcmip.BS_11 * ptop
        C = dcmip.OMEGA0_11 * REARTH / bsp
        p = P0 * etam
        plim = np.maximum(p, ptop)
        F = -np.exp((plim - P0) / bsp) + np.exp((ptop - plim) / bsp)
        K0 = dcmip.K0_11
        terms = [
            (dcmip.U0_11 * jnp.cos(lat), zeros, ones_k,
             lambda t: 1.0 + 0 * t),
            (0.5 * K0 * jnp.sin(2 * lat), zeros, ones_k,
             lambda t: jnp.cos(PI * t / tau)),
            (-0.5 * K0 * jnp.sin(2 * lat) * jnp.cos(2 * lon),
             K0 * jnp.cos(lat) * jnp.sin(2 * lon), ones_k,
             lambda t: jnp.cos(PI * t / tau) * jnp.cos(2 * om * t)),
            (-0.5 * K0 * jnp.sin(2 * lat) * jnp.sin(2 * lon),
             -K0 * jnp.cos(lat) * jnp.cos(2 * lon), ones_k,
             lambda t: jnp.cos(PI * t / tau) * jnp.sin(2 * om * t)),
            (C * jnp.cos(lat) ** 2 * jnp.cos(lon), zeros, F,
             lambda t: jnp.cos(om * t) ** 2),
            (C * jnp.cos(lat) ** 2 * jnp.sin(lon), zeros, F,
             lambda t: jnp.sin(om * t) * jnp.cos(om * t)),
        ]
    elif cfg.test_case == "dcmip1-2":
        tau = dcmip.TAU_12
        height = SCALE_HEIGHT * np.log(1.0 / etam)
        ptop = P0 * np.exp(-dcmip.ZTOP_12 / SCALE_HEIGHT)
        rho_ratio = P0 / np.maximum(P0 * etam, ptop)
        hstar = np.minimum(height / dcmip.ZTOP_12, 1.0)
        B = rho_ratio * np.cos(PI * hstar)
        A = -(REARTH * dcmip.W0_12 * PI) / (dcmip.K_12 * dcmip.ZTOP_12) \
            * jnp.cos(lat) * jnp.sin(dcmip.K_12 * lat)
        terms = [
            (dcmip.U0_12 * jnp.cos(lat), zeros, ones_k,
             lambda t: 1.0 + 0 * t),
            (zeros, A, B, lambda t: jnp.cos(PI * t / tau)),
        ]
    else:
        raise ValueError(cfg.test_case)

    # per-term divergence fields: div acts per level on (u2d*fk, v2d*fk)*dp0
    # = fk(k)*dp0(k) * div(u2d, v2d); likewise DSS sums points with the
    # per-level profile constant — so only 2D fields need storing
    dp0 = np.asarray(m.hv.dp0, np.float64)
    u2d_l, v2d_l, fk_l, g2d_l, gp2d_l, prof_l, tfns = \
        [], [], [], [], [], [], []
    sp16 = m.spheremp.reshape(E, 16, 1)
    rsp16 = m.rspheremp.reshape(E, 16)
    for (u2, v2, fk, tf) in terms:
        vfield = jnp.stack(
            [u2.reshape(E, 1, 4, 4), v2.reshape(E, 1, 4, 4)],
            axis=2).astype(dt)                         # [E, 1, 2, 4, 4]
        g2d = so.divergence_sphere(vfield, m.deriv, m.Dinv, m.metdet,
                                   m.rmetdet)          # [E, 1, 4, 4]
        g2d_t = jnp.moveaxis(g2d.reshape(E, 1, 16), 1, 2)  # [E, 16, 1]
        gp2d_t = m.tables.dss_scale_t(g2d_t * sp16, rsp16)
        u2d_l.append(jnp.asarray(u2, dt))
        v2d_l.append(jnp.asarray(v2, dt))  # zeros broadcast fine
        fk_l.append(jnp.asarray(fk, dt))
        g2d_l.append(g2d_t[:, :, 0])
        gp2d_l.append(gp2d_t[:, :, 0])
        prof_l.append(jnp.asarray(fk * dp0, dt))
        tfns.append(tf)

    return WindBasis(u2d=jnp.stack(u2d_l), v2d=jnp.stack(v2d_l),
                     fk=jnp.stack(fk_l), g2d=jnp.stack(g2d_l),
                     gp2d=jnp.stack(gp2d_l), prof=jnp.stack(prof_l),
                     tfns=tuple(tfns), dp0=jnp.asarray(dp0, dt))
