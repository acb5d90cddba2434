"""Pallas banded face-shift DSS: the per-shard assembly at VMEM residency.

The sharded face DSS (parallel/face_sharded.py `dss_sum_t_face_band`)
assembles in XLA — every shifted-slice term (t_px/t_mx/t_py/t_my/cor)
materializes a band-sized HBM array, ~10 passes of the field per DSS.
This kernel performs the same assembly (same per-slot float association,
bitwise-equal results) in one streaming pass over the band, with the
single-chip kernel's fused epilogues (post-DSS rspheremp scale, the next
stage's limiter-bound min/max, the biharmonic first Laplacian) — so the
sharded pipeline runs the SAME fused program as the single chip, the
reference's one-assembly-at-any-rank-count discipline
(edge_mod.F90:366/648, cuda_mod.F90:932-1009).

XLA keeps only the O(boundary) work: head/tail/ghost/diag gathers, the
band row alignment (dynamic_slice), and the seam patches — exactly the
pieces the ppermute halo machinery feeds.

Reference: prim_advection_mod.F90:929-960 (make_C0 scale),
euler_step :750-778 (bound prep), viscosity_mod.F90:289-351 (laplacian).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_euler import (_ddy_mask_mat, _dmat_np, _lap_wk,
                           _roll_coeffs, _smet)

__all__ = ["dss_band_pallas"]


def _band_kernel(by, ne, nlev, with_scale, with_minmax, with_lap,
                 x_ref, up_ref, dn_ref, gpx_ref, gmx_ref, dv_ref,
                 rsp_ref, dp_ref, met_ref, cx_ref, cy_ref, cxt_ref,
                 cyt_ref, mask_ref, dm_ref,
                 out_ref, qmin_ref=None, qmax_ref=None, lap_ref=None):
    """One band block: x [by, ne, 16, bc] whole element rows.

    up/dn [by, ne, 4, bc] carry the +-y partner rows with face-transition
    masking and seam patches already applied (XLA, O(boundary)); gpx/gmx
    [by, 4, bc] the +-x seam columns; dv [by, ne, 4, bc] the corner
    diagonal values in (mm, mp, pm, pp) order.  The per-slot sum order
    reproduces parallel/face_sharded.py dss_sum_t_face_band BITWISE:
    ((((x + t_px) + t_mx) + t_py) + t_my) + cor with the zero-placed adds
    dropped (x + 0.0 only flips the sign of a -0.0, and array-equality
    treats signed zeros as equal).
    """
    f = x_ref.dtype
    x = x_ref[...]                       # [by, ne, 16, bc]
    bc = x.shape[-1]
    up = up_ref[...]
    dn = dn_ref[...]
    dv = dv_ref[...]

    S_px = jnp.concatenate([x[:, 1:, 0:4, :], gpx_ref[...][:, None]],
                           axis=1)      # [by, ne, 4, bc]
    S_mx = jnp.concatenate([gmx_ref[...][:, None], x[:, :-1, 12:16, :]],
                           axis=1)

    z2 = jnp.zeros((by, ne, 2, bc), f)
    dcj = lambda a, b: jnp.concatenate(
        [a[:, :, None], z2, b[:, :, None]], axis=2)       # j: a, 0, 0, b
    i0 = (x[:, :, 0:4, :] + S_mx) + dcj(dn[:, :, 0], up[:, :, 0])
    i0 = i0 + dcj(dv[:, :, 0], dv[:, :, 1])               # (mm, mp)
    i1 = x[:, :, 4:8, :] + dcj(dn[:, :, 1], up[:, :, 1])
    i2 = x[:, :, 8:12, :] + dcj(dn[:, :, 2], up[:, :, 2])
    i3 = (x[:, :, 12:16, :] + S_px) + dcj(dn[:, :, 3], up[:, :, 3])
    i3 = i3 + dcj(dv[:, :, 2], dv[:, :, 3])               # (pm, pp)
    res = jnp.concatenate([i0, i1, i2, i3], axis=2)

    if with_scale:
        res = res * rsp_ref[...][..., None]
    out_ref[...] = res
    if with_minmax:
        # lane l of chunk b holds level (b*bc + l) % nlev — tile dp to a
        # 128-aligned width and rotate to the chunk's phase (same scheme
        # as ops/pallas_dss.py _dss_face_kernel)
        t = -(-(bc + nlev) // nlev)
        Lt = -(-(t * nlev) // 128) * 128
        dp_t = jnp.concatenate(
            [dp_ref[...]] * t
            + [jnp.zeros(dp_ref.shape[:3] + (Lt - t * nlev,), f)],
            axis=-1)
        start = (pl.program_id(1) * bc) % nlev
        dpl = pltpu.roll(dp_t, -start, axis=3)[..., :bc]
        q = res / dpl
        qmin_ref[...] = q.min(axis=2)
        qmax_ref[...] = q.max(axis=2)
        if with_lap:
            # same LAP_FORM-dispatched weak Laplacian as the single-chip
            # face kernel (pallas_euler._lap_wk) — keeps the two
            # assemblies' epilogues structurally identical
            met = met_ref[...]                  # [by, ne, 3, 16] _smet
            msel = lambda i: jnp.swapaxes(met[:, :, i:i + 1, :], -1, -2)
            lap_ref[...] = _lap_wk(q, msel(0), msel(1), msel(2),
                                   cx_ref[:], cy_ref[:],
                                   cxt_ref[:], cyt_ref[:], mask_ref[:],
                                   dm_ref[:])


def _band_prep(x, ext, t):
    """XLA O(boundary) prep shared with the XLA band assembly: returns
    (band [nr,ne,16,B], up, dn [nr,ne,4,B], gpx, gmx [nr,4,B],
    dband [nr,ne,4,B], pos0)."""
    ne, nr, eloc = t.ne, t.nr, t.eloc
    B = x.shape[-1]
    f = x.dtype
    extf = ext.reshape(-1, B)

    head = jnp.where(t.head_mask[:, None, None],
                     ext[t.head_idx].astype(f), 0)
    tail = jnp.where(t.tail_mask[:, None, None],
                     ext[t.tail_idx].astype(f), 0)
    bandfull = jnp.concatenate([head, x, tail], axis=0)
    o = t.band_o[0]
    z = jnp.zeros((), o.dtype)
    band = jax.lax.dynamic_slice(bandfull, (o, z, z), (nr * ne, 16, B))
    b4 = band.reshape(nr, ne, 16, B)
    bv = band.reshape(nr, ne, 4, 4, B)

    gpx = jnp.where(t.gpx_mask[..., None], extf[t.gpx_idx].astype(f), 0)
    gmx = jnp.where(t.gmx_mask[..., None], extf[t.gmx_idx].astype(f), 0)

    zrow = jnp.zeros((1, ne, 4, B), f)
    up = jnp.concatenate([bv[1:, :, :, 0, :], zrow], axis=0)
    dn = jnp.concatenate([zrow, bv[:-1, :, :, 3, :]], axis=0)
    up = jnp.where(t.ysame_up[:, None, None, None], up, 0)
    dn = jnp.where(t.ysame_dn[:, None, None, None], dn, 0)

    def patch(rows, pos, idx, mask):
        for p in range(t.npatch):
            strip = jnp.where(mask[p][..., None],
                              extf[idx[p]].astype(f), 0)
            zp = jnp.zeros((), pos.dtype)
            cur = jax.lax.dynamic_slice(
                rows, (pos[p], zp, zp, zp), (1, ne, 4, B))
            rows = jax.lax.dynamic_update_slice(
                rows, cur + strip[None], (pos[p], zp, zp, zp))
        return rows

    up = patch(up, t.pa_pos, t.pa_idx, t.pa_mask)
    dn = patch(dn, t.pb_pos, t.pb_idx, t.pb_mask)

    # corner diagonals for the LOCAL elements, embedded at their band rows
    dvals = jnp.where(t.diag_mask[..., None],
                      extf[t.diag_idx].astype(f), 0)      # [eloc, 4, B]
    pos0 = 2 * ne - o
    dband = jnp.zeros((nr * ne, 4, B), f)
    dband = jax.lax.dynamic_update_slice(dband, dvals, (pos0, z, z))
    return b4, up, dn, gpx, gmx, dband.reshape(nr, ne, 4, B), pos0


def dss_band_pallas(x, ext, t, rsp_band=None, dp=None, nq=None,
                    met_band=None, deriv=None, interpret=None):
    """Banded face-shift DSS for one shard, Pallas-fused epilogues.

    x:   [eloc, 16, B] local T-layout field
    ext: [eloc+nhalo, 16, B] = concat([x, halo])
    t:   ShardedFaceTables (parallel/face_sharded.py)
    rsp_band: optional [nr, ne, 16] band-aligned rspheremp (static table)
         — fused post-scale (make_C0)
    dp:  optional [eloc, 16, nlev] next-stage thickness — also return
         (qmin, qmax) [eloc, B] of Q = out/dp (requires rsp_band)
    met_band/deriv: optional band-aligned metric [nr, ne, 5, 16] + deriv
         — additionally emit laplace_sphere_wk(out/dp) (requires dp)
    Returns out[, qmin, qmax][, lap], each sliced to the local elements;
    `out` is bitwise-equal to dss_sum_t_face_band(x, ext, t) (* rsp).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ne, nr, eloc = t.ne, t.nr, t.eloc
    E, nn, B = x.shape
    f = x.dtype
    with_scale = rsp_band is not None
    with_minmax = dp is not None
    with_lap = met_band is not None
    if with_minmax and not with_scale:
        raise ValueError("minmax fusion requires rsp_band")
    if with_lap and not with_minmax:
        raise ValueError("lap fusion requires dp")

    b4, up, dn, gpx, gmx, dband, pos0 = _band_prep(x, ext, t)

    # lane padding (Mosaic 128 rule); padded lanes carry zeros
    Bp = -(-B // 128) * 128
    if Bp != B:
        padl = lambda a: jnp.pad(
            a, ((0, 0),) * (a.ndim - 1) + ((0, Bp - B),))
        b4, up, dn, gpx, gmx, dband = map(padl,
                                          (b4, up, dn, gpx, gmx, dband))
    bc = 128 if Bp % 128 == 0 else Bp
    nb = Bp // bc

    nlev = dp.shape[-1] if with_minmax else 1
    if with_minmax:
        # band-aligned dp: ghost rows get 1.0 (their q values are sliced
        # off; 1.0 avoids 0/0 NaNs leaking into min/max lanes)
        o = t.band_o[0]
        z = jnp.zeros((), o.dtype)
        ones = jnp.ones((2 * ne, nn, nlev), f)
        dpfull = jnp.concatenate(
            [ones, dp.astype(f), jnp.ones((3 * ne, nn, nlev), f)], axis=0)
        dpb = jax.lax.dynamic_slice(
            dpfull, (o, z, z), (nr * ne, nn, nlev)).reshape(nr, ne, nn,
                                                            nlev)
    else:
        dpb = jnp.ones((nr, ne, 1, 1), f)

    # row blocking: by divides nr_pad (pad rows are zeros, sliced off)
    cap = max(1, 2_000_000 // (ne * 16 * bc * 4))
    by = min(nr, cap)
    nrp = -(-nr // by) * by
    if nrp != nr:
        padr = lambda a: jnp.pad(
            a, ((0, nrp - nr),) + ((0, 0),) * (a.ndim - 1))
        b4, up, dn, gpx, gmx, dband = map(padr,
                                          (b4, up, dn, gpx, gmx, dband))
        dpb = jnp.concatenate(
            [dpb, jnp.ones((nrp - nr,) + dpb.shape[1:], f)], axis=0)

    if with_scale:
        rspb = rsp_band.astype(f)
        if nrp != nr:
            rspb = jnp.pad(rspb, ((0, nrp - nr), (0, 0), (0, 0)))
        brsp = pl.BlockSpec((by, ne, nn), lambda r, b: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        rspb = jnp.zeros((1, 1, 1), f)
        brsp = pl.BlockSpec((1, 1, 1), lambda r, b: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    bmain = pl.BlockSpec((by, ne, nn, bc), lambda r, b: (r, 0, 0, b),
                         memory_space=pltpu.VMEM)
    brow4 = pl.BlockSpec((by, ne, 4, bc), lambda r, b: (r, 0, 0, b),
                         memory_space=pltpu.VMEM)
    bgx = pl.BlockSpec((by, 4, bc), lambda r, b: (r, 0, b),
                       memory_space=pltpu.VMEM)
    if with_minmax:
        bdp = pl.BlockSpec((by, ne, nn, nlev), lambda r, b: (r, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        bmm = pl.BlockSpec((by, ne, bc), lambda r, b: (r, 0, b),
                           memory_space=pltpu.VMEM)
        out_specs = [bmain, bmm, bmm]
        out_shape = [jax.ShapeDtypeStruct((nrp, ne, nn, Bp), f),
                     jax.ShapeDtypeStruct((nrp, ne, Bp), f),
                     jax.ShapeDtypeStruct((nrp, ne, Bp), f)]
    else:
        bdp = pl.BlockSpec((1, 1, 1, 1), lambda r, b: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        out_specs = [bmain]
        out_shape = [jax.ShapeDtypeStruct((nrp, ne, nn, Bp), f)]

    bcoef = pl.BlockSpec((nn, 4), lambda r, b: (0, 0),
                         memory_space=pltpu.VMEM)
    if with_lap:
        # fold the 5-channel band metric table (Dinv00/01/10/11, spheremp)
        # to the 3-channel _smet form the kernel consumes (elementwise on
        # a small static table — constant across steps under jit)
        mb = met_band
        s00, s01, s11 = _smet(mb[:, :, 0], mb[:, :, 1], mb[:, :, 2],
                              mb[:, :, 3], mb[:, :, 4])
        metb = jnp.stack([s00, s01, s11], axis=2).astype(f)
        if nrp != nr:
            metb = jnp.pad(metb, ((0, nrp - nr),) + ((0, 0),) * 3)
        bmet = pl.BlockSpec((by, ne, 3, nn), lambda r, b: (r, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        deriv_np = np.asarray(deriv)
        cx, cy = _roll_coeffs(deriv_np, transpose=False)
        cxt, cyt = _roll_coeffs(deriv_np, transpose=True)
        dmat = _dmat_np(deriv_np)
        out_specs.append(bmain)
        out_shape.append(jax.ShapeDtypeStruct((nrp, ne, nn, Bp), f))
    else:
        metb = jnp.zeros((1, 1, 1, 1), f)
        bmet = pl.BlockSpec((1, 1, 1, 1), lambda r, b: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        cx = cy = cxt = cyt = dmat = np.zeros((nn, 4))

    kernel = functools.partial(_band_kernel, by, ne, nlev,
                               with_scale, with_minmax, with_lap)
    outs = pl.pallas_call(
        kernel,
        grid=(nrp // by, nb),
        in_specs=[bmain, brow4, brow4, bgx, bgx, brow4, brsp, bdp, bmet,
                  bcoef, bcoef, bcoef, bcoef, bcoef, bcoef],
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(b4, up, dn, gpx, gmx, dband, rspb, dpb.astype(f), metb,
      jnp.asarray(cx, f), jnp.asarray(cy, f),
      jnp.asarray(cxt, f), jnp.asarray(cyt, f),
      jnp.asarray(_ddy_mask_mat(), f), jnp.asarray(dmat, f))

    z = jnp.zeros((), jnp.int32)
    p0 = jnp.asarray(pos0, jnp.int32)
    loc = lambda a: jax.lax.dynamic_slice(
        a.reshape(nrp * ne, nn, Bp), (p0, z, z), (eloc, nn, Bp))[..., :B]
    locmm = lambda a: jax.lax.dynamic_slice(
        a.reshape(nrp * ne, Bp), (p0, z), (eloc, Bp))[..., :B]
    if with_minmax:
        ret = [loc(outs[0]), locmm(outs[1]), locmm(outs[2])]
        if with_lap:
            ret.append(loc(outs[3]))
        return tuple(ret)
    return loc(outs if not isinstance(outs, (tuple, list)) else outs[0])
