"""Pallas TPU kernel for the monotone PPM vertical remap.

Same math as ops/ppm.py `remap_q_ppm` (reference:
prim_advection_mod.F90:98 `remap_Q_ppm`, :221 `compute_ppm_grids`,
:267 `compute_ppm`, :349 `integrate_parabola`) — the XLA version
materializes the parabola coefficients ([E,16,q,3,k], 3x the field) plus
shift-selected copies, ~6 HBM round trips and a large working set; this
kernel keeps one element block VMEM-resident (~2 passes).

Layout: the T layout [E, 16, q*k] with k lane-minor.  Every k-axis
operation becomes a lane roll plus a boundary mask:
  * shifts a[k +- n]   -> pltpu.roll along lanes + clamped-edge blends
  * cumulative sums    -> log2(k) doubling rolls masked at k-group edges
  * mirrored ghosts    -> edge-row patches via per-lane masks
All masks and k-index vectors are precomputed host-side and passed as
[8, qk] inputs (Pallas forbids captured array constants).

The cell-search select covers interface displacements of -2..+2 source
cells, identical to the XLA fast path (tests pin both against the
unbounded search path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N2 = 16


def _masks_host(nq: int, nk: int):
    """[n_masks, qk] f32 lane masks/vectors for in-kernel k-axis ops.

    rows: 0..6 = cumsum step masks (k_in_group >= 2^s), 7 = k index (f32)
    """
    qk = nq * nk
    kidx = np.tile(np.arange(nk), nq)
    steps = max(1, int(np.ceil(np.log2(max(nk, 2)))))
    rows = []
    for s in range(7):
        rows.append((kidx >= (1 << s)).astype(np.float64))
    rows.append(kidx.astype(np.float64))
    return np.stack(rows), steps


def _rollL(x, n):
    """lane roll: out[..., j] = x[..., j+n] (cyclic)."""
    return pltpu.roll(x, (x.shape[-1] - n) % x.shape[-1], axis=x.ndim - 1)


def _rollR(x, n):
    """lane roll: out[..., j] = x[..., j-n] (cyclic)."""
    return pltpu.roll(x, n % x.shape[-1], axis=x.ndim - 1)


def _kernel(nq, nk, alg, csteps,
            qdp_ref, dps_ref, dpr_ref, mask_ref, out_ref):
    """One element block: qdp [eb,16,qk]; dp_star/dp_ref [eb,16,k]."""
    f = qdp_ref.dtype
    qdp = qdp_ref[...]                 # [eb, 16, qk], k lane-minor
    dp1k = dps_ref[...]                # [eb, 16, k] source widths
    dp2k = dpr_ref[...]                # [eb, 16, k] target widths
    masks = mask_ref[:]                # [8, qk]
    kidx = masks[7:8]                  # [1, qk] k index within group
    kf = jnp.asarray(float(nk), f)

    rep = (lambda a: a) if nq == 1 else \
        (lambda a: pltpu.repeat(a, nq, axis=a.ndim - 1))
    dp1 = rep(dp1k)                    # [16, qk]
    dp2 = rep(dp2k)

    def cumsum_k(x):
        # inclusive cumsum within each k-group of the lane axis
        out = x
        for s in range(csteps):
            sh = 1 << s
            if sh >= nk:
                break
            out = out + masks[s:s + 1] * _rollR(out, sh)
        return out

    def shift1L_clamped(x):
        rolled = _rollL(x, 1)
        edge = (kidx >= kf - 1).astype(f)
        return edge * x + (1.0 - edge) * rolled

    def shift1R_clamped(x):
        rolled = _rollR(x, 1)
        edge = (kidx < 1).astype(f)
        return edge * x + (1.0 - edge) * rolled

    def shiftnL(x, n):
        for _ in range(n):
            x = shift1L_clamped(x)
        return x

    # interfaces: pio[k] = left interface of cell k (exclusive cumsum);
    # pio_r = right interface
    pio_r = cumsum_k(dp1)              # pio[k+1]
    pio_l = pio_r - dp1                # pio[k]
    pin_r = cumsum_k(dp2)
    # force identical column totals (:142-144): the last target interface
    # becomes the source total
    last = (kidx >= kf - 1).astype(f)
    tgt = (1.0 - last) * pin_r + last * pio_r

    # ---- PPM coefficients -------------------------------------------------
    # Mirrored ghost cells (ao(1-k)=ao(k), dpo(1-k)=dpo(k)) reduce to
    # clamped 1-2 lane shifts for every INTERIOR quantity, plus exact
    # edge identities that follow from the mirror symmetry:
    #   dma(ghost) = 0 exactly — the mirror makes a(j+1)-a(j) = 0 there,
    #     which triggers the monotone-limiter zero branch;
    #   with symmetric mirror widths c5*c9 = c5*c10 = 1/6, so
    #   ai(bottom interface) = a0 - dma0/6   (width-independent)
    #   ai(top interface)    = aN + dmaN/6
    ao = qdp / dp1
    d = dp1
    a = ao
    dm1 = shift1R_clamped(d)           # d[j-1], ghost = d[0]  (mirror)
    dp1_ = shift1L_clamped(d)          # d[j+1], ghost = d[last]
    am1 = shift1R_clamped(a)
    ap1 = shift1L_clamped(a)

    # stage 1: dma[j] — clamped shifts equal the mirrored ghosts exactly
    c1 = d / (dm1 + d + dp1_)
    c2 = (2.0 * dm1 + d) / (dp1_ + d)
    c3 = (d + 2.0 * dp1_) / (dm1 + d)
    da = c1 * (c2 * (ap1 - a) + c3 * (a - am1))
    dma = jnp.minimum(jnp.minimum(jnp.abs(da), 2.0 * jnp.abs(a - am1)),
                      2.0 * jnp.abs(ap1 - a)) * jnp.sign(da)
    dma = jnp.where((ap1 - a) * (a - am1) <= 0.0, 0.0, dma)

    # stage 2: right-interface value ai(j) of each cell j
    djm1 = dm1
    djp1 = dp1_
    djp2 = shiftnL(d, 2)
    ajp1 = ap1
    last2 = last
    # second mirror width at the top: dpo(nlev+2) = dpo(nlev-1)
    djp2 = (1.0 - last2) * djp2 + last2 * shift1R_clamped(d)
    c4 = d / (d + djp1)
    c5 = 1.0 / (djm1 + d + djp1 + djp2)
    c6 = (2.0 * djp1 * d) / (d + djp1)
    c7 = (djm1 + d) / (2.0 * d + djp1)
    c8 = (djp2 + djp1) / (2.0 * djp1 + d)
    c9 = d * (djm1 + d) / (2.0 * d + djp1)
    c10 = djp1 * (djp1 + djp2) / (d + 2.0 * djp1)
    dma_jp1 = shift1L_clamped(dma)
    # ghost dma above the top is exactly zero (mirror + limiter)
    dma_jp1 = (1.0 - last2) * dma_jp1
    ai_r = a + c4 * (ajp1 - a) + c5 * (c6 * (c7 - c8) * (ajp1 - a)
                                       - c9 * dma_jp1 + c10 * dma)
    first = (kidx < 1).astype(f)
    ai_l = shift1R_clamped(ai_r)
    sixth = jnp.asarray(1.0 / 6.0, f)
    ai_l = first * (a - sixth * dma) + (1.0 - first) * ai_l

    # stage 3: limited parabola
    al = ai_l
    ar = ai_r
    extremum = (ar - a) * (a - al) <= 0.0
    al = jnp.where(extremum, a, al)
    ar = jnp.where(extremum, a, ar)
    dd = ar - al
    t = dd * (a - 0.5 * (al + ar))
    curv = dd * dd / 6.0
    al = jnp.where(t > curv, 3.0 * a - 2.0 * ar, al)
    ar = jnp.where(t < -curv, 3.0 * a - 2.0 * al, ar)
    coef0 = 1.5 * a - 0.25 * (al + ar)
    coef1 = ar - al
    coef2 = -6.0 * a + 3.0 * (al + ar)
    if alg == 2:
        edge2 = ((kidx < 2) | (kidx >= kf - 2)).astype(f)
        coef0 = edge2 * a + (1.0 - edge2) * coef0
        coef1 = (1.0 - edge2) * coef1
        coef2 = (1.0 - edge2) * coef2

    # ---- cell search: shift in {-1..3} (displacement -2..+2) ----------
    masso = cumsum_k(qdp) - qdp        # mass below cell k (exclusive)
    up1 = (pio_r <= tgt) & (kidx < kf - 1)
    up2 = (shift1L_clamped(pio_r) <= tgt) & up1 & (kidx < kf - 2)
    up3 = (shiftnL(pio_r, 2) <= tgt) & up2 & (kidx < kf - 3)
    dn1 = pio_l > tgt

    def sel(x):
        # chained clamped shifts: L2 = shift(L1), L3 = shift(L2)
        l1 = shift1L_clamped(x)
        l2 = shift1L_clamped(l1)
        l3 = shift1L_clamped(l2)
        up23 = jnp.where(up3, l3, l2)
        up = jnp.where(up2, up23, l1)
        return jnp.where(up1, up,
                         jnp.where(dn1, shift1R_clamped(x), x))

    dpo_kk = sel(dp1)
    pio_kk = sel(pio_l)
    pio_kk1 = sel(pio_r)
    masso_kk = sel(masso)
    k0 = sel(coef0)
    k1 = sel(coef1)
    k2 = sel(coef2)

    z2 = (tgt - 0.5 * (pio_kk + pio_kk1)) / dpo_kk
    x1 = jnp.asarray(-0.5, f)
    integ = (k0 * (z2 - x1) + k1 * (z2 * z2 - x1 * x1) / 2.0
             + k2 * (z2 * z2 * z2 - x1 * x1 * x1) / 3.0)
    massn = masso_kk + integ * dpo_kk          # mass below tgt interface
    # qdp_out[k] = massn[k] - massn[k-1] (massn[-1] = 0)
    prev = shift1R_clamped(massn) * (1.0 - (kidx < 1).astype(f))
    out_ref[...] = massn - prev


def remap_q_ppm_pallas_t(Qt, dp_star, dp_ref, alg=0, interpret=None,
                         eb=1):
    """PPM remap on T-layout fields.

    Qt:      [E, 16, q*k]  tracer mass (k lane-minor per tracer)
    dp_star: [E, 16, k]    source (Lagrangian) widths
    dp_ref:  [E, 16, k]    target (reference) widths
    Returns remapped Qt, conserving each column's total mass.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, _, qk = Qt.shape
    nk = dp_star.shape[-1]
    nq = qk // nk
    f = Qt.dtype
    masks_np, csteps = _masks_host(nq, nk)
    masks = jnp.asarray(masks_np, f)
    if E % eb != 0:
        eb = 1

    be = lambda s2: pl.BlockSpec((eb, N2, s2), lambda e: (e, 0, 0),
                                 memory_space=pltpu.VMEM)
    bm = pl.BlockSpec((8, qk), lambda e: (0, 0),
                      memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, nq, nk, alg, csteps)
    return pl.pallas_call(
        kernel,
        grid=(E // eb,),
        in_specs=[be(qk), be(nk), be(nk), bm],
        out_specs=be(qk),
        out_shape=jax.ShapeDtypeStruct((E, N2, qk), f),
        interpret=interpret,
    )(Qt, dp_star, dp_ref, masks)
