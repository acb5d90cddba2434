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
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N2 = 16

# profiling-only ablations (comma list; results are WRONG with any set):
#   sel  = skip the 6-shift cell select (massn from shift 0 only)
#   cum  = skip the tracer-width masso cumsum
#   coef = skip the PPM reconstruction (al = ar = a)
#   rep  = replace level->tracer lane tiling with a lane-0 broadcast
_ABLATE = set(filter(None, _os.environ.get("TSE_PPM_ABLATE", "").split(",")))

# Gate the far cell-search shifts (+2, +3, -2 source cells) behind a
# block-level branch: the vertical CFL of the remap interval keeps
# interface displacements within one source cell almost everywhere
# (DCMIP 1-1/1-2 at the reference's rsplit never trip the far window),
# so the ~36 tracer-width VPU ops of those three shift terms are skipped
# unless some lane in the block actually selects a far cell.  Exact: the
# skipped terms are rep(mask)*g with an all-zero mask (sign-of-zero
# differences only).  TSE_PPM_GATE=0 forces the unconditional loop.
_GATE = _os.environ.get("TSE_PPM_GATE", "1") not in ("0", "", "off")


def _cumsum_weights(nq: int, nk: int):
    """Per-128-lane-chunk MXU weights for the tracer-width exclusive
    prefix sum (masso).

    For chunk c the prefix at lane j reaches back at most nk-1 <= 127
    lanes, so two dots cover it:  out_c = x_{c-1} @ Wlo[c] + x_c @ Whi[c]
    (chunk 0 has no lo term; weights beyond qk are zero).  The weights are
    0/1 matrices, so HIGHEST-precision dots reproduce each term exactly;
    only the accumulation order differs from the doubling-roll form
    (roundoff-level, like any reassociated sum).  Requires nk <= 128.
    Returns [nb, 2, 128, 128] (lo, hi)."""
    qk = nq * nk
    nb = -(-qk // 128)
    w = np.zeros((nb, 2, 128, 128))
    for c in range(nb):
        for j in range(128):
            lane = c * 128 + j
            if lane >= qk:
                continue
            g0 = (lane // nk) * nk          # group start (same tracer)
            for i in range(g0, lane):       # exclusive prefix
                if i >= c * 128:
                    w[c, 1, i - c * 128, j] = 1.0
                elif c > 0 and i >= (c - 1) * 128:
                    w[c, 0, i - (c - 1) * 128, j] = 1.0
    return w


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


def _kernel(nq, nk, alg, csteps, mxu,
            qdp_ref, dps_ref, dpr_ref, mask_ref, *rest):
    if mxu:
        cw_ref, out_ref = rest
    else:
        cw_ref, (out_ref,) = None, rest
    """One element block: qdp [eb,16,qk]; dp_star/dp_ref [eb,16,k].

    Structure: every level-only quantity (interface cumsums, the ten PPM
    width coefficients, the cell-search predicates, z2) is computed at
    [*, 16, nk] width — nq x cheaper — and tiled to the tracer lanes
    once.  The per-lane cell selection is a masked sum of cyclic lane
    rolls (shift -1..+3); the masks already exclude rolls that would
    cross a tracer-group boundary, so no clamped chains are needed.
    """
    f = qdp_ref.dtype
    qdp = qdp_ref[...]                 # [eb, 16, qk], k lane-minor
    d = dps_ref[...]                   # [eb, 16, nk] source widths
    dp2k = dpr_ref[...]                # [eb, 16, nk] target widths
    masks = mask_ref[:]                # [8, qk]
    kidx_q = masks[7:8]                # [1, qk]
    masks_k = masks[:, :nk]            # level-width copies (period nk)
    kidx = masks_k[7:8]
    kf = jnp.asarray(float(nk), f)
    if "rep" in _ABLATE and nq > 1:
        rep = lambda a: jnp.broadcast_to(a[..., :1],
                                         a.shape[:-1] + (nq * nk,))
    elif nq == 1:
        rep = lambda a: a
    elif _os.environ.get("TSE_PPM_REP", "repeat") == "concat":
        rep = lambda a: jnp.concatenate([a] * nq, axis=a.ndim - 1)
    else:
        rep = lambda a: pltpu.repeat(a, nq, axis=a.ndim - 1)

    def cumsum_k(x, mrows):
        out = x
        for s in range(csteps):
            sh = 1 << s
            if sh >= nk:
                break
            out = out + mrows[s:s + 1] * _rollR(out, sh)
        return out

    def mk_shifts(ki):
        # where-form clamped shifts: 1 select + 1 roll per application
        # (vs the 2-FMA arithmetic blend) — value-identical, the edge
        # predicates are exact
        top_b = ki >= kf - 1
        bot_b = ki < 1

        def s1L(x):
            return jnp.where(top_b, x, _rollL(x, 1))

        def s1R(x):
            return jnp.where(bot_b, x, _rollR(x, 1))

        return s1L, s1R, top_b, bot_b

    s1L, s1R, _, _ = mk_shifts(kidx)               # level width
    s1Lq, s1Rq, top_bq, bot_bq = mk_shifts(kidx_q)  # tracer width

    # ---- interfaces (level width) ----------------------------------------
    pio_r = cumsum_k(d, masks_k)         # pio[k+1]
    pio_l = pio_r - d                    # pio[k]
    pin_r = cumsum_k(dp2k, masks_k)
    # force identical column totals (:142-144)
    last = (kidx >= kf - 1).astype(f)
    tgt = (1.0 - last) * pin_r + last * pio_r

    # ---- PPM width coefficients (level width) ----------------------------
    # Mirrored ghost cells (ao(1-k)=ao(k), dpo(1-k)=dpo(k)) reduce to
    # clamped 1-2 lane shifts; exact edge identities from the mirror:
    #   dma(ghost) = 0;  c5*c9 = c5*c10 = 1/6 at the mirror, so
    #   ai(bottom) = a0 - dma0/6, ai(top) = aN + dmaN/6
    dm1 = s1R(d)                         # d[j-1], ghost = d[0]
    dp1_ = s1L(d)                        # d[j+1], ghost = d[last]
    c1 = d / (dm1 + d + dp1_)
    c2 = (2.0 * dm1 + d) / (dp1_ + d)
    c3 = (d + 2.0 * dp1_) / (dm1 + d)
    djp1 = dp1_
    djp2 = s1L(dp1_)
    # second mirror width at the top: dpo(nlev+2) = dpo(nlev-1)
    djp2 = (1.0 - last) * djp2 + last * s1R(d)
    c4 = d / (d + djp1)
    c5 = 1.0 / (dm1 + d + djp1 + djp2)
    c6 = (2.0 * djp1 * d) / (d + djp1)
    c7 = (dm1 + d) / (2.0 * d + djp1)
    c8 = (djp2 + djp1) / (2.0 * djp1 + d)
    c9 = d * (dm1 + d) / (2.0 * d + djp1)
    c10 = djp1 * (djp1 + djp2) / (d + 2.0 * djp1)
    c678 = c5 * c6 * (c7 - c8)

    # ---- cell search (level width): shift s in {-1..3} -------------------
    up1 = (pio_r <= tgt) & (kidx < kf - 1)
    up2 = (s1L(pio_r) <= tgt) & up1 & (kidx < kf - 2)
    up3 = (s1L(s1L(pio_r)) <= tgt) & up2 & (kidx < kf - 3)
    dn1 = pio_l > tgt
    dn2 = (s1R(pio_l) > tgt) & dn1 & (kidx >= 2)
    f1 = up1.astype(f)
    f2 = up2.astype(f)
    f3 = up3.astype(f)
    fd = dn1.astype(f)
    fd2 = dn2.astype(f)
    # exclusive shift masks: m[s] = 1 where the selected cell is k+s
    m_m2 = fd2
    m_m1 = fd - fd2
    m_0 = (1.0 - fd) * (1.0 - f1)
    m_1 = f1 - f2
    m_2 = f2 - f3
    m_3 = f3

    def sel_k(x):
        # level-width masked-roll select (rolls stay inside the k group
        # because the masks exclude boundary shifts)
        return (m_0 * x + m_1 * _rollL(x, 1) + m_2 * _rollL(x, 2)
                + m_3 * _rollL(x, 3) + m_m1 * _rollR(x, 1)
                + m_m2 * _rollR(x, 2))

    dpo_kk = sel_k(d)
    pio_kk = sel_k(pio_l)
    z2 = (tgt - (pio_kk + 0.5 * dpo_kk)) / dpo_kk

    # ---- tracer-dependent part (tracer width) ----------------------------
    dp1q = rep(d)
    a = qdp / dp1q
    am1 = s1Rq(a)
    ap1 = s1Lq(a)
    # fold c1 into the level-width products: two lane tilings, not three
    da = rep(c1 * c2) * (ap1 - a) + rep(c1 * c3) * (a - am1)
    dma = jnp.minimum(jnp.minimum(jnp.abs(da), 2.0 * jnp.abs(a - am1)),
                      2.0 * jnp.abs(ap1 - a)) * jnp.sign(da)
    dma = jnp.where((ap1 - a) * (a - am1) <= 0.0, 0.0, dma)

    sixth = jnp.asarray(1.0 / 6.0, f)
    if "coef" in _ABLATE:
        ai_r = a
        ai_l = a
    else:
        # ghost dma above the top is 0 (top_bq lanes = rep(last) lanes)
        dma_jp1 = jnp.where(top_bq, 0.0, _rollL(dma, 1))
        ai_r = a + rep(c4 + c678) * (ap1 - a) \
            - rep(c5 * c9) * dma_jp1 + rep(c5 * c10) * dma
        ai_l = jnp.where(bot_bq, a - sixth * dma, _rollR(ai_r, 1))

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
        edge2 = ((kidx_q < 2) | (kidx_q >= kf - 2)).astype(f)
        coef0 = edge2 * a + (1.0 - edge2) * coef0
        coef1 = (1.0 - edge2) * coef1
        coef2 = (1.0 - edge2) * coef2

    if "cum" in _ABLATE:
        masso = qdp
    elif mxu:
        # exclusive prefix on the MXU (_cumsum_weights): two [128,128]
        # dots per lane chunk run concurrently with the VPU's reconstruc-
        # tion math instead of 7 serialized full-width doubling rolls
        eb_, _, qk_ = qdp.shape
        R = eb_ * N2
        xf = qdp.reshape(R, qk_)
        nb = cw_ref.shape[0]
        Lp = nb * 128
        if Lp != qk_:
            xf = jnp.concatenate(
                [xf, jnp.zeros((R, Lp - qk_), f)], axis=-1)
        outs = []
        for c in range(nb):
            hi = xf[:, c * 128:(c + 1) * 128]
            acc = jax.lax.dot_general(
                hi, cw_ref[c, 1], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f)
            if c > 0:
                lo = xf[:, (c - 1) * 128:c * 128]
                acc = acc + jax.lax.dot_general(
                    lo, cw_ref[c, 0], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f)
            outs.append(acc)
        masso = jnp.concatenate(outs, axis=-1)[:, :qk_] \
            .reshape(eb_, N2, qk_)
    else:
        masso = cumsum_k(qdp, masks) - qdp   # mass below cell k (exclusive)

    # ---- fused select + parabola integral --------------------------------
    # massn[k] = masso[k+d] + sum_j coef_j[k+d] * Y_j[k] at the selected
    # shift d, with Y_j = z2-polynomial basis * dpo (level width).  Rather
    # than four masked-roll selects (sel(masso), sel(coef_j)), regroup per
    # shift:  massn = sum_d m_d * roll_d(masso + sum_j coef_j * Y_j^{-d})
    # where Y^{-d} = rep(Y) rolled by -d (the counter-roll aligns the
    # target's basis with the source cell; the full-lane wrap lanes are
    # exactly where m_d vanishes).  24 rolls + ~40 ops become 24 rolls +
    # ~24 ops with the masso select absorbed.
    x1 = jnp.asarray(-0.5, f)
    Y0 = (z2 - x1) * dpo_kk
    Y1 = (z2 * z2 - x1 * x1) * (0.5 * dpo_kk)
    Y2 = (z2 * z2 * z2 - x1 * x1 * x1) * (dpo_kk / 3.0)
    Y0q, Y1q, Y2q = rep(Y0), rep(Y1), rep(Y2)

    def shift_term(mk, d):
        if d == 0:
            y0, y1, y2 = Y0q, Y1q, Y2q
        elif d > 0:
            y0, y1, y2 = (_rollR(Y0q, d), _rollR(Y1q, d), _rollR(Y2q, d))
        else:
            y0, y1, y2 = (_rollL(Y0q, -d), _rollL(Y1q, -d),
                          _rollL(Y2q, -d))
        g = masso + coef0 * y0 + coef1 * y1 + coef2 * y2
        gd = g if d == 0 else (_rollL(g, d) if d > 0 else _rollR(g, -d))
        return rep(mk) * gd

    if "sel" in _ABLATE:
        massn = shift_term(m_0, 0)
    else:
        massn = (shift_term(m_0, 0) + shift_term(m_1, 1)
                 + shift_term(m_m1, -1))
        far = lambda mn: ((mn + shift_term(m_2, 2)) + shift_term(m_3, 3)) \
            + shift_term(m_m2, -2)
        if _GATE:
            # f2 covers m_2+m_3; fd2 is m_m2 (see the _GATE comment)
            need_far = jnp.max(f2 + fd2) > 0.0
            massn = jax.lax.cond(need_far, far, lambda mn: mn, massn)
        else:
            massn = far(massn)
    # qdp_out[k] = massn[k] - massn[k-1] (massn[-1] = 0)
    prev = jnp.where(bot_bq, 0.0, _rollR(massn, 1))
    out_ref[...] = massn - prev


def remap_q_ppm_pallas_t(Qt, dp_star, dp_ref, alg=0, interpret=None,
                         eb=1, mxu=None):
    """PPM remap on T-layout fields.

    Qt:      [E, 16, q*k]  tracer mass (k lane-minor per tracer)
    dp_star: [E, 16, k]    source (Lagrangian) widths
    dp_ref:  [E, 16, k]    target (reference) widths
    mxu:     run the tracer-width exclusive prefix (masso) as per-chunk
             MXU dots instead of doubling rolls (default on when k fits
             one lane chunk; reassociates that sum at roundoff level).
    Returns remapped Qt, conserving each column's total mass.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, _, qk = Qt.shape
    nk = dp_star.shape[-1]
    nq = qk // nk
    f = Qt.dtype
    if mxu is None:
        mxu = nk <= 128 and _os.environ.get("TSE_PPM_MXU", "1") \
            not in ("0", "", "off")
    mxu = bool(mxu and nk <= 128)
    masks_np, csteps = _masks_host(nq, nk)
    masks = jnp.asarray(masks_np, f)
    if E % eb != 0:
        eb = 1

    be = lambda s2: pl.BlockSpec((eb, N2, s2), lambda e: (e, 0, 0),
                                 memory_space=pltpu.VMEM)
    bm = pl.BlockSpec((8, qk), lambda e: (0, 0),
                      memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, nq, nk, alg, csteps, mxu)
    extra_in, extra_specs = [], []
    if mxu:
        cw = jnp.asarray(_cumsum_weights(nq, nk), f)
        extra_in.append(cw)
        extra_specs.append(pl.BlockSpec(cw.shape, lambda e: (0, 0, 0, 0),
                                        memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(E // eb,),
        in_specs=[be(qk), be(nk), be(nk), bm] + extra_specs,
        out_specs=be(qk),
        out_shape=jax.ShapeDtypeStruct((E, N2, qk), f),
        # the ~35 [eb,16,qk] intermediates exceed the 16M default scoped
        # vmem at eb >= 3; the chip has headroom (same cap as the euler
        # kernel)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Qt, dp_star, dp_ref, masks, *extra_in)
