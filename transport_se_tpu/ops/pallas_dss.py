"""Pallas face-shift DSS kernel: assembly at HBM bandwidth.

Device kernel for the face-shift DSS formulation of ops/dss_face.py
(reference: edge_mod.F90:366 `edgeVpack`, :648 `edgeVunpack`,
bndry_mod.F90:21 `bndry_exchangeV` — here one fused streaming pass).  The
XLA formulation materializes every shifted slice in HBM (~10+ passes); this
kernel keeps the whole block in VMEM and reads/writes each field element
once (~2.2 ms floor at NE30/35 tracers vs ~17 ms scatter-add assembly).

Grid: (6 faces, ne/by row-blocks, B/bc lane chunks).  A block holds `by`
full element rows of one face: [by, ne, 16, bc].  Within-face partners are
in-block slices; rows above/below the block arrive via two extra 1-row
BlockSpecs on the same array (clamped at face edges, replaced there by seam
ghosts); the 12 cube seams and the across-seam corner diagonals come from
four ghost strips [6, ne+2, 4, B] whose zero padding rows encode the
missing diagonal at cube vertices.

Optional fusion (saves two HBM round trips of the field per stage):
post-DSS rspheremp scale (make_C0 epilogue, prim_advection_mod.F90:929-960)
and the next stage's limiter-bound min/max over element points
(euler_step :750-778).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from .pallas_euler import (_ddy_mask_mat, _dmat_np, _lap_wk, _roll_coeffs,
                           _smet)

# lane-chunk width of the face-DSS grid (bigger chunks = fewer ghost-strip
# re-DMAs per row block, larger row blocks via _pick_by's byte cap).
# Hardware A/B (artifacts/dss_ab_r03.txt): isolated, the minmax+lap
# epilogue is ~9% faster at bc=512 (15.8 vs 17.3 ms) while the plain
# scale epilogue prefers bc=128 (8.9 vs 9.6 ms).  End-to-end, though,
# bc=512 for the minmax variants REGRESSES bench.py reproducibly
# (0.707/0.707 vs 0.720 at 128) — the by=2 row blocks it forces
# pipeline worse against the surrounding kernels — so the default stays
# 128 for all variants; TSE_DSS_BC forces one width for both.
DSS_BC = int(_os.environ.get("TSE_DSS_BC", "0"))  # 0 = auto (128)
# 0 = auto: 4M (by=15 at NE30) for ALL variants.  The early-r4 finding
# that the epilogue variants prefer 2M did not survive the limiter
# full-unroll pipeline change: re-swept end-to-end after it, 4M benches
# 0.890 vs 0.879 at 2M (grid-step overhead dominates at small by; the
# heavy variants fit comfortably at by=15 under the 100M scoped-vmem
# cap).  8M (by=30) fails to compile.
DSS_BLOCK_CAP = int(_os.environ.get("TSE_DSS_BLOCK_CAP", "0"))
# assembly form: sectioned out_ref stores (i-plane quarters + middle
# half) instead of full-block concat trees — fewer whole-block VMEM
# copies (A/B'd on hardware; 0 = concat form)
DSS_STORE = _os.environ.get("TSE_DSS_STORE", "1") not in ("0", "", "off")
# neighbor-minmax lane width (0 = DSS_BC or the 512 default — this
# kernel is launch/strip-bound, wider lanes win; the field DSS kernels
# keep 128, see DSS_BC note)
NBR_BC = int(_os.environ.get("TSE_NBR_BC", "0"))


def _pick_by(ne: int, bc: int, heavy: bool = True) -> int:
    """Row-block height: divisor of ne, block size <= the byte cap."""
    cap_b = DSS_BLOCK_CAP or 4_000_000
    cap = max(1, cap_b // (ne * 16 * bc * 4))
    return max(d for d in range(1, ne + 1) if ne % d == 0 and d <= cap)


def _dss_face_kernel(by, ne, nlev, with_scale, with_minmax, with_lap,
                     with_avg,
                     x_ref, xu_ref, xd_ref,
                     gpx_ref, gmx_ref, gpy_ref, gmy_ref,
                     rsp_ref, dp_ref, met_ref, cx_ref, cy_ref,
                     cxt_ref, cyt_ref, mask_ref, dm_ref, avg_ref,
                     out_ref, qmin_ref=None, qmax_ref=None, lap_ref=None):
    f = x_ref.dtype
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    row0 = r * by

    x = x_ref[0]                    # [by, ne, 16, bc]
    bc = x.shape[-1]

    # ---- +-x edge partners (ex shifts within rows; seams from ghosts) ----
    gpx = gpx_ref[0, pl.ds(row0 + 1, by)]       # [by, 4, bc] edge rows
    gmx = gmx_ref[0, pl.ds(row0 + 1, by)]
    S_px = jnp.concatenate([x[:, 1:, 0:4, :], gpx[:, None]], axis=1)
    S_mx = jnp.concatenate([gmx[:, None], x[:, :-1, 12:16, :]], axis=1)

    # ---- +-y sources: slot rows (i,0) of the row above / (i,3) below ----
    xv = x.reshape(by, ne, 4, 4, bc)
    is_top = r == nr - 1
    is_bot = r == 0
    up_in = xu_ref[0, 0].reshape(ne, 4, 4, bc)[:, :, 0, :]    # [ne, 4, bc]
    dn_in = xd_ref[0, 0].reshape(ne, 4, 4, bc)[:, :, 3, :]
    gpy = gpy_ref[0, 1:ne + 1]                                # [ne, 4, bc]
    gmy = gmy_ref[0, 1:ne + 1]
    up_row = jnp.where(is_top, gpy, up_in)
    dn_row = jnp.where(is_bot, gmy, dn_in)
    rows_above = jnp.concatenate(
        [xv[1:, :, :, 0, :], up_row[None]], axis=0)           # [by,ne,4,bc]
    rows_below = jnp.concatenate(
        [dn_row[None], xv[:-1, :, :, 3, :]], axis=0)

    # ---- corner diagonals (the diagonal element's coincident slot) ----
    # (+x,+y): slot (0,0) of (ey+1, ex+1); +x seam: ghost row j=0 at ey+1
    d_pp = jnp.concatenate(
        [rows_above[:, 1:, 0, :],
         gpx_ref[0, pl.ds(row0 + 2, by), 0][:, None]], axis=1)
    # (+x,-y): slot (0,3) of (ey-1, ex+1); +x seam: ghost row j=3 at ey-1
    d_pm = jnp.concatenate(
        [rows_below[:, 1:, 0, :],
         gpx_ref[0, pl.ds(row0, by), 3][:, None]], axis=1)
    # (-x,+y): slot (3,0) of (ey+1, ex-1); -x seam: ghost row j=0 at ey+1
    d_mp = jnp.concatenate(
        [gmx_ref[0, pl.ds(row0 + 2, by), 0][:, None],
         rows_above[:, :-1, 3, :]], axis=1)
    # (-x,-y): slot (3,3) of (ey-1, ex-1); -x seam: ghost row j=3 at ey-1
    d_mm = jnp.concatenate(
        [gmx_ref[0, pl.ds(row0, by), 3][:, None],
         rows_below[:, :-1, 3, :]], axis=1)

    # ---- assemble via concat placement (no scatter, no masks) ----
    z2 = jnp.zeros((by, ne, 2, bc), f)
    if DSS_STORE:
        # sectioned form: every output slot-plane gets all its terms in
        # one place, so only ONE full-block concat materializes (the
        # original form built ~5 full blocks: two zero-padded i-plane
        # trees plus two j-plane trees plus their adds).  Term grouping
        # reproduces the original form's association BITWISE:
        # (x + (S + diag)) + yterm per slot (the banded sharded DSS is
        # certified bitwise against this kernel).
        ra = rows_above                           # [by, ne, 4(i), bc]
        rb = rows_below
        dc = lambda a, b: jnp.concatenate(
            [a[:, :, None], z2, b[:, :, None]], axis=2)       # j: a,0,0,b
        top = (x[:, :, 0:4, :] + (S_mx + dc(d_mm, d_mp))) \
            + dc(rb[:, :, 0], ra[:, :, 0])                    # slots 0..3
        bot = (x[:, :, 12:16, :] + (S_px + dc(d_pm, d_pp))) \
            + dc(rb[:, :, 3], ra[:, :, 3])                    # slots 12..15
        mid = x[:, :, 4:12, :] + jnp.concatenate(
            [dc(rb[:, :, 1], ra[:, :, 1]),
             dc(rb[:, :, 2], ra[:, :, 2])], axis=2)           # slots 4..11
        res = jnp.concatenate([top, mid, bot], axis=2)
    else:
        g_i0 = S_mx + jnp.concatenate(
            [d_mm[:, :, None], z2, d_mp[:, :, None]], axis=2)  # slots 0..3
        g_i3 = S_px + jnp.concatenate(
            [d_pm[:, :, None], z2, d_pp[:, :, None]], axis=2)  # slots 12..15
        zmid = jnp.zeros((by, ne, 8, bc), f)
        res = x + jnp.concatenate([g_i0, zmid, g_i3], axis=2)
        z3 = jnp.zeros((by, ne, 4, 3, bc), f)
        t_py = jnp.concatenate([z3, rows_above[..., None, :]], axis=3)
        t_my = jnp.concatenate([rows_below[..., None, :], z3], axis=3)
        res = res + (t_py + t_my).reshape(by, ne, 16, bc)

    if with_scale:
        res = res * rsp_ref[0][..., None]
    if with_avg:
        # fused qdp_time_avg (prim_advection_mod.F90:645-662 u/3 + 2u'/3):
        # out = (qprev + 2*res) / 3 — saves the separate elementwise
        # pass's two extra HBM trips of the field
        # divide (not *1/3): bitwise-matches the unfused (q + 2*q3)/3
        res = (avg_ref[0] + jnp.asarray(2.0, f) * res) \
            / jnp.asarray(3.0, f)
    out_ref[0] = res
    if with_minmax:
        # lane l of chunk b holds level (b*bc + l) % nlev (lanes are the
        # flattened (tracer, level) axis, level minor; chunk boundaries
        # need not align with tracers).  Build the per-lane dp by tiling
        # dp to a 128-aligned width (Mosaic's dynamic lane rotate requires
        # it) and rotating to the chunk's phase:
        # dpl[l] = dp[(start + l) % nlev] with start = (b*bc) % nlev —
        # valid because the tile width covers start + bc and is a
        # multiple of nlev over that range.
        t = -(-(bc + nlev) // nlev)
        Lt = -(-(t * nlev) // 128) * 128
        dp_t = jnp.concatenate(
            [dp_ref[0]] * t
            + [jnp.zeros(dp_ref.shape[1:4] + (Lt - t * nlev,), f)],
            axis=-1)
        start = (pl.program_id(2) * bc) % nlev
        dpl = pltpu.roll(dp_t, -start, axis=3)[..., :bc]
        q = res / dpl
        qmin_ref[0] = q.min(axis=2)
        qmax_ref[0] = q.max(axis=2)
        if with_lap and _os.environ.get("TSE_DSS_ABLATE_LAP"):
            # profiling-only: keep the lap output's DMA, skip its VPU work
            lap_ref[0] = q
        elif with_lap:
            # weak Laplacian of Q = out/dp in the epilogue — the
            # biharmonic stage's first laplace_sphere_wk
            # (viscosity_mod.F90:289-351) without a separate HBM round
            # trip of the field.  Roll form: ~7 ms of VPU at NE30/35tr
            # (scripts/bench_dss_lap_ablate.py: no-lap 6.1, +DMA 7.3,
            # full 14.3); a merged [by, ne*16, bc] wide-roll form
            # (_roll16_m) was measured WORSE (17.8 ms) — long sublane
            # rolls cost more than the narrow per-element 16-rolls.
            # LAP_FORM picks rolls vs broadcast FMAs (pallas_euler._lap_wk).
            met = met_ref[0]                       # [by, ne, 3, 16] _smet
            # slice-then-swap (int+None fancy indexing lowers to an
            # unsupported >2D gather in Mosaic)
            msel = lambda i: jnp.swapaxes(met[:, :, i:i + 1, :], -1, -2)
            lap_ref[0] = _lap_wk(q, msel(0), msel(1), msel(2),
                                 cx_ref[:], cy_ref[:],
                                 cxt_ref[:], cyt_ref[:], mask_ref[:],
                                 dm_ref[:])


def dss_face_pallas(x_t, ft, rsp=None, dp=None, nlev=None, interpret=None,
                    lap_arrays=None, avg=None):
    """Face-shift DSS on x_t [E, 16, B] (raster face order).

    rsp: optional [E, 16] rspheremp — fused post-scale (make_C0).
    dp:  optional [E, 16, nlev] next-stage layer thickness — also return
         qmin/qmax [E, B] of Q = out/dp (requires rsp; B = nq*nlev, level
         minor).  Returns (out, qmin, qmax) then, else out.
    lap_arrays: optional dict(Dinv, spheremp, deriv) — additionally emit
         laplace_sphere_wk(out/dp) (requires dp); appended to the return
         tuple.
    avg: optional [E, 16, B] previous-timestep field — fuse qdp_time_avg:
         out = (avg + 2*scaled)/3 (prim_advection_mod.F90:645-662;
         requires rsp).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ne = ft.ne
    E, nn, B = x_t.shape
    f = x_t.dtype
    with_minmax = dp is not None
    with_lap = lap_arrays is not None
    if with_lap and not with_minmax:
        raise ValueError("lap fusion requires dp")
    with_avg = avg is not None
    if with_avg and rsp is None:
        raise ValueError("avg fusion requires rsp")
    if with_minmax:
        nlev = dp.shape[-1]
        if rsp is None:
            raise ValueError("minmax fusion requires rsp")
    # Mosaic wants the last block dim 128-divisible (or whole): pad the
    # lane axis up and chunk by 128s; padded lanes carry zeros through the
    # assembly (harmless) and are sliced off on return.
    Bp = -(-B // 128) * 128
    if Bp != B:
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, Bp - B)))
    want = DSS_BC or 128
    bc = want if Bp % want == 0 else (128 if Bp % 128 == 0 else Bp)
    while Bp % bc:
        bc = Bp
    by = _pick_by(ne, bc, heavy=with_minmax or with_avg)

    xf = x_t.reshape(E * nn, Bp)

    def strips(gidx):
        g = xf[gidx].astype(f)                # [6, ne, 4, Bp]
        z = jnp.zeros((6, 1, 4, Bp), f)
        return jnp.concatenate([z, g, z], axis=1)

    gpx, gmx = strips(ft.ghost_px), strips(ft.ghost_mx)
    gpy, gmy = strips(ft.ghost_py), strips(ft.ghost_my)

    x6 = x_t.reshape(6, ne, ne, nn, Bp)
    nr = ne // by
    nb = Bp // bc

    bmain = pl.BlockSpec((1, by, ne, nn, bc),
                         lambda face, r, b: (face, r, 0, 0, b),
                         memory_space=pltpu.VMEM)
    brow_up = pl.BlockSpec(
        (1, 1, ne, nn, bc),
        lambda face, r, b: (face, jnp.minimum(r * by + by, ne - 1), 0, 0, b),
        memory_space=pltpu.VMEM)
    brow_dn = pl.BlockSpec(
        (1, 1, ne, nn, bc),
        lambda face, r, b: (face, jnp.maximum(r * by - 1, 0), 0, 0, b),
        memory_space=pltpu.VMEM)
    bstrip = pl.BlockSpec((1, ne + 2, 4, bc),
                          lambda face, r, b: (face, 0, 0, b),
                          memory_space=pltpu.VMEM)

    if rsp is not None:
        rsp6 = rsp.reshape(6, ne, ne, nn).astype(f)
        brsp = pl.BlockSpec((1, by, ne, nn),
                            lambda face, r, b: (face, r, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        rsp6 = jnp.zeros((6, 1, 1, 1), f)
        brsp = pl.BlockSpec((1, 1, 1, 1), lambda face, r, b: (face, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    if with_minmax:
        dp6 = dp.reshape(6, ne, ne, nn, nlev).astype(f)
        bdp = pl.BlockSpec((1, by, ne, nn, nlev),
                           lambda face, r, b: (face, r, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        bmm = pl.BlockSpec((1, by, ne, bc),
                           lambda face, r, b: (face, r, 0, b),
                           memory_space=pltpu.VMEM)
        out_specs = [bmain, bmm, bmm]
        out_shape = [jax.ShapeDtypeStruct(x6.shape, f),
                     jax.ShapeDtypeStruct((6, ne, ne, Bp), f),
                     jax.ShapeDtypeStruct((6, ne, ne, Bp), f)]
    else:
        dp6 = jnp.zeros((6, 1, 1, 1, 1), f)
        bdp = pl.BlockSpec((1, 1, 1, 1, 1),
                           lambda face, r, b: (face, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        out_specs = [bmain]
        out_shape = [jax.ShapeDtypeStruct(x6.shape, f)]

    bcoef = pl.BlockSpec((nn, 4), lambda face, r, b: (0, 0),
                         memory_space=pltpu.VMEM)
    if with_lap:
        Dinv = lap_arrays["Dinv"]
        s00, s01, s11 = _smet(Dinv[..., 0, 0], Dinv[..., 0, 1],
                              Dinv[..., 1, 0], Dinv[..., 1, 1],
                              lap_arrays["spheremp"])
        met5 = jnp.stack(
            [s00.reshape(E, 16), s01.reshape(E, 16), s11.reshape(E, 16)],
            axis=1).astype(f).reshape(6, ne, ne, 3, nn)
        bmet = pl.BlockSpec((1, by, ne, 3, nn),
                            lambda face, r, b: (face, r, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        deriv_np = np.asarray(lap_arrays["deriv"])
        cx, cy = _roll_coeffs(deriv_np, transpose=False)
        cxt, cyt = _roll_coeffs(deriv_np, transpose=True)
        dmat = _dmat_np(deriv_np)
        out_specs.append(bmain)
        out_shape.append(jax.ShapeDtypeStruct(x6.shape, f))
    else:
        met5 = jnp.zeros((6, 1, 1, 1, 1), f)
        bmet = pl.BlockSpec((1, 1, 1, 1, 1),
                            lambda face, r, b: (face, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        cx = cy = cxt = cyt = dmat = np.zeros((nn, 4))

    if with_avg:
        if Bp != B:
            avg = jnp.pad(avg, ((0, 0), (0, 0), (0, Bp - B)))
        avg6 = avg.reshape(6, ne, ne, nn, Bp).astype(f)
        bavg = bmain
    else:
        avg6 = jnp.zeros((6, 1, 1, 1, 1), f)
        bavg = pl.BlockSpec((1, 1, 1, 1, 1),
                            lambda face, r, b: (face, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_dss_face_kernel, by, ne, nlev,
                               rsp is not None, with_minmax, with_lap,
                               with_avg)
    outs = pl.pallas_call(
        kernel,
        grid=(6, nr, nb),
        in_specs=[bmain, brow_up, brow_dn,
                  bstrip, bstrip, bstrip, bstrip, brsp, bdp, bmet,
                  bcoef, bcoef, bcoef, bcoef, bcoef, bcoef, bavg],
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        # the lap-epilogue variant carries two full outputs + metric
        # blocks past the 16M default scoped-vmem cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x6, x6, x6, gpx, gmx, gpy, gmy, rsp6, dp6, met5,
      jnp.asarray(cx, f), jnp.asarray(cy, f),
      jnp.asarray(cxt, f), jnp.asarray(cyt, f),
      jnp.asarray(_ddy_mask_mat(), f), jnp.asarray(dmat, f), avg6)

    if with_minmax:
        ret = [outs[0].reshape(E, nn, Bp)[..., :B],
               outs[1].reshape(E, Bp)[..., :B],
               outs[2].reshape(E, Bp)[..., :B]]
        if with_lap:
            ret.append(outs[3].reshape(E, nn, Bp)[..., :B])
        return tuple(ret)
    return outs.reshape(E, nn, Bp)[..., :B]


# ---------------------------------------------------------------------------
# limiter-bound preparation: per-element min/max of Q = Qdp/dp
# ---------------------------------------------------------------------------

def _minmax_kernel(nq, B, x_ref, dp_ref, qmin_ref, qmax_ref):
    """qmin/qmax over the 16 GLL points of Q = x/dp (euler_step :750-778).

    dp [eb, 16, nlev] is tiled along lanes in VMEM (lanes = (tracer,
    level), level minor) — no HBM-side repeat, no lane reshape.  The x
    operand may carry 128-padded lanes beyond B; they are sliced off.
    """
    x = x_ref[...][:, :, :B]             # [eb, 16, B]
    dp = dp_ref[...]
    dp_lane = pltpu.repeat(dp, nq, axis=2)
    q = x / dp_lane
    qmin_ref[...] = q.min(axis=1, keepdims=True)
    qmax_ref[...] = q.max(axis=1, keepdims=True)


def minmax_prep_pallas(x_t, dp, nq, interpret=None):
    """Per-element min/max over points of Q = x_t/dp.

    x_t: [E, 16, B] tracer mass (B = nq*nlev, level minor)
    dp:  [E, 16, nlev]
    Returns (qmin, qmax) [E, B].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, nn, Bp = x_t.shape
    nlev = dp.shape[-1]
    B = nq * nlev
    if Bp < B:
        raise ValueError("x_t lanes must cover nq*nlev")
    f = x_t.dtype
    cap = max(1, 1_500_000 // (nn * Bp * 4))
    eb = max(d for d in range(1, min(E, 64) + 1) if E % d == 0 and d <= cap)
    kernel = functools.partial(_minmax_kernel, nq, B)
    bx = pl.BlockSpec((eb, nn, Bp), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    bdp = pl.BlockSpec((eb, nn, nlev), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    bmm = pl.BlockSpec((eb, 1, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    qmin, qmax = pl.pallas_call(
        kernel,
        grid=(E // eb,),
        in_specs=[bx, bdp],
        out_specs=(bmm, bmm),
        out_shape=(jax.ShapeDtypeStruct((E, 1, B), f),
                   jax.ShapeDtypeStruct((E, 1, B), f)),
        interpret=interpret,
    )(x_t, dp.astype(f))
    return qmin[:, 0], qmax[:, 0]


# ---------------------------------------------------------------------------
# neighbor min/max: per-element 9-point (self + 8 neighbors) reduce
# ---------------------------------------------------------------------------

def _nbr_minmax_kernel(by, ne, nr1,
                       mn_ref, mx_ref, mnu_ref, mxu_ref, mnd_ref, mxd_ref,
                       smn_px_ref, smn_mx_ref, smn_py_ref, smn_my_ref,
                       smx_px_ref, smx_mx_ref, smx_py_ref, smx_my_ref,
                       gmin_ref, gmax_ref):
    """Min/max over each element and its 8 point-sharing neighbors
    (viscosity_mod.F90:748-816 neighbor_minmax; the element-level
    equivalent of ops/dss_face.py neighbor_minmax_face, in one streaming
    pass).

    Blocks are `by` element rows of one face: [by, ne, bc].  Rows above/
    below arrive via clamped 1-row BlockSpecs on the same arrays; at face
    edges they are replaced by the seam strips (ey-padded [ne+2, bc], pad
    rows = +-inf so the cube-vertex missing diagonal drops out).  Strips
    along ex (py/my sides) ride inside the block's shifted rows.

    nr1 (static): the row grid is one whole-face block — strip offsets
    become static so Mosaic's dynamic-slice prover accepts any lane
    width (wide-bc blocks fail its multiple-of-8 proof otherwise).
    """
    f = mn_ref.dtype
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    row0 = 0 if nr1 else r * by
    rds = (lambda o: slice(o, o + by)) if nr1 else \
        (lambda o: pl.ds(o, by))
    pinf = jnp.asarray(jnp.inf, f)

    def reduce_one(q_ref, up_ref, dn_ref, spx_ref, smx_ref, spy_ref,
                   smy_ref, op, pad):
        """Separable 3x3 reduce (r5): row-direction 3-windows first
        (m1), then the column direction reuses m1's interior rows —
        ~8 full-block materializations instead of 16.  Bitwise equal to
        the direct 9-term tree: min/max are exact and associative, and
        the corner operands coincide (m1[i+1]'s edge columns use the
        strip rows row0+2+i — exactly the old d_pp/d_mp corners)."""
        q = q_ref[0]                         # [by, ne, bc]
        # x-shifts within rows; the open column comes from the ex strips
        spx = spx_ref[0, rds(row0 + 1)][:, None]   # [by, 1, bc]
        smx = smx_ref[0, rds(row0 + 1)][:, None]
        xp = jnp.concatenate([q[:, 1:], spx], axis=1)
        xm = jnp.concatenate([smx, q[:, :-1]], axis=1)
        m1 = op(op(q, xp), xm)               # row-direction 3-window
        # rows above/below the block (clamped at face edges -> strips)
        if nr1:
            up = spy_ref[0, 1:ne + 1]
            dn = smy_ref[0, 1:ne + 1]
        else:
            is_top = r == nr - 1
            is_bot = r == 0
            up = jnp.where(is_top, spy_ref[0, 1:ne + 1], up_ref[0, 0])
            dn = jnp.where(is_bot, smy_ref[0, 1:ne + 1], dn_ref[0, 0])
        # row-direction 3-window of the boundary rows (small [ne, bc]):
        # corners from the +-1-ey-shifted ex strips (pad at cube
        # vertices), i.e. the strip rows the old diagonal terms read
        cu_p = spx_ref[0, rds(row0 + 2)][by - 1:by]      # [1, bc]
        cu_m = smx_ref[0, rds(row0 + 2)][by - 1:by]
        cd_p = spx_ref[0, rds(row0)][0:1]
        cd_m = smx_ref[0, rds(row0)][0:1]
        up_m1 = op(op(up, jnp.concatenate([up[1:], cu_p], axis=0)),
                   jnp.concatenate([cu_m, up[:-1]], axis=0))
        dn_m1 = op(op(dn, jnp.concatenate([dn[1:], cd_p], axis=0)),
                   jnp.concatenate([cd_m, dn[:-1]], axis=0))
        # column direction: the above/below row-mins are m1's shifted
        # interior rows + the boundary rows' own 3-windows
        ra = jnp.concatenate([m1[1:], up_m1[None]], axis=0)
        rb = jnp.concatenate([dn_m1[None], m1[:-1]], axis=0)
        return op(m1, op(ra, rb))

    gmin_ref[0] = reduce_one(mn_ref, mnu_ref, mnd_ref, smn_px_ref,
                             smn_mx_ref, smn_py_ref, smn_my_ref,
                             jnp.minimum, pinf)
    gmax_ref[0] = reduce_one(mx_ref, mxu_ref, mxd_ref, smx_px_ref,
                             smx_mx_ref, smx_py_ref, smx_my_ref,
                             jnp.maximum, -pinf)


def neighbor_minmax_pallas(qmin, qmax, ft, interpret=None):
    """qmin/qmax [E, B] per-element bounds, E in raster face order.

    Seam strips come from the src_* neighbor-element tables; the +-inf
    ey-padding encodes the partnerless cube-vertex diagonal exactly like
    ops/dss_face.py neighbor_minmax_face's sh_strip pad.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ne = ft.ne
    E, B = qmin.shape
    f = qmin.dtype
    Bp = -(-B // 128) * 128
    if Bp != B:
        # padded lanes must stay inert through min AND max: +inf/-inf
        qmin = jnp.pad(qmin, ((0, 0), (0, Bp - B)),
                       constant_values=np.inf)
        qmax = jnp.pad(qmax, ((0, 0), (0, Bp - B)),
                       constant_values=-np.inf)
    want = NBR_BC or DSS_BC or 128
    bc = want if Bp % want == 0 else (128 if Bp % 128 == 0 else Bp)
    while Bp % bc:
        bc = Bp
    # block-height cap WITHOUT _pick_by's 16-point factor: these blocks
    # are [by, ne, bc] per-element scalars, 16x smaller than field
    # blocks, and the kernel was launch-bound at the field-sized cap
    # (measured 4.0 ms vs a ~0.3 ms floor at NE30; whole-face rows fix it).
    # r5: whole-face blocks get static strip offsets (nr1) so wide lanes
    # compile (bc=512 was measured a wash, 3.6 vs 3.5 ms net — the cost
    # is the ~16 shifted-copy materializations, not launches; 128 stays)
    cap = max(1, (DSS_BLOCK_CAP or 4_000_000) // (ne * bc * 4))
    by = max(d for d in range(1, ne + 1) if ne % d == 0 and d <= cap)
    nr1 = by == ne

    def strips(q, src, pad):
        g = q[src]                            # [6, ne, Bp]
        p = jnp.full((6, 1, Bp), pad, f)
        return jnp.concatenate([p, g, p], axis=1)

    smn = [strips(qmin, s, np.inf) for s in
           (ft.src_px, ft.src_mx, ft.src_py, ft.src_my)]
    smx = [strips(qmax, s, -np.inf) for s in
           (ft.src_px, ft.src_mx, ft.src_py, ft.src_my)]

    q6n = qmin.reshape(6, ne, ne, Bp)
    q6x = qmax.reshape(6, ne, ne, Bp)
    nr = ne // by
    nb = Bp // bc

    bmain = pl.BlockSpec((1, by, ne, bc),
                         lambda face, r, b: (face, r, 0, b),
                         memory_space=pltpu.VMEM)
    brow_up = pl.BlockSpec(
        (1, 1, ne, bc),
        lambda face, r, b: (face, jnp.minimum(r * by + by, ne - 1), 0, b),
        memory_space=pltpu.VMEM)
    brow_dn = pl.BlockSpec(
        (1, 1, ne, bc),
        lambda face, r, b: (face, jnp.maximum(r * by - 1, 0), 0, b),
        memory_space=pltpu.VMEM)
    bstrip = pl.BlockSpec((1, ne + 2, bc),
                          lambda face, r, b: (face, 0, b),
                          memory_space=pltpu.VMEM)
    gmin, gmax = pl.pallas_call(
        functools.partial(_nbr_minmax_kernel, by, ne, nr1),
        grid=(6, nr, nb),
        in_specs=[bmain, bmain, brow_up, brow_up, brow_dn, brow_dn]
                 + [bstrip] * 8,
        out_specs=(bmain, bmain),
        out_shape=(jax.ShapeDtypeStruct(q6n.shape, f),
                   jax.ShapeDtypeStruct(q6n.shape, f)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q6n, q6x, q6n, q6x, q6n, q6x, *smn, *smx)
    return (gmin.reshape(E, Bp)[:, :B], gmax.reshape(E, Bp)[:, :B])
