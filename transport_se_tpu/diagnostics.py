"""Runtime diagnostics: global tracer mass / variance / extrema.

Equivalent of the reference state print (reference:
prim_state_mod.F90:73 `prim_printstate` — the "Q, Q diss, dQ^2/dt" line at
:381 — and :573 `prim_diag_scalars`; global integral from
global_norms_mod.F90:39).

Determinism: the reference uses repro_sum (fixed-point accumulation) so
diagnostics are bit-identical across MPI/thread counts.  The f64 global
integral here uses utils/repro_sum.py — integer-window accumulation with
exact int64 sums (repro_sum_mod.F90's mechanism) — which is bit-identical
across summation order, shard/process count, AND platform by
construction.  The f32 perf path keeps the plain canonical-order XLA
reduction (deterministic within a platform; diagnostics are normally off
there).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .constants import DD_PI, G, RREARTH


def global_integral(m, h):
    """Area-normalized global integral: sum(mp*metdet*h)/(4*pi).

    h: [E, n, n] (or with batch dims after E broadcasting spheremp).
    f64 sums go through repro_sum (global_norms_mod.F90:39 uses
    repro_sum for exactly this integral).
    """
    from .utils import repro_sum
    sp = m.spheremp
    nd = h.ndim
    sp = sp.reshape((sp.shape[0],) + (1,) * (nd - 3) + sp.shape[1:])
    return repro_sum(h * sp, axis=(0, -2, -1)) / (4.0 * DD_PI)


def tracer_diagnostics(m, Qdp, Q):
    """Per-tracer (mass, variance, min, max) — the prim_diag_scalars set.

    mass(q) = I[ sum_k Qdp ] / g   (kg/m^2, dcmip_wrapper:303)
    var(q)  = I[ sum_k Qdp*Q ]
    """
    col_mass = Qdp.sum(axis=2)            # [E, q, n, n]
    col_var = (Qdp * Q).sum(axis=2)
    mass = global_integral(m, col_mass) / G
    var = global_integral(m, col_var)
    qmin = Q.min(axis=(0, 2, 3, 4))
    qmax = Q.max(axis=(0, 2, 3, 4))
    return mass, var, qmin, qmax


def print_cfl(m, cfg, umax: float = 120.0, verbose: bool = True):
    """Startup stability-limit self-check (global_norms_mod.F90:232
    `print_cfl`): prints the advective and hyperviscous dt limits from the
    metric's Dinv pseudo-norm and the published GLL derivative eigenvalues
    (:276-283 "Eigenvalues calculated by folks at UMich": np=4 ->
    lambda_max=2.74, lambda_vis=30.0).

    Returns (dt_tracer_limit, dt_hypervis_limit) in seconds so the driver
    can warn on violation; reference formulas at :516-537.
    """
    lambda_max = {2: 0.5, 3: 1.5, 4: 2.74}.get(m.grid.np, 0.0)
    lambda_vis = {3: 12.0, 4: 30.0}.get(m.grid.np, 0.0)
    Dinv = np.asarray(m.Dinv, dtype=np.float64)   # [E, i, j, 2, 2]
    gx = Dinv[..., 0, :]   # contravariant basis rows (cube_mod.F90:329-336)
    gy = Dinv[..., 1, :]
    norm = np.sqrt((gx * gx).sum(-1) + (gy * gy).sum(-1)
                   + 2.0 * np.abs((gx * gy).sum(-1)))
    max_normDinv = float(norm.max())
    min_gw = float(np.asarray(m.grid.gll_w).min())

    dt_euler = min_gw / (umax * max_normDinv * RREARTH)
    dt_tracer = 1.0 / (umax * max_normDinv * lambda_max * RREARTH)
    normDinv_hypervis = (lambda_vis ** 2) * (RREARTH * max_normDinv) ** 4
    dt_hv = (1.0 / (cfg.nu_q * normDinv_hypervis)
             if cfg.nu_q > 0 else np.inf)
    # subcycled hyperviscosity runs at dt/hypervis_subcycle_q, so the
    # limit on the full tracer step scales up (prim_driver_mod.F90:461
    # dt_tracer_vis = dt_tracer_vis/hypervis_subcycle_q).  The shipped
    # CPU euler_step path never subcycles (fused rhs_viss; only
    # cuda_mod.F90:664 loops) — this factor affects the self-check only.
    dt_hv = dt_hv * cfg.hypervis_subcycle_q
    if verbose:
        print("CFL estimates in terms of S=time step stability region")
        print(f"SSP preservation (120m/s) RKSSP euler step dt  < S * "
              f"{dt_euler:10.2f} s")
        print(f"Stability: advective (120m/s)   dt_tracer < S * "
              f"{dt_tracer:10.2f} s")
        if cfg.nu_q > 0:
            print(f"Stability: nu_q   hyperviscosity dt < S * {dt_hv:10.2f} s")
    return dt_tracer, dt_hv


def test_global_integral(m) -> float:
    """Sphere-area self-check: integral of 1 must be 4*pi to roundoff
    (global_norms_mod.F90:96 `test_global_integral`; run at prim_init2
    :437).  Returns the relative error."""
    one = jnp.ones(m.spheremp.shape, m.spheremp.dtype)
    return abs(float(global_integral(m, one)) - 1.0)


def print_state(m, Qdp, ps_v, vn0=None):
    """Full prim_printstate analog: min/max/(area-weighted) sum of the wind,
    surface pressure, and tracers (prim_state_mod.F90:73-392).  Under
    prescribed winds u/v are the analytic fields so their stats are a
    self-check, not a prognostic diagnostic."""
    lines = []

    def stat(name, x, wsum=None):
        x = np.asarray(x)
        s = (f"{name:>6}= {x.min(): .15e} {x.max(): .15e}")
        if wsum is not None:
            s += f" {float(wsum): .15e}"
        lines.append(s)

    ps = np.asarray(ps_v)
    stat("ps", ps, global_integral(m, jnp.asarray(ps)))
    if vn0 is not None:
        v = np.asarray(vn0)
        stat("u", v[:, :, 0])
        stat("v", v[:, :, 1])
    Q = np.asarray(Qdp)
    for q in range(Q.shape[1]):
        stat(f"Q{q+1}dp", Q[:, q])
    return "\n".join(lines)


def energy_diagnostics(m, nstep: int, ps_v=None):
    """Global KE / IE / PE integrals (prim_state_mod.F90:399
    `prim_energy_halftimes`; KE = I[sum_k 0.5|v|^2 dp]/g etc.).  Under
    prescribed winds the velocity and temperature are analytic, so these
    are monitoring quantities, not a conserved budget.  Returns a dict of
    scalars (kg-normalized, W/m^2-compatible units like the reference)."""
    import jax.numpy as jnp
    from .constants import CP, G, P0, SCALE_HEIGHT, T0
    from .model import dcmip

    cfg = m.cfg
    t = max(nstep - 1, 0) * cfg.tstep
    v = dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, t)  # [E,k,2,n,n]
    dp = m.dp0col[None, :, None, None]
    ke_col = (0.5 * (v[:, :, 0] ** 2 + v[:, :, 1] ** 2) * dp).sum(axis=1)
    ke = float(global_integral(m, ke_col)) / G
    # isothermal atmosphere: IE = cp*T0*M/g; PE from phi = g*H*log(1/eta)
    mass_col = jnp.broadcast_to(dp, v[:, :, 0].shape).sum(axis=1)
    ie = CP * T0 * float(global_integral(m, mass_col)) / G
    phi = G * SCALE_HEIGHT * jnp.log(1.0 / m.etam)
    pe_col = (phi[None, :, None, None] * dp).sum(axis=1)
    pe = float(global_integral(m, pe_col)) / G
    return {"KE": ke, "IE": ie, "PE": pe}


def flow_fields(m, nstep: int):
    """History flow diagnostics at step `nstep`: winds, C0 vorticity and
    divergence, omega, T (prim_movie_mod.F90:395+ compute_zeta_C0 etc.;
    make_C0 from viscosity_mod.F90:445).  Under prescribed winds these are
    analytic + assembled, not prognostic.  Returns a dict of host arrays.
    """
    import jax.numpy as jnp
    from .constants import P0, T0
    from .model import dcmip
    from .ops import sphere_ops as so
    from .ops.dss import dss_scale

    cfg = m.cfg
    t = max(nstep - 1, 0) * cfg.tstep
    v = dcmip.winds(cfg.test_case, m.lon, m.lat, m.etam, t)  # [E,k,2,n,n]
    zeta = so.vorticity_sphere(v, m.deriv, m.D, m.rmetdet)
    div = so.divergence_sphere(v, m.deriv, m.Dinv, m.metdet, m.rmetdet)
    zeta = dss_scale(zeta, m.spheremp, m.rspheremp, m.tables)
    div = dss_scale(div, m.spheremp, m.rspheremp, m.tables)
    omega = dcmip.eta_dot_dpdn(cfg.test_case, m.lon, m.lat, m.etam, t)
    T = jnp.full(zeta.shape, T0, zeta.dtype)   # isothermal test atmosphere
    # ke = (u^2+v^2)/2 (prim_movie_mod.F90:470-481); Th = T*(p/p0)^-kappa
    # (:422-440) with p = p0*etam in the prescribed-wind tests
    from .constants import KAPPA
    ke = 0.5 * (v[:, :, 0] ** 2 + v[:, :, 1] ** 2)
    Th = T * (m.etam[None, :, None, None] ** (-KAPPA))
    return {"u": np.asarray(v[:, :, 0]), "v": np.asarray(v[:, :, 1]),
            "zeta": np.asarray(zeta), "div": np.asarray(div),
            "omega": np.asarray(omega), "T": np.asarray(T),
            "ke": np.asarray(ke), "Th": np.asarray(Th)}


@dataclasses.dataclass
class StateLog:
    """Accumulates printstate lines; verifies conservation over the run."""
    steps: list = dataclasses.field(default_factory=list)
    masses: list = dataclasses.field(default_factory=list)
    variances: list = dataclasses.field(default_factory=list)

    def record(self, nstep, mass, var, qmin, qmax, dt, verbose=True,
               prev=None):
        """One printstate line per tracer.

        `prev` = (mass, var) at the diagnosed subcycle's START — the
        reference's half-time-1 sample, so "Q diss" is
        (Qmass(2)-Qmass(1))/dt with dt = one tracer step
        (prim_state_mod.F90:381; half-times collapse pairwise on the RK2
        path).  Without prev, falls back to the previous record.
        """
        mass = np.asarray(mass)
        var = np.asarray(var)
        if verbose:
            for q in range(mass.size):
                if prev is not None:
                    m0, v0 = np.asarray(prev[0]), np.asarray(prev[1])
                    dm = mass[q] - m0[q]
                    dv = var[q] - v0[q]
                    print(f"Q{q+1},Q diss, dQ^2/dt: {mass[q]:.14E} kg/m^2 "
                          f"{dm/dt:15.7E} {dv/dt:15.7E}")
                elif self.masses:
                    dm = (mass[q] - self.masses[-1][q])
                    dv = (var[q] - self.variances[-1][q])
                    print(f"Q{q+1},Q diss, dQ^2/dt: {mass[q]:.14E} kg/m^2 "
                          f"{dm/dt:15.7E} {dv/dt:15.7E}")
                else:
                    print(f"Q{q+1}: {mass[q]:.14E} kg/m^2  "
                          f"min={np.asarray(qmin)[q]:.6e} "
                          f"max={np.asarray(qmax)[q]:.6e}")
        self.steps.append(int(nstep))
        self.masses.append(mass)
        self.variances.append(var)

    def max_relative_mass_drift(self):
        m = np.asarray(self.masses)
        return float(np.abs((m - m[0]) / m[0]).max())
