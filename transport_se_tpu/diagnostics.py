"""Runtime diagnostics: global tracer mass / variance / extrema.

Equivalent of the reference state print (reference:
prim_state_mod.F90:73 `prim_printstate` — the "Q, Q diss, dQ^2/dt" line at
:381 — and :573 `prim_diag_scalars`; global integral from
global_norms_mod.F90:39).

Determinism: the reference uses repro_sum (fixed-point accumulation) so
diagnostics are bit-identical across MPI/thread counts.  Here the global
integral is a sum over the element axis in a fixed canonical (SFC) order —
XLA reductions over a fixed shape on a fixed mesh are deterministic, and the
element order never depends on the device count (elements are sharded in
canonical order), which gives the same invariance guarantee within one
platform.  Cross-platform bit-identity is not promised (documented).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .constants import DD_PI, G


def global_integral(m, h):
    """Area-normalized global integral: sum(mp*metdet*h)/(4*pi).

    h: [E, n, n] (or with batch dims after E broadcasting spheremp).
    """
    sp = m.spheremp
    nd = h.ndim
    sp = sp.reshape((sp.shape[0],) + (1,) * (nd - 3) + sp.shape[1:])
    return (h * sp).sum(axis=(0, -2, -1)) / (4.0 * DD_PI)


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


@dataclasses.dataclass
class StateLog:
    """Accumulates printstate lines; verifies conservation over the run."""
    steps: list = dataclasses.field(default_factory=list)
    masses: list = dataclasses.field(default_factory=list)
    variances: list = dataclasses.field(default_factory=list)

    def record(self, nstep, mass, var, qmin, qmax, dt, verbose=True):
        mass = np.asarray(mass)
        var = np.asarray(var)
        if verbose:
            for q in range(mass.size):
                if self.masses:
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
