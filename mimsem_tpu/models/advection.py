"""2D advection of a 2-form tracer with explicit strong-stability RK3.

Capability parity with the reference's advection drivers (src/SolidBody.cpp,
src/DeformFlow.cpp; the AdvEqn class itself survives in dep/sandbox).  The
semi-discrete form is the mimetic flux formulation
    dh/dt = -E21 F,   F = M1^-1 Uh(h) u
(mass flux F as in the SW diagnose_F, src/SWEqn_Picard.cpp:253-284), advanced
with the Shu-Osher SSP-RK3 used by the EEC schemes
(src/ThermalSW_EEC_2.cpp:859-1003).  Mass sum(h) is conserved to round-off
because E21 rows sum telescopically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.forms import SpaceOps


class AdvEqn:
    def __init__(self, ops: SpaceOps, dt: float, mass_tol: float = None):
        self.ops = ops
        self.dt = dt
        if mass_tol is None:
            mass_tol = 1e-13 if ops.dtype == jnp.float64 else 1e-6
        self.mass_tol = mass_tol
        self._step = jax.jit(self._step_impl)

    def rhs(self, h, u):
        ops = self.ops
        F = ops.solve_M1(ops.apply_M1(u, h), tol=self.mass_tol)
        return -ops.e21(F)

    def _step_impl(self, h, u):
        dt = self.dt
        k1 = self.rhs(h, u)
        h1 = h + dt * k1
        k2 = self.rhs(h1, u)
        h2 = 0.75 * h + 0.25 * (h1 + dt * k2)
        k3 = self.rhs(h2, u)
        return (h / 3.0 + (2.0 / 3.0) * (h2 + dt * k3)).astype(self.ops.dtype)

    def step(self, h, u):
        return self._step(h, u)

    def run_steps(self, h, u, nsteps: int):
        def body(carry, _):
            return self._step_impl(carry, u), None
        h, _ = jax.lax.scan(body, h, None, length=nsteps)
        return h

    def run_steps_t(self, h, vel_fn, nsteps: int, t0: float = 0.0):
        """Time-dependent velocity: vel_fn(t) -> 1-form, evaluated at the
        step midpoint INSIDE the scanned step (one compile, no per-step
        dispatch -- the reference rebuilds u each step in the driver loop,
        src/DeformFlow.cpp:84-96)."""
        def body(carry, i):
            u = vel_fn(t0 + (i + 0.5) * self.dt)
            return self._step_impl(carry, u), None
        h, _ = jax.lax.scan(body, h, jnp.arange(nsteps))
        return h
