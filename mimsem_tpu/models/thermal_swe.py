"""Thermal shallow water with energy & entropy conserving (EEC) formulation.

TPU re-design of the reference ThermalSW_EEC_2 (src/ThermalSW_EEC_2.{h,cpp};
Ricardo, Lee & Duru, JCP 496:112605, 2024).  State (u, h, S) with S = s*h the
depth-integrated buoyancy; explicit Shu-Osher SSP-RK3 (solve_rk,
src/ThermalSW_EEC_2.cpp:859-1003).

Per-stage diagnostics (all from the current stage state):
  s   = M2h(h)^-1 M2 S                          (:241-251)
  F   = M1^-1 M1h(h) u                          (:1005-1017)
  Phi = K(u)u + 1/2 M2 S + 1/4 M2h(s) h         (:1019-1043)
  ds  = M1h(h)^-1 E12 M2 s                      (:253-268)
  G   = M1^-1 M1h(s) F                          (:270-280)
  q   = M0h(h)^-1 (E01 M1 u + M0 f)             (:227-239)
Momentum rhs (:1045-1093):
  fu = E12 Phi + R(q) F + 1/4 M1h(s) grad(h) - 1/2 K(ds)^T [M2^-1 M2h(h) h]
Buoyancy rhs (:1095-1146):
  fS = 1/2 M2 E21 G + 1/2 M2h(s) E21 F + K(grad(s)) F
Continuity: dh/dt = -E21 F.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.forms import SpaceOps
from ..utils import diagnostics as dg

EARTH_OMEGA = 7.292e-5


class ThermalSWEqn:
    def __init__(self, ops: SpaceOps, dt: float, omega: float = EARTH_OMEGA,
                 coriolis=None):
        self.ops = ops
        self.dt = dt
        self.omega = omega
        if coriolis is None:
            coriolis = lambda lon, lat: 2.0 * omega * jnp.sin(lat)
        self.f0 = ops.proj0(coriolis)
        self.M0f = ops.apply_M0(self.f0)
        self.mass_tol = 1e-13 if ops.dtype == jnp.float64 else 1e-6
        self._step = jax.jit(self._step_impl)

    # ------------------------------------------------------------------ diagnostics
    def grad(self, phi2):
        """Weak gradient u = M1^-1 E12 M2 phi (src/ThermalSW_EEC_2.cpp:154-165)."""
        ops = self.ops
        return ops.solve_M1(ops.e12(ops.apply_M2(phi2)), tol=self.mass_tol)

    def diagnose_q(self, u, h):
        ops = self.ops
        rhs = ops.e01(ops.apply_M1(u)) + self.M0f
        return rhs / ops.m0_lumped(ops.interp2_phys(h))

    def curl(self, u):
        ops = self.ops
        return ops.solve_M0(ops.e01(ops.apply_M1(u)))

    def _stage_rhs(self, u, h, S):
        ops, dt = self.ops, self.dt
        s = ops.solve_M2(ops.apply_M2(S), h2=h, tol=self.mass_tol)
        F = ops.solve_M1(ops.apply_M1(u, h), tol=self.mass_tol)
        Phi = (ops.apply_K(u, u) + 0.5 * ops.apply_M2(S)
               + 0.25 * ops.apply_M2h(h, s))
        ds = ops.solve_M1h(ops.e12(ops.apply_M2(s)), h, tol=self.mass_tol)
        G = ops.solve_M1(ops.apply_M1(F, s), tol=self.mass_tol)

        # momentum
        q = self.diagnose_q(u, h)
        fu = ops.e12(Phi) + ops.apply_R(q, F)
        fu = fu + 0.25 * ops.apply_M1(self.grad(h), s)
        h2w = ops.solve_M2(ops.apply_M2h(h, h), tol=self.mass_tol)
        fu = fu - 0.5 * ops.apply_K_T(ds, h2w)

        # depth
        fh = ops.e21(F)

        # buoyancy
        fS = 0.5 * ops.apply_M2(ops.e21(G)) + 0.5 * ops.apply_M2h(ops.e21(F), s)
        ds2 = self.grad(s)
        fS = fS + ops.apply_K(ds2, F)
        return fu, fh, fS

    # ------------------------------------------------------------------ SSP-RK3 step
    def _update(self, u0, h0, S0, uj, hj, Sj, w_old, w_new):
        """u_new = M1^-1[M1(w_old u0 + w_new uj) - w_new dt fu], likewise h/S
        (Shu-Osher combination, src/ThermalSW_EEC_2.cpp:878-970)."""
        ops, dt = self.ops, self.dt
        fu, fh, fS = self._stage_rhs(uj, hj, Sj)
        bu = ops.apply_M1(w_old * u0 + w_new * uj) - w_new * dt * fu
        un = ops.solve_M1(bu, tol=self.mass_tol)
        hn = w_old * h0 + w_new * (hj - dt * fh)
        bS = ops.apply_M2(w_old * S0 + w_new * Sj) - w_new * dt * fS
        Sn = ops.solve_M2(bS)
        return un, hn, Sn

    def _step_impl(self, u, h, S):
        u1, h1, S1 = self._update(u, h, S, u, h, S, 0.0, 1.0)
        u2, h2, S2 = self._update(u, h, S, u1, h1, S1, 0.75, 0.25)
        un, hn, Sn = self._update(u, h, S, u2, h2, S2, 1.0 / 3.0, 2.0 / 3.0)
        d = self.ops.dtype
        return un.astype(d), hn.astype(d), Sn.astype(d)

    def step(self, u, h, S):
        return self._step(u, h, S)

    def run_steps(self, u, h, S, nsteps: int):
        def body(carry, _):
            return self._step_impl(*carry), None
        (u, h, S), _ = jax.lax.scan(body, (u, h, S), None, length=nsteps)
        return u, h, S

    # ------------------------------------------------------------------ conservation
    def conservation(self, u, h, S):
        """mass, vorticity, energy, enstrophy, buoyancy, entropy
        (src/ThermalSW_EEC_2.cpp:799-857)."""
        ops = self.ops
        w = self.curl(u)
        q = self.diagnose_q(u, h)
        enst = ops.dot0(q, ops.apply_M0(q, ops.interp2_phys(h)))
        mass = dg.int2(ops, h)
        buoy = dg.int2(ops, S)
        vort = dg.int0(ops, w)
        # total energy 0.5 int (S h + h |u|^2)  [S is h s, phys values]
        wd = ops.W * ops.det
        up = ops.interp1_phys(u)
        hq = ops.interp2_phys(h)
        Sq = ops.interp2_phys(S)
        ener = jnp.sum(wd * 0.5 * (Sq * hq + hq * (up[..., 0] ** 2 + up[..., 1] ** 2)))
        # entropy 0.5 S^T M2 M2h(h)^-1 M2 S
        smh = ops.solve_M2(ops.apply_M2(S), h2=h, tol=self.mass_tol)
        entr = 0.5 * ops.dot2(ops.apply_M2(smh), S)
        return dict(mass=mass, vort=vort, ener=ener, enst=enst, buoy=buoy,
                    entr=entr)
