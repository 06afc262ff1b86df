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


class ThermalSWv1:
    """Thermal shallow water, version-1 formulation: state (u, h, s) with the
    buoyancy s itself prognostic (src/ThermalSW.{h,cpp}; superseded in the
    reference build by ThermalSW_EEC_2 but a declared capability,
    src/ThermalSW.h:86-97).

    Two integrators:
      * solve(): semi-implicit Picard -- trapezoidal Hamiltonian residual
        (diagnose_F/Phi/T/ds + rhs_u/rhs_h/rhs_s, src/ThermalSW.cpp:291-560)
        against the SAME linear block operator as the SW Picard solver
        (assemble_operator, src/ThermalSW.cpp:628-690: thermal terms explicit,
        s-row diagonal M2), solved here by the exact-M2-elimination velocity
        Helmholtz system.
      * step_rk2(): SSP-RK2 (Heun) with instantaneous RHS
        (solve_ssp_rk2, src/ThermalSW.cpp:1604-1713).  NOTE: the reference's
        live solve_ssp_rk2 has the thermal terms commented out (s frozen,
        :1624-1627,1637-1640); here they are active.

    Deviation: the reference stabilizes the PV cross product with an SUPG
    variant (RotMat_up::assemble_supg); here the APVM operator (same family,
    tau = 0.5 dt) is used -- both are antisymmetric so energy conservation is
    unaffected; only the enstrophy dissipation profile differs.
    """

    GRAV = 9.80616
    HMEAN = 1.0e4

    def __init__(self, ops: SpaceOps, dt: float, omega: float = EARTH_OMEGA,
                 coriolis=None, alpha: float = 0.5, nits: int = 4,
                 hmean: float = None, gmres_restart: int = 30,
                 gmres_maxiter: int = 4):
        import numpy as np
        from ..ops import solvers as _solvers
        self.ops = ops
        self.dt = dt
        self.alpha = alpha
        self.nits = nits
        self.hmean = self.HMEAN if hmean is None else hmean
        if coriolis is None:
            coriolis = lambda lon, lat: 2.0 * omega * jnp.sin(lat)
        self.f0 = ops.proj0(coriolis)
        self.M0f = ops.apply_M0(self.f0)
        f64 = ops.dtype == jnp.float64
        self.mass_tol = 1e-13 if f64 else 1e-6
        self.gmres_tol = 1e-12 if f64 else 2e-6
        self.gmres_restart = gmres_restart
        self.gmres_maxiter = gmres_maxiter

        # per-element Helmholtz preconditioner (same blocks as models/swe.py)
        from .swe import _local_e21
        basis, geom, p = ops.basis, ops.geom, ops.p
        M1blk = ops._m1_blocks_np(geom.G1, basis)
        fq = np.asarray(ops.interp0(self.f0))
        W = basis.W[None, :]
        Bx, By = basis.B1x, basis.B1y
        n1loc = ops.n1loc
        Rblk = np.zeros_like(M1blk)
        Rblk[:, :n1loc, n1loc:] = np.einsum('qi,eq,qj->eij', Bx, -fq * W, By)
        Rblk[:, n1loc:, :n1loc] = np.einsum('qi,eq,qj->eij', By, +fq * W, Bx)
        E21l = _local_e21(p)
        M2blk = np.einsum('qi,eq,qj->eij', basis.B2, geom.winvdet, basis.B2)
        GD = np.einsum('ki,ekl,lj->eij', E21l, M2blk, E21l)
        a = alpha * dt
        Helm = M1blk + a * Rblk + a * a * self.GRAV * self.hmean * GD
        self.HelmInv = jnp.asarray(np.linalg.inv(Helm), ops.dtype)
        self._step_si = jax.jit(self._solve_impl)
        self._step_rk = jax.jit(self._rk2_impl)

    # ---------------------------------------------------------------- diagnostics
    def diagnose_q(self, u, h):
        ops = self.ops
        rhs = ops.e01(ops.apply_M1(u)) + self.M0f
        return rhs / ops.m0_lumped(ops.interp2_phys(h))

    def curl(self, u):
        ops = self.ops
        return ops.solve_M0(ops.e01(ops.apply_M1(u)))

    def _residual(self, ui, hi, si, uj, hj, sj):
        """Trapezoidal Picard residual (rhs_u/rhs_h/rhs_s,
        src/ThermalSW.cpp:442-560)."""
        ops, dt = self.ops, self.dt
        hqi, hqj = ops.interp2_phys(hi), ops.interp2_phys(hj)

        # F with the 1/3-1/6 two-state rule (diagnose_F, :291-321)
        b = (ops.apply_M1(ui, weight_q=hqi) / 3.0
             + ops.apply_M1(uj, weight_q=hqi) / 6.0
             + ops.apply_M1(ui, weight_q=hqj) / 6.0
             + ops.apply_M1(uj, weight_q=hqj) / 3.0)
        F = ops.solve_M1(b, tol=self.mass_tol)

        # Phi = 1/3 K-rule + two-state M2h(h) s rule (diagnose_Phi, :327-373)
        Phi = (ops.apply_K(ui, ui) + ops.apply_K(ui, uj)
               + ops.apply_K(uj, uj)) / 3.0
        Phi = Phi + (ops.apply_M2(si, weight_q=hqi) / 3.0
                     + ops.apply_M2(sj, weight_q=hqi) / 6.0
                     + ops.apply_M2(si, weight_q=hqj) / 6.0
                     + ops.apply_M2(sj, weight_q=hqj) / 3.0)

        # T ~ (1/2) h^2 in weak form (diagnose_T, :374-398)
        bT = (ops.apply_M2(hi, weight_q=hqi) / 6.0
              + ops.apply_M2(hj, weight_q=hqi) / 6.0
              + ops.apply_M2(hj, weight_q=hqj) / 6.0)
        T = ops.solve_M2(bT)

        # ds = M1h(h-bar)^-1 E12 M2 s-bar (diagnose_ds, :414-440)
        hb = 0.5 * (hi + hj)
        sb = 0.5 * (si + sj)
        ds = ops.solve_M1h(ops.e12(ops.apply_M2(sb)), hb, tol=self.mass_tol)

        # momentum: E12 Phi + PV cross products + thermal K(ds)^T T
        qi = self.diagnose_q(ui, hi)
        qj = self.diagnose_q(uj, hj)
        dqi = ops.e10(qi)
        dqj = ops.e10(qj)
        tau = 0.5 * dt
        fu = ops.e12(Phi) \
            + 0.5 * ops.apply_R_apvm(qi, ui, dqi, tau, F) \
            + 0.5 * ops.apply_R_apvm(qj, uj, dqj, tau, F) \
            - 2.0 * ops.apply_K_T(ds, T)
        ru = ops.apply_M1(uj - ui) + dt * fu
        rh = ops.apply_M2(hj - hi + dt * ops.e21(F))
        rs = ops.apply_M2(sj - si) + 2.0 * dt * ops.apply_K(ds, F)
        return ru, rh, rs

    def _solve_coupled(self, bu, bh, bs):
        """Exact-M2-elimination solve of the (u,h) block + diagonal s-row."""
        from ..ops import solvers
        ops = self.ops
        a = self.alpha * self.dt

        def A_u(u):
            # sum-of-locals: the three operator outputs share ONE DSS
            loc = (ops.apply_M1_local(u) + a * ops.apply_R_local(self.f0, u)
                   - a * a * self.GRAV * self.hmean
                   * ops.e12_local(ops.apply_M2(ops.e21(u))))
            return ops.scatter1(loc)

        def pc_w(r):
            # weighted additive Schwarz (see SWEqn._pc_u_w): enables the
            # dot-free Richardson solve of the constant Helmholtz operator
            w = ops.wdot1
            return w * ops.scatter1(jnp.einsum('eij,ej->ei', self.HelmInv,
                                               ops.gather1(w * r)))

        rhs_u = bu - a * self.GRAV * ops.e12(bh)
        niter = 8 if self.gmres_tol >= 1e-8 else 20
        du = solvers.richardson_checked(
            A_u, rhs_u, pc=pc_w, tol=self.gmres_tol, niter=niter,
            dot=lambda x, y: jnp.vdot(x * ops.wdot1, y))
        dh = ops.solve_M2(bh) - a * self.hmean * ops.e21(du)
        dsol = ops.solve_M2(bs)
        return du, dh, dsol

    def _solve_impl(self, u, h, s):
        uj, hj, sj = u, h, s
        for _ in range(self.nits):
            ru, rh, rs = self._residual(u, h, s, uj, hj, sj)
            du, dh, dsol = self._solve_coupled(-ru, -rh, -rs)
            uj = uj + du
            hj = hj + dh
            sj = sj + dsol
        d = self.ops.dtype
        return uj.astype(d), hj.astype(d), sj.astype(d)

    def solve(self, u, h, s):
        """One semi-implicit Picard step (ThermalSW::solve, :776-870)."""
        return self._step_si(u, h, s)

    # ---------------------------------------------------------------- SSP-RK2
    def _rhs_inst(self, u, h, s):
        """Instantaneous RHS (diagnose_*_inst + rhs_*_inst, :1480-1602)."""
        ops = self.ops
        hq = ops.interp2_phys(h)
        F = ops.solve_M1(ops.apply_M1(u, weight_q=hq), tol=self.mass_tol)
        Phi = ops.apply_K(u, u) + ops.apply_M2(s, weight_q=hq)
        T = ops.solve_M2(ops.apply_M2(h, weight_q=hq))  # ~ h^2 (weak)
        ds = ops.solve_M1h(ops.e12(ops.apply_M2(s)), h, tol=self.mass_tol)
        q = self.diagnose_q(u, h)
        fu = ops.e12(Phi) + ops.apply_R_apvm(q, u, ops.e10(q), 0.5 * self.dt, F) \
            - ops.apply_K_T(ds, T)
        fh = ops.e21(F)
        fs = ops.apply_K(ds, F)
        return fu, fh, fs

    def _rk2_impl(self, u, h, s):
        ops, dt = self.ops, self.dt
        fu1, fh1, fs1 = self._rhs_inst(u, h, s)
        u1 = ops.solve_M1(ops.apply_M1(u) - dt * fu1, tol=self.mass_tol)
        h1 = h - dt * fh1
        s1 = ops.solve_M2(ops.apply_M2(s) - dt * fs1)
        fu2, fh2, fs2 = self._rhs_inst(u1, h1, s1)
        un = ops.solve_M1(ops.apply_M1(u) - 0.5 * dt * (fu1 + fu2),
                          tol=self.mass_tol)
        hn = h - 0.5 * dt * (fh1 + fh2)
        sn = ops.solve_M2(ops.apply_M2(s) - 0.5 * dt * (fs1 + fs2))
        d = ops.dtype
        return un.astype(d), hn.astype(d), sn.astype(d)

    def step_rk2(self, u, h, s):
        return self._step_rk(u, h, s)

    # ---------------------------------------------------------------- conservation
    def conservation(self, u, h, s):
        """mass, vorticity, energy 0.5 int(h u.u + s h^2), buoyancy int(s h)."""
        ops = self.ops
        w = self.curl(u)
        wd = ops.W * ops.det
        up = ops.interp1_phys(u)
        hq = ops.interp2_phys(h)
        sq = ops.interp2_phys(s)
        ener = jnp.sum(wd * 0.5 * (hq * (up[..., 0] ** 2 + up[..., 1] ** 2)
                                   + sq * hq * hq))
        mass = dg.int2(ops, h)
        vort = dg.int0(ops, w)
        buoy = jnp.sum(wd * sq * hq)
        return dict(mass=mass, vort=vort, ener=ener, buoy=buoy)
