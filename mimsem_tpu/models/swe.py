"""Rotating shallow water on the sphere: energy-conserving semi-implicit Picard.

Matrix-free TPU re-design of the reference SWEqn (src/SWEqn_Picard.{h,cpp}):

  * Hamiltonian-derivative residual: mass flux F = M1^-1 sum(1/3,1/6 weights)
    Uh(h_a) u_b (:253-284), Bernoulli Phi = K(u) + (g/2) M2 (hi+hj) (:289-318),
    upwinded potential vorticity q = M0h_up^-1 (M0 f + E01 M1 u) (:320-339),
    momentum residual E12 Phi + R_up(q) F, continuity M2 E21 F (:402-621).
  * The reference assembles the coupled (u,h) block Jacobian
    A = [[M1 + a dt R(f), a dt g E12 M2], [a dt H M2 E21, M2]] once and solves
    with parallel GMRES (:623-791).  Here the 2-form mass block is eliminated
    exactly (M2 is block-diagonal -> batched dense inverse), reducing each
    Picard update to a velocity-space Helmholtz system
        [M1 + a dt R(f) - (a dt)^2 g H E12 M2 E21] du = rhs
    solved by GMRES with a per-element block preconditioner (the TPU analogue
    of PCBJACOBI with one block per element, :87-95).

Constants follow the reference: alpha = ROS_ALPHA = 0.5, H_MEAN = 1e4,
UP_TAU = 0.5 (src/SWEqn_Picard.cpp:27-30).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.forms import SpaceOps
from ..ops import solvers
from ..utils import diagnostics as dg

RAD_EARTH = 6371220.0
EARTH_GRAV = 9.80616
EARTH_OMEGA = 7.292e-5


def _local_e21(p: int) -> np.ndarray:
    """Element-local divergence incidence (n2loc, 2*n1loc), identical for every
    element in the canonical local view (src/Assembly.cpp:1501-1522)."""
    np1 = p + 1
    n1loc = p * np1
    E = np.zeros((p * p, 2 * n1loc))
    for iy in range(p):
        for ix in range(p):
            r = iy * p + ix
            E[r, iy * np1 + ix] = -1.0
            E[r, iy * np1 + ix + 1] = +1.0
            E[r, n1loc + iy * p + ix] = -1.0
            E[r, n1loc + (iy + 1) * p + ix] = +1.0
    return E


class SWEqn:
    def __init__(self, ops: SpaceOps, dt: float,
                 grav: float = EARTH_GRAV, omega: float = EARTH_OMEGA,
                 hmean: float = 1.0e4, alpha: float = 0.5, up_tau: float = 0.5,
                 coriolis=None, nits: int = 2, gmres_tol: float = None,
                 gmres_restart: int = None, gmres_maxiter: int = None,
                 q_exact: bool = False):
        self.ops = ops
        self.dt = dt
        self.grav = grav
        self.omega = omega
        self.hmean = hmean
        self.alpha = alpha
        self.up_tau = up_tau
        self.nits = nits
        # q_exact: midpoint-state PV with the centred rotation operator (the
        # reference's q_exact residual branch, src/SWEqn_Picard.cpp:438-471,
        # used by Williamson 2/5); otherwise the upwinded-PV two-state form
        # (src/SWEqn_Picard.cpp:566-581, used by Galewsky).
        self.q_exact = q_exact
        f64 = ops.dtype == jnp.float64
        if gmres_tol is None:
            gmres_tol = 1e-12 if f64 else 2e-6
        # f32 GMRES on the Helmholtz system stalls at ~3e-3 relative (well
        # below the f32 truncation error of the discretization); short cycles
        # avoid burning masked iterations (measured: 12x2 matches 30x4 accuracy
        # at ~1/4 the cost on TPU v5e)
        if gmres_restart is None:
            gmres_restart = 30 if f64 else 12
        if gmres_maxiter is None:
            gmres_maxiter = 4 if f64 else 2
        self.gmres_tol = gmres_tol
        self.mass_tol = 1e-13 if f64 else 1e-6
        self.gmres_restart = gmres_restart
        self.gmres_maxiter = gmres_maxiter

        if coriolis is None:
            coriolis = lambda lon, lat: 2.0 * omega * jnp.sin(lat)
        self.f0 = ops.proj0(coriolis)

        # ---- per-element Helmholtz preconditioner blocks (host-side numpy) ----
        basis, geom, p = ops.basis, ops.geom, ops.p
        M1blk = ops._m1_blocks_np(geom.G1, basis)
        fq = np.asarray(ops.interp0(self.f0))            # (nel, nq)
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
        Helm = M1blk + a * Rblk + a * a * grav * hmean * GD
        self.HelmInv = jnp.asarray(np.linalg.inv(Helm), ops.dtype)
        if ops.el_sharding is not None:
            self.HelmInv = jax.device_put(self.HelmInv, ops.el_sharding)

        self._step = jax.jit(self._step_impl)

    # ------------------------------------------------------------------ diagnostics
    def diagnose_F(self, ui, hi, uj, hj):
        """F = M1^-1 [1/3 Uh(hi)ui + 1/6 Uh(hi)uj + 1/6 Uh(hj)ui + 1/3 Uh(hj)uj]
        (src/SWEqn_Picard.cpp:253-284)."""
        ops = self.ops
        b = (ops.apply_M1(ui, hi) / 3.0 + ops.apply_M1(uj, hi) / 6.0
             + ops.apply_M1(ui, hj) / 6.0 + ops.apply_M1(uj, hj) / 3.0)
        return ops.solve_M1(b, tol=self.mass_tol)

    def diagnose_Phi(self, ui, hi, uj, hj, bot=None):
        """Phi = 1/3[K(ui)ui + K(ui)uj + K(uj)uj] + (g/2) M2 (hi+hj) [+ g M2 b]
        (src/SWEqn_Picard.cpp:289-318, 430-433)."""
        ops = self.ops
        phi = (ops.apply_K(ui, ui) + ops.apply_K(ui, uj) + ops.apply_K(uj, uj)) / 3.0
        phi = phi + 0.5 * self.grav * ops.apply_M2(hi + hj)
        if bot is not None:
            phi = phi + self.grav * ops.apply_M2(bot)
        return phi

    def diagnose_q(self, u, h, upwind: bool):
        """PV q = M0h(_up)^-1 (M0 f + E01 M1 u) (src/SWEqn_Picard.cpp:320-339).
        Returns (q, P_up) with P_up reused by the rotational operator."""
        ops = self.ops
        rhs = ops.apply_M0(self.f0) + ops.e01(ops.apply_M1(u))
        if upwind:
            P_up = ops.p0_up(u, self.up_tau * self.dt)
            q = ops.solve_M0h_up(rhs, h, P_up, tol=self.mass_tol)
        else:
            P_up = None
            q = rhs / ops.m0_lumped(ops.interp2_phys(h))
        return q, P_up

    def curl(self, u):
        ops = self.ops
        return ops.solve_M0(ops.e01(ops.apply_M1(u)))

    # ------------------------------------------------------------------ residual
    def residual(self, ui, hi, uj, hj, bot=None):
        ops, dt = self.ops, self.dt
        F = self.diagnose_F(ui, hi, uj, hj)
        Phi = self.diagnose_Phi(ui, hi, uj, hj, bot)
        fu = ops.e12(Phi)
        if self.q_exact:
            qm, _ = self.diagnose_q(0.5 * (ui + uj), 0.5 * (hi + hj),
                                    upwind=False)
            fu = fu + ops.apply_R(qm, F)
        else:
            qi, Pi = self.diagnose_q(ui, hi, upwind=True)
            qj, Pj = self.diagnose_q(uj, hj, upwind=True)
            fu = fu + 0.5 * ops.apply_R_up(qi, F, Pi) \
                    + 0.5 * ops.apply_R_up(qj, F, Pj)
        fh = ops.apply_M2(ops.e21(F))
        ru = ops.apply_M1(uj) - ops.apply_M1(ui) + dt * fu
        rh = ops.apply_M2(hj) - ops.apply_M2(hi) + dt * fh
        return ru, rh

    # ------------------------------------------------------------------ linear solve
    def _A_u(self, u):
        """Velocity Schur operator M1 + a dt R(f) - (a dt)^2 g H E12 M2 E21."""
        ops = self.ops
        a = self.alpha * self.dt
        return (ops.apply_M1(u) + a * ops.apply_R(self.f0, u)
                - a * a * self.grav * self.hmean * ops.e12(ops.apply_M2(ops.e21(u))))

    def _pc_u(self, r):
        ops = self.ops
        return ops.scatter1(jnp.einsum('eij,ej->ei', self.HelmInv, ops.gather1(r)))

    def solve_coupled(self, bu, bh):
        """Solve the semi-implicit block system via exact M2 elimination."""
        ops = self.ops
        a = self.alpha * self.dt
        rhs_u = bu - a * self.grav * ops.e12(bh)
        du = solvers.gmres(self._A_u, rhs_u, pc=self._pc_u, tol=self.gmres_tol,
                           maxiter=self.gmres_maxiter, restart=self.gmres_restart,
                           weight=self.ops.wdot1)
        dh = ops.solve_M2(bh) - a * self.hmean * ops.e21(du)
        return du, dh

    # ------------------------------------------------------------------ step
    def _step_impl(self, u, h, bot=None):
        ui, hi = u, h
        uj, hj = u, h
        for _ in range(self.nits):
            ru, rh = self.residual(ui, hi, uj, hj, bot)
            du, dh = self.solve_coupled(-ru, -rh)
            uj = uj + du
            hj = hj + dh
        # pin the working dtype (guards weak-type promotion under x64)
        return uj.astype(self.ops.dtype), hj.astype(self.ops.dtype)

    def step(self, u, h, bot=None):
        return self._step(u, h) if bot is None else self._step(u, h, bot)

    def run_steps(self, u, h, nsteps: int):
        """nsteps time steps in a single on-device lax.scan (one dispatch)."""
        def body(carry, _):
            u, h = carry
            return self._step_impl(u, h), None
        (u, h), _ = jax.lax.scan(body, (u, h), None, length=nsteps)
        return u, h

    # ------------------------------------------------------------------ conservation
    def conservation(self, u, h, bot=None):
        """mass, vorticity, energy, enstrophy (src/SWEqn_Picard.cpp:1325-1359)."""
        ops = self.ops
        w = self.curl(u)
        q, _ = self.diagnose_q(u, h, upwind=False)
        enst = ops.dot0(q, ops.apply_M0(q, ops.interp2_phys(h)))
        mass = dg.int2(ops, h)
        vort = dg.int0(ops, w)
        ener = dg.intE_sw(ops, u, h, self.grav, bot)
        return dict(mass=mass, vort=vort, ener=ener, enst=enst)
