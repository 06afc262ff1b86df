"""Rotating shallow water with a 4-stage linearly-implicit Rosenbrock scheme.

Parity with the reference SWEqn_Rosenbrock (src/SWEqn_Rosenbrock.{h,cpp}):
  * Active tableau ROS3PRL2, gamma_0 = 0.43586652150845900
    (src/SWEqn_Rosenbrock.cpp:243-266).
  * Stage i: solve A k_i = f(x_{i-1}) - B sum_{j<i} (gamma_ij/gamma_0) k_j,
    then x_i = x_0 + sum_{j<=i} alpha_ij k_j (:755-772), where
    A = [[M1 + g0 dt R(f), g0 dt g E12 M2], [g0 dt H M2 E21, M2]] and
    B = A - blockdiag(M1, M2) (:592-728).
  * The nonlinear rhs is the single-state Hamiltonian form with
    APVM-stabilized PV flux (:513-583): f = -dt [E12 Phi + R_apvm(q) F;
    M2 E21 F].

Reuses the SWEqn velocity-Schur solve (exact M2 elimination + block-PC GMRES)
with alpha = gamma_0.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .swe import SWEqn
from ..ops import solvers

GAMMA_0 = 4.3586652150845900e-01
# ROS3PRL2 (src/SWEqn_Rosenbrock.cpp:243-266)
ALPHA = np.zeros((4, 4))
GAMMA = np.zeros((4, 4))
ALPHA[0, 0] = 1.3075995645253771e+00
ALPHA[1, 0] = 0.5
ALPHA[1, 1] = 0.5
ALPHA[2, 0] = 0.5
ALPHA[2, 1] = 0.5
ALPHA[2, 2] = 0.0
ALPHA[3, 0] = 3.4449143192447917e-01
ALPHA[3, 1] = -4.5388516575112231e-01
ALPHA[3, 2] = 6.7352721231818413e-01
ALPHA[3, 3] = GAMMA_0
GAMMA[1, 0] = -1.3075995645253771e+00
GAMMA[2, 0] = -7.0988575860972170e-01
GAMMA[2, 1] = -5.5996735960277766e-01
GAMMA[3, 0] = -1.5550856807552085e-01
GAMMA[3, 1] = -9.5388516575112225e-01
GAMMA[3, 2] = 6.7352721231818413e-01


class SWEqnRosenbrock(SWEqn):
    def __init__(self, ops, dt, cn: bool = False, cn_its: int = 4, **kw):
        """cn=True switches to the Crank-Nicolson fixed-point alternative
        (SWEqn::solve_cn, src/SWEqn_Rosenbrock.cpp:814-880): gamma_0 = 0.5
        operator, iterate A dx = 1/2 f(x0) + 1/2 f(x) + M(x0 - x)."""
        self.cn = cn
        self.cn_its = cn_its
        kw.setdefault('alpha', 0.5 if cn else GAMMA_0)
        super().__init__(ops, dt, **kw)

    def rhs_single(self, u, hp):
        """f = -dt [E12 Phi + R_apvm(q) F; M2 E21 F] at a single state
        (src/SWEqn_Rosenbrock.cpp:513-583).  hp = depth perturbation; the
        balanced pressure gradient rides the f64-precomputed fu_base."""
        ops, dt = self.ops, self.dt
        hq = self._hq(hp)
        F = ops.solve_M1(ops.apply_M1(u, weight_q=hq), tol=self.mass_tol)
        Phi = ops.apply_K(u, u) + self.grav * ops.apply_M2(hp)
        q, _ = self.diagnose_q(u, hq, upwind=False)
        dq = ops.e10(q)
        fu = (ops.e12(Phi) + self.fu_base
              + ops.apply_R_apvm(q, u, dq, self.up_tau * dt, F))
        fh = ops.apply_M2(ops.e21(F))
        return -dt * fu, -dt * fh

    def apply_B(self, du, dh):
        """B = A - blockdiag(M1, M2): the stiff off-mass part."""
        ops = self.ops
        g = GAMMA_0 * self.dt
        bu = g * ops.apply_R(self.f0, du) + g * self.grav * ops.e12(ops.apply_M2(dh))
        bh = g * self.hmean * ops.apply_M2(ops.e21(du))
        return bu, bh

    def increments_cn(self, u, hp):
        """Crank-Nicolson fixed-point increments (solve_cn,
        src/SWEqn_Rosenbrock.cpp:814-880).  The reference's stage residual
        f = 1/2 f(x0) + 1/2 f(x) + [M1(u0-uj); M2(h0-hj)] is the CN residual
        in increment form: M dx_total = (dt/2)(rhs(x0) + rhs(xj))."""
        ops = self.ops
        fn_u, fn_h = self.rhs_single(u, hp)     # f(x0) = -dt * rhs(x0)
        duj = jnp.zeros_like(u)
        dhj = jnp.zeros_like(hp)
        for _ in range(self.cn_its):
            fu, fh = self.rhs_single(u + duj, hp + dhj)
            ru = 0.5 * fn_u + 0.5 * fu - ops.apply_M1(duj)
            rh = 0.5 * fn_h + 0.5 * fh - ops.apply_M2(dhj)
            du, dh = self.solve_coupled(ru, rh)
            duj = duj + du
            dhj = dhj + dh
        return duj.astype(ops.dtype), dhj.astype(ops.dtype)

    def increments(self, u, hp):
        if self.cn:
            return self.increments_cn(u, hp)
        ku = [None] * 4
        kh = [None] * 4
        uj, hj = u, hp
        for i in range(4):
            fu, fh = self.rhs_single(uj, hj)
            for j in range(i):
                c = GAMMA[i, j] / GAMMA_0
                bu, bh = self.apply_B(ku[j], kh[j])
                fu = fu - c * bu
                fh = fh - c * bh
            ku[i], kh[i] = self.solve_coupled(fu, fh)
            du = sum(ALPHA[i, j] * ku[j] for j in range(i + 1))
            dh = sum(ALPHA[i, j] * kh[j] for j in range(i + 1))
            uj, hj = u + du, hp + dh
        return (du.astype(self.ops.dtype), dh.astype(self.ops.dtype))
