"""Host-side float64 numpy mirror of the mimetic operators (global DOF form).

Two jobs, both off the TPU hot path:

  * setup-time precomputation of precision-critical constants for the f32
    production path -- the balanced reference-state forcing
    fu_base = E12 (g M2 (h_base + b)) must be formed in f64 or its f32
    rounding noise (eps * g * H ~ 1e-2 m/s^2) swamps the perturbation
    pressure gradient;
  * float64 conservation diagnostics of f32 TPU states (mass, vorticity,
    energy, enstrophy -- src/SWEqn_Picard.cpp:1325-1359), so measured drift
    reflects the evolved state, not integral round-off.

Operators act on canonical global DOF vectors; `to_global*` convert from the
LocalOps redundant element-local representation (copies agree by the DSS
invariant, so any copy is the value).
"""
from __future__ import annotations

import numpy as np


class HostOps:
    def __init__(self, ops):
        topo, basis, geom = ops.topo, ops.basis, ops.geom
        self.topo, self.basis, self.geom = topo, basis, geom
        self.p = topo.p
        self.nel = topo.nel
        self.n0, self.n1, self.n2 = topo.n0, topo.n1, topo.n2
        self.n1loc = topo.n1loc
        # ops stores vectors in local (redundant) form iff it is a LocalOps
        self.is_local = hasattr(ops, "ln0")

        self.W = basis.W.astype(np.float64)
        self.B0 = basis.B0.astype(np.float64)
        self.B1x = basis.B1x.astype(np.float64)
        self.B1y = basis.B1y.astype(np.float64)
        self.B2 = basis.B2.astype(np.float64)
        self.J = geom.J.astype(np.float64)
        self.det = geom.det.astype(np.float64)
        self.wdet = geom.wdet.astype(np.float64)
        self.winvdet = geom.winvdet.astype(np.float64)
        self.lonlat = geom.lonlat.astype(np.float64)
        self.M2blk = np.einsum('qi,eq,qj->eij', self.B2, self.winvdet, self.B2)

    # ------------------------------------------------------------- representation
    def to_global0(self, v):
        v = np.asarray(v, np.float64)
        if not self.is_local:
            return v
        g = np.zeros(self.n0)
        g[self.topo.e2d0] = v.reshape(self.nel, -1)
        return g

    def to_global1(self, v):
        v = np.asarray(v, np.float64)
        if not self.is_local:
            return v
        g = np.zeros(self.n1)
        g[self.topo.e2d1] = self.topo.sgn1 * v.reshape(self.nel, -1)
        return g

    def to_local1(self, g):
        """Canonical global 1-form -> the ops' storage representation."""
        if not self.is_local:
            return g
        return (self.topo.sgn1 * g[self.topo.e2d1]).ravel()

    # 2-forms are discontinuous: local flat IS the global vector
    def gather0(self, g0):
        return g0[self.topo.e2d0]

    def gather1(self, g1):
        return self.topo.sgn1 * g1[self.topo.e2d1]

    def gather2(self, g2):
        return np.asarray(g2, np.float64).reshape(self.nel, -1)

    # ------------------------------------------------------------- interpolation
    def interp0(self, g0):
        return self.gather0(g0) @ self.B0.T

    def interp1_phys(self, g1):
        vl = self.gather1(g1)
        qx = vl[:, :self.n1loc] @ self.B1x.T
        qy = vl[:, self.n1loc:] @ self.B1y.T
        ux = (self.J[..., 0, 0] * qx + self.J[..., 0, 1] * qy) / self.det
        uy = (self.J[..., 1, 0] * qx + self.J[..., 1, 1] * qy) / self.det
        return np.stack([ux, uy], axis=-1)

    def interp2_ref(self, g2):
        return self.gather2(g2) @ self.B2.T

    def interp2_phys(self, g2):
        return self.interp2_ref(g2) / self.det

    # ------------------------------------------------------------- operators
    def apply_M1(self, g1):
        vl = self.gather1(g1)
        qx = vl[:, :self.n1loc] @ self.B1x.T
        qy = vl[:, self.n1loc:] @ self.B1y.T
        G = self.geom.G1.astype(np.float64)
        rx = G[..., 0, 0] * qx + G[..., 0, 1] * qy
        ry = G[..., 1, 0] * qx + G[..., 1, 1] * qy
        out = np.zeros(self.n1)
        loc = self.topo.sgn1 * np.concatenate([rx @ self.B1x, ry @ self.B1y], axis=1)
        np.add.at(out, self.topo.e2d1, loc)
        return out

    def apply_M2(self, g2):
        return np.einsum('eij,ej->ei', self.M2blk, self.gather2(g2)).ravel()

    def solve_M2(self, b2):
        return np.linalg.solve(self.M2blk, self.gather2(b2)[..., None]).ravel()

    def e01(self, g1):
        out = np.zeros(self.n0)
        np.add.at(out, self.topo.e10_plus, -g1)
        np.add.at(out, self.topo.e10_minus, +g1)
        return out

    def e12(self, g2):
        """-E21^T (weak-gradient building block, src/Assembly.cpp:1527-1532)."""
        out = np.zeros(self.n1)
        np.add.at(out, self.topo.e21_idx,
                  -self.topo.e21_sgn * np.asarray(g2, np.float64)[:, None])
        return out

    def m0_lumped(self, weight_q=None):
        q = self.wdet if weight_q is None else self.wdet * weight_q
        loc = np.broadcast_to(q, (self.nel, q.shape[-1])) @ (self.B0 * self.B0)
        out = np.zeros(self.n0)
        np.add.at(out, self.topo.e2d0, loc)
        return out

    def apply_M0(self, g0, weight_q=None):
        q = self.interp0(g0) * self.wdet
        if weight_q is not None:
            q = q * weight_q
        out = np.zeros(self.n0)
        np.add.at(out, self.topo.e2d0, q @ self.B0)
        return out

    def proj2(self, f):
        """f64 2-form projection of f(lon, lat) (or a scalar constant)."""
        fq = (np.full_like(self.det, float(f)) if np.isscalar(f)
              else np.asarray(f(self.lonlat[..., 0], self.lonlat[..., 1]), np.float64))
        rhs = (fq * self.W) @ self.B2
        return np.linalg.solve(self.M2blk, rhs[..., None]).ravel()

    # ------------------------------------------------------------- SW diagnostics
    def curl(self, g1):
        """Relative vorticity w = M0^{-1} E01 M1 u (lumped-exact for colocated
        quadrature, matching SpaceOps.solve_M0)."""
        return self.e01(self.apply_M1(g1)) / self.m0_lumped()

    def sw_conservation(self, u, hp, h_base, f0, grav, bot=None):
        """mass, vorticity, energy, enstrophy integrals in f64
        (src/SWEqn_Picard.cpp:1325-1359).  u, hp in the ops' representation;
        h_base the f64 global reference depth; f0 the global Coriolis 0-form."""
        g1 = self.to_global1(u)
        g0f = self.to_global0(f0)
        h = np.asarray(hp, np.float64) + h_base
        hq = self.interp2_phys(h)
        up = self.interp1_phys(g1)
        bq = 0.0 if bot is None else self.interp2_phys(np.asarray(bot, np.float64))
        w = self.curl(g1)
        q = (self.apply_M0(g0f) + self.e01(self.apply_M1(g1))) / self.m0_lumped(hq)
        mass = np.sum(self.W * self.interp2_ref(h))
        vort = np.sum(self.wdet * self.interp0(w))
        ener = np.sum(self.wdet * 0.5 * (grav * (hq + bq) ** 2
                                         + hq * (up[..., 0] ** 2 + up[..., 1] ** 2)))
        enst = float(q @ self.apply_M0(q, hq))
        return dict(mass=float(mass), vort=float(vort), ener=float(ener),
                    enst=enst)
