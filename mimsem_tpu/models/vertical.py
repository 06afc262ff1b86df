"""Batched vertical (column) operators for the 3D compressible Euler models.

TPU re-design of the reference VertOps/VertSolve (box/VertOps.cpp,
eul/VertOps.cpp, box/VertSolve.cpp, eul/VertSolve.cpp).  The reference loops
over columns assembling ~30 per-column PETSc matrices; here every vertical
operator reduces to ONE primitive -- the per-layer horizontal 2-form block
  Wblk(chi) = B2^T diag(w_quad * chi) B2           (9x9 at p=3)
with layer/interface-dependent scalar weights chi -- applied batched over
(levels, elements) as large einsums, plus the +-1 vertical incidence V10/V01
(eul/VertOps.cpp:134-182).

Key structural facts exploited (derived from box/VertOps.cpp):
  * the vertical linear (W2) mass VA is LUMPED: interface-block-diagonal
    (AssembleLinear adds the layer block to both adjacent interfaces,
    box/VertOps.cpp:~"AssembleLinear"), so VA^-1 is a batched 9x9 inverse;
  * the vertical constant (W3) mass VB is layer-block-diagonal;
  * all field-weighted variants (WithTheta/WithRT/WithRho/ConLinWithW/...)
    only change the scalar weights.

State layout: layer fields [nk, nel, n2loc]; interface fields [nk-1 or nk+1,
nel, n2loc].  The reference's SCALE=1e8 conditioning factor is unnecessary
here (solves use relative tolerances) and is omitted.

Physical constants follow box/Euler_2.cpp:25-30.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

RD = 287.0
CP = 1004.5
CV = 717.5
P0 = 100000.0
GRAVITY = 9.80616


def inv_small(A):
    """Batched inverse of small (..., n, n) blocks by Gauss-Jordan with static
    unrolled loops -- the TPU backend has no runtime f64 LU.  No pivoting:
    blocks are mass-like (diagonally dominant SPD perturbations)."""
    n = A.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = jnp.concatenate([A, I], axis=-1)  # (..., n, 2n)
    for k in range(n):
        piv = M[..., k, k:k + 1]
        row = M[..., k, :] / piv
        M = M.at[..., k, :].set(row)
        col = M[..., :, k:k + 1]
        upd = M - col * row[..., None, :]
        # restore row k (was zeroed by its own elimination)
        M = upd.at[..., k, :].set(row)
    return M[..., :, n:]


def terrain_following_levels(zlevs, topog_q):
    """Terrain-following interface heights: each flat level z_k is mapped to
        levs[k] = (ztop - topog) * z_k / ztop + topog
    per quadrature point (linear basis-function decay of the surface height,
    the reference's Geom::initTopog, eul/Geom.cpp:743-761).  The terrain
    enters the model ONLY through these per-quad-point heights -- every
    vertical metric (thickq, det scaling, chi weights) is already built from
    them, so all operators and solvers work unchanged over orography.

    zlevs   : (nk+1,) flat interface heights, zlevs[0] = 0, zlevs[-1] = ztop
              (uniform or stretched).
    topog_q : (nel, nq) surface height at the horizontal quadrature points.
    Returns (nk+1, nel, nq) float64.
    """
    zlevs = np.asarray(zlevs, np.float64)
    ztop = zlevs[-1]
    t = np.asarray(topog_q, np.float64)
    return (1.0 - t[None, :, :] / ztop) * zlevs[:, None, None] + t[None, :, :]


class VerticalOps:
    """Vertical operator algebra over [lev, nel, n2loc] arrays.

    ops  : the horizontal LocalOps/SpaceOps (supplies B2, W, det).
    levs : (nk+1, nel, nq) interface heights at quad points.
    """

    def __init__(self, ops, levs, dtype=None):
        self.ops = ops
        self.dtype = dtype or ops.dtype
        c = lambda a: jnp.asarray(a, self.dtype)
        self.B2 = c(ops.B2)           # (nq, n2loc)
        self.Wq = c(ops.W)            # (nq,)
        self.det = c(ops.det)         # (nel, nq)
        self.nel = ops.nel
        self.n2loc = self.B2.shape[1]
        levs = np.asarray(levs)
        if getattr(ops, 'el_perm', None) is not None:
            # match the tile-major device element order (ops/forms.py el_perm)
            levs = levs[:, ops.el_perm]
        self.levs = jnp.asarray(levs, self.dtype)          # (nk+1, nel, nq)
        self.nk = self.levs.shape[0] - 1
        self.thickq = self.levs[1:] - self.levs[:-1]       # (nk, nel, nq)
        # state-independent mass blocks, cached EAGERLY (computed at build
        # time so jitted steps embed them as constants instead of re-deriving
        # wblk + Gauss-Jordan inverses every call -- the vertical Newton loop
        # touches these every iteration)
        self.VB_blk = self.wblk(self.chi_VB())             # (nk, nel, n2, n2)
        self.VBinv_blk = inv_small(self.VB_blk)
        self.VAinv_blk = inv_small(self.wblk(self.chi_VA()))  # (nk-1, ...)

    # ------------------------------------------------------------- primitives
    def interp(self, coef):
        """[.., nel, n2loc] coefficients -> reference values at quads [.., nel, nq]."""
        return coef @ self.B2.T

    def proj(self, vals):
        """Quadrature values -> weak projection onto 2-form coefficients."""
        return (vals * self.Wq) @ self.B2

    def wblk(self, chi):
        """Explicit blocks B2^T diag(w chi) B2: chi (.., nel, nq) -> (.., nel, n2, n2)."""
        return jnp.einsum('qi,...q,qj->...ij', self.B2, chi * self.Wq, self.B2)

    def apply_w(self, chi, v):
        """Matrix-free Wblk(chi) v."""
        return self.proj(self.interp(v) * chi)

    # physical values of layer 2-forms: coef/(det*thick)
    def phys_layer(self, coef):
        return self.interp(coef) / (self.det * self.thickq)

    # physical values of interface (linear-vertical) fields: coef/det
    def phys_int(self, coef):
        return self.interp(coef) / self.det

    # ------------------------------------------------------------- incidence
    def v10(self, w):
        """Vertical divergence: interior interfaces (nk-1) -> layers (nk),
        homogeneous BCs (eul/VertOps.cpp:134-182)."""
        z = jnp.zeros_like(w[:1])
        wp = jnp.concatenate([z, w, z], axis=0)   # (nk+1, ...)
        return wp[1:] - wp[:-1]

    def v01(self, y):
        """-V10^T: layers -> interior interfaces: y[k+1] - y[k]."""
        return y[1:] - y[:-1]

    # ------------------------------------------------------------- weights
    def chi_VB(self):
        return 1.0 / (self.det * self.thickq)                     # (nk, nel, nq)

    def chi_VB_rho(self, rho):
        return self.phys_layer(rho) / (self.det * self.thickq)

    def chi_VB_theta(self, theta):
        """Const mass weighted with interface field averaged into the layer."""
        th = 0.5 * (self.phys_int(theta[:-1]) + self.phys_int(theta[1:]))
        return th / (self.det * self.thickq)

    def chi_VA(self):
        """Lumped linear mass weights on interior interfaces (nk-1)."""
        t = 0.5 * self.thickq / self.det                          # (nk, nel, nq)
        return t[:-1] + t[1:]

    def chi_VA_theta(self, theta_int):
        """theta_int: (nk-1, nel, n2loc) interior-interface field."""
        return self.chi_VA() * self.phys_int(theta_int)

    def chi_VA_rho(self, rho):
        """rho-averaged linear mass (AssembleLinearWithRT do_internal)."""
        t = 0.5 * self.thickq * self.phys_layer(rho) / self.det
        return t[:-1] + t[1:]

    # ------------------------------------------------------------- operators
    def VA_inv_blocks(self, chi=None):
        if chi is None:
            return self.VAinv_blk
        return inv_small(self.wblk(chi))

    def VB_inv_blocks(self, chi=None):
        if chi is None:
            return self.VBinv_blk
        return inv_small(self.wblk(chi))

    def lincon(self, x_layers):
        """AB: layers -> interior interfaces with 1/2 weights
        (AssembleLinCon, box/VertOps.cpp:319-364)."""
        half = 0.5 / self.det
        y = self.apply_w(half, x_layers)        # per-layer blocks
        return y[:-1] + y[1:]

    def lincon2(self, x_layers):
        """AB2: layers -> all nk+1 interfaces (AssembleLinCon2)."""
        half = 0.5 / self.det
        y = self.apply_w(half, x_layers)        # (nk, nel, n2)
        z = jnp.zeros_like(y[:1])
        return jnp.concatenate([y, z], 0) + jnp.concatenate([z, y], 0)

    def vba_w(self, wvec, x_int):
        """ConLinWithW: VBA(w): interior interfaces -> layers, weight (1/2) w_phys
        (box/VertOps.cpp:654-728).  Applied to interface field x."""
        wq = self.phys_int(wvec)                 # (nk-1, nel, nq)
        hx = self.interp(x_int)                  # values of x at quads
        z = jnp.zeros_like(wq[:1])
        contrib = 0.5 * wq * hx / self.det       # per interior interface
        cp = jnp.concatenate([z, contrib, z], axis=0)  # (nk+1,...)
        return self.proj(cp[:-1] + cp[1:])

    def vab_w(self, wvec, x_layers):
        """VAB = VBA(w)^T: layers -> interior interfaces."""
        wq = self.phys_int(wvec)
        hx = self.interp(x_layers) / self.det    # (nk, nel, nq)
        s = hx[:-1] + hx[1:]                     # sum of adjacent layers
        return self.proj(0.5 * wq * s)

    # ------------------------------------------------------------- diagnostics
    def diag_theta(self, rho, rt, w=None, tau=0.0):
        """theta on all nk+1 interfaces: VA2(rho)^-1 AB2 rt
        (VertSolve::diagTheta2, box/VertSolve.cpp:499-533).

        With w/tau the vertical linear (hat) test functions are evaluated at
        the shifted point z + tau*w (AssembleLinCon_up /
        AssembleLinearWithRho_up, box/VertOps.cpp:2601-2672, the reference's
        active path with tau = 0.25*dt): with phi_0 = (1-z)/2, phi_1 =
        (1+z)/2 the per-layer 1/2 weights become
            bottom interface: 1/2 - shift,   top: 1/2 + shift,
        shift = tau*w_layer/thick -- for w > 0 an interface draws MORE from
        the layer BELOW it (its upwind side).  Round-3 note: the sign was
        originally inverted (downwinding, anti-diffusive); found while
        bisecting the day-2.8 UMJS14 blowup and fixed against the
        reference's phi_0/phi_1 evaluation.  The direction is asserted by
        tests/test_euler3d.py::test_diag_theta_upwind_direction.
        """
        if w is None:
            sb = st = 0.5
        else:
            wq = self.phys_int(w)                      # (nk-1, nel, nq)
            z1 = jnp.zeros_like(wq[:1])
            wl = 0.5 * (jnp.concatenate([z1, wq], 0)
                        + jnp.concatenate([wq, z1], 0))  # layer-avg w (nk,...)
            shift = jnp.clip(tau * wl / self.thickq, -0.5, 0.5)
            sb = 0.5 - shift
            st = 0.5 + shift
        # rhs: layer k feeds bottom interface with weight sb, top with st
        yb = self.apply_w(sb / self.det, rt)
        yt = self.apply_w(st / self.det, rt)
        z = jnp.zeros_like(yb[:1])
        rhs = jnp.concatenate([yb, z], 0) + jnp.concatenate([z, yt], 0)
        tb = sb * self.thickq * self.phys_layer(rho) / self.det
        tt = st * self.thickq * self.phys_layer(rho) / self.det
        zc = jnp.zeros_like(tb[:1])
        chi = jnp.concatenate([tb, zc], 0) + jnp.concatenate([zc, tt], 0)
        blocks = inv_small(self.wblk(chi))
        return jnp.einsum('lnij,lnj->lni', blocks, rhs)

    def diagnose_Fz(self, w1, w2, rho1, rho2, VAinv):
        """Vertical mass flux F_z = VA^-1 VA(rho-avg) w with the 1/3-1/6 rule
        (VertSolve::diagnose_F_z, box/VertSolve.cpp:447-471)."""
        def m(rho, w):
            return self.apply_w(self.chi_VA_rho(rho), w)
        b = (m(rho1, w1) / 3.0 + m(rho1, w2) / 6.0
             + m(rho2, w1) / 6.0 + m(rho2, w2) / 3.0)
        return jnp.einsum('lnij,lnj->lni', VAinv, b)

    def diagnose_Phiz(self, w1, w2, zv):
        """Phi_z = vertical KE (1/6 rule) + g z projection (layers)
        (VertSolve::diagnose_Phi_z, box/VertSolve.cpp:472-497)."""
        phi = (self.vba_w(w1, w1) / 6.0 + self.vba_w(w1, w2) / 6.0
               + self.vba_w(w2, w2) / 6.0)
        return phi + zv

    def zv_gz(self):
        """Projection of g z onto layers: per layer B2^T w (gz_k + gz_{k+1})/2
        (VertSolve::initGZ, box/VertSolve.cpp:95-184; det-free)."""
        gz = GRAVITY * self.levs
        return self.proj(0.5 * (gz[:-1] + gz[1:]))

    def diag_theta_l2(self, rho, rt):
        """theta in the LAYER (W3) space: VB(rho)^-1 VB rt
        (VertSolve::diagTheta_L2, eul/VertSolve.cpp:322-354)."""
        rhs = self.apply_w(self.chi_VB(), rt)
        blocks = inv_small(self.wblk(self.chi_VB_rho(rho)))
        return jnp.einsum('lnij,lnj->lni', blocks, rhs)

    # ------------------------------------------------------------- entropy (eta) variable
    def log_theta_plus_eta(self, theta_l2, deta=None):
        """eta = VB^-1 proj[ log(theta_phys) (+ deta_phys) ]
        (AssembleConstWithLogThetaPlusEta, eul/VertOps.cpp:1204-1255)."""
        val = jnp.log(jnp.maximum(self.phys_layer(theta_l2), 1e-12))
        if deta is not None:
            val = val + self.phys_layer(deta)
        return self._project_layer(val)

    def rho_exp_eta(self, rho, eta):
        """Theta = VB^-1 proj[ rho_phys exp(eta_phys) ]: the back-substitution
        of the log-entropy variable (AssembleConstWithRhoExpEta,
        eul/VertOps.cpp:1257-1305; used at eul/VertSolve.cpp:1864-1873).

        eta (= log theta) is clamped to +-30 before the exp: physical values
        are ~5.5-6.5, so the clamp is inactive on any healthy state, but a
        transiently bad Newton increment can no longer overflow exp in f32
        and cascade a recoverable iterate into NaN (the log side is floored
        the same way in log_theta_plus_eta/eos_residual)."""
        val = self.phys_layer(rho) * jnp.exp(
            jnp.clip(self.phys_layer(eta), -30.0, 30.0))
        return self._project_layer(val)

    def eos_block(self, x):
        """Consistent EOS linearization block VB VB(x)^-1 VB ~ VB(1/x)
        (Assemble_EOS_Block, eul/VertOps.cpp:1144-1202)."""
        VBxinv = inv_small(self.wblk(self.chi_VB_rho(x)))
        return jnp.einsum('lnij,lnjk,lnkm->lnim', self.VB_blk, VBxinv,
                          self.VB_blk)

    def grad_z(self, x_layers, VAinv):
        """Vertical weak gradient VA^-1 V01 VB x on interior interfaces
        (the GRAD operator of eul/VertSolve.cpp:694-698)."""
        return jnp.einsum('lnij,lnj->lni', VAinv,
                          self.v01(self.apply_w(self.chi_VB(), x_layers)))

    # ------------------------------------------------------------- EOS
    def eos_residual(self, rt, pi):
        """F_pi = proj[ log(Pi_phys) - (Rd/cv) log(Theta_phys)
                        - log cp - (Rd/cv) log(Rd/p0) ]
        (Assemble_EOS_Residual, box/VertOps.cpp:1517-1578; det-free weights)."""
        piq = jnp.maximum(self.phys_layer(pi), 1e-12)
        rtq = jnp.maximum(self.phys_layer(rt), 1e-12)
        val = (jnp.log(piq) - (RD / CV) * jnp.log(rtq)
               - np.log(CP) - (RD / CV) * np.log(RD / P0))
        return self.proj(val)

    def eos_exner(self, rt):
        """Exact EOS: Pi = cp (Rd Theta / p0)^(Rd/cv) as layer 2-form
        coefficients (pointwise at quads, then weak projection)."""
        rtq = jnp.maximum(self.phys_layer(rt), 1e-12)
        piq = CP * (RD * rtq / P0) ** (RD / CV)
        return self._project_layer(piq)

    def _project_layer(self, vals_phys):
        """Weak projection of physical layer values onto 2-form coefficients:
        VB x = <test, vals> with the thickness-scaled layer mass VB, so that
        phys_layer(x) ~= vals (exact block inverse, no iteration)."""
        rhs = self.proj(vals_phys)
        blocks = self.VB_inv_blocks()
        return jnp.einsum('lnij,lnj->lni', blocks, rhs)

    def n_pi_blocks(self, pi):
        """EOS linearization wrt Pi: B2^T diag(w / (Pi_phys det thick)) B2."""
        piq = jnp.maximum(self.phys_layer(pi), 1e-12)
        return self.wblk(1.0 / (piq * self.det * self.thickq))

    def n_rt_blocks(self, rt):
        """N_rt = -(Rd/cv) VB VB(rt)^-1 VB (box/VertSolve.cpp:962-970)."""
        VBrti = inv_small(self.wblk(self.chi_VB_rho(rt)))
        return -(RD / CV) * jnp.einsum('lnij,lnjk,lnkm->lnim', self.VB_blk,
                                       VBrti, self.VB_blk)
