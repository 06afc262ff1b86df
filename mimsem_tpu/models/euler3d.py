"""3D compressible Euler: horizontally-explicit / vertically-implicit (HEVI).

TPU re-design of the reference Euler stack (box/Euler_2.cpp, eul/Euler_2.cpp,
box/VertSolve.cpp, eul/VertSolve.cpp, box/HorizSolve.cpp):

  * State: per-layer horizontal velocity u [nk, ln1] (local-form 1-forms),
    vertical velocity w on interior interfaces [nk-1, nel, n2loc], density rho,
    density-weighted potential temperature Theta = rho*theta, and Exner
    pressure Pi as layer 2-forms [nk, nel, n2loc].  The reference's L2Vecs
    horizontal<->vertical repacking (eul/L2Vecs.cpp) is just the [lev, nel, .]
    axis order here -- free.
  * Strang HEVI step (box/Euler_2.cpp:1306-1477): explicit horizontal momentum
    predictor (2 dt leapfrog after the first step), implicit vertical
    Newton-Schur solve, explicit horizontal corrector.
  * Vertical implicit solve (box/VertSolve.cpp:1264-1458 solve_schur_2 +
    solve_schur_column_3 :879-1058): Newton iterations; each builds exact
    residuals for (w, rho, Theta, Pi) and eliminates to a block-TRIDIAGONAL
    Helmholtz system in d(Theta) solved by batched block-Thomas over layers.
    Deviation from the reference: the Q_rt_rho cross-Jacobian is lagged
    (quasi-Newton) which keeps the system tridiagonal instead of pentadiagonal;
    residuals are exact so the converged states coincide.
  * Horizontal RHS (box/HorizSolve.cpp:214-540): mass/temperature fluxes with
    the 1/3-1/6 two-state rule, Bernoulli function with vertical-KE
    contribution, theta-weighted Exner gradient, vertical-shear vorticity
    cross terms, optional Coriolis (sphere) and biharmonic viscosity.

Weak-form convention: every layer "2-form weak vector" is proj(physical
value) with quadrature weights only; layer mass VB = Wblk(1/(det thick))
coincides with the vertical constant mass, making the horizontal and vertical
sub-systems automatically compatible.

FLUX-FORM horizontal velocity (the reference's thickInv design,
eul/Assembly.cpp:109,229-232): a layer 1-form coefficient u represents the
layer-integrated flux -- its PHYSICAL point value is interp1_phys(u)/thick.
Every volume pairing then carries thick * (1/thick)^s where s counts the
velocity slots (test + velocity-valued data), e.g. the layer mass is
M1k(1/thick) and the Bernoulli/divergence pairings lose their thickness
weight entirely.  The payoff is exact integration by parts over SLOPED
layers: div(iF) = div(thick rho u) pointwise, so the weak gradient of a
scalar carries no spurious int p v.grad(thick) metric term, and terrain
(Geom::initTopog, eul/Geom.cpp:743-761) enters through the per-quad-point
levels alone.  Over terrain the Bernoulli function must also carry the
layer-mean geopotential g zbar(x,y) -- the Hamiltonian delta-H/delta-F term
the reference omits because every upstream driver passes f_topog = 0
(eul/HeldSuarez.cpp:234-236); for horizontally-flat levels it contributes
exactly zero (E12 proj(const) = 0 on the assembled closed mesh).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import solvers
from .vertical import VerticalOps, inv_small, RD, CP, CV, P0, GRAVITY


def _dot_hp(a, b):
    """Full-reduction dot in f64 when x64 is enabled (exchange powers and
    energetics suffer strong cancellation: the f32 noise floor of these dots,
    ~sqrt(N) eps |a||b|, exceeds the physical signal at production sizes --
    the budget-closure oracle needs the extra bits, eul/Euler_2.cpp:694-717)."""
    if jax.config.jax_enable_x64:
        return jnp.vdot(a.astype(jnp.float64), b.astype(jnp.float64))
    return jnp.vdot(a, b)


class Euler3D:
    def __init__(self, ops, vo: VerticalOps, dt: float, coriolis=None,
                 do_visc: bool = False, rayleigh: float = 0.0,
                 newton_iters: int = 4, hs_forcing: bool = False,
                 f64_resid: bool = None, theta_upwind: bool = True,
                 vert_newton: str = "chord", do_temp_visc: bool = False,
                 corr_centering: str = "j", rayleigh_levels: int = 3,
                 newton_max_iters: int = None, newton_tol: float = 1e-3):
        self.ops = ops
        self.vo = vo
        # 'chord' (default) assembles the vertical-solve linearization once
        # per step at the initial state (~1.7x faster EC step); 'full'
        # reassembles at each iteration's half state (the reference's
        # structure).  When the day-2.8 UMJS14 blowup was bisected by
        # replaying its checkpoint, chord, full, AND the round-2 solver all
        # reproduced identical growth -- the Newton variant is NOT the
        # instability driver; 'full' is kept as a robustness knob.
        assert vert_newton in ("full", "chord"), vert_newton
        self.vert_newton = vert_newton
        # EC corrector centering for the vorticity/flux arguments: 'j'
        # (default) passes the post-vertical-solve NEW states, matching the
        # reference exactly -- solve_schur_eta copies the j states back into
        # the velz_h/rho_h vectors before the corrector uses them
        # (eul/VertSolve.cpp:1931-1934, eul/Euler_2.cpp:1472-1479); 'h'
        # passes 0.5*(old+new) half states (an experimental extra-centered
        # variant, NOT the reference).
        assert corr_centering in ("h", "j"), corr_centering
        self.corr_centering = corr_centering
        # f32 runs: assemble the vertical residuals in f64 to avoid the
        # hydrostatic cancellation (V01 Phi_z vs theta grad Pi are large
        # opposing terms); arrays are small [nk, nel, n2loc] so the emulated
        # f64 cost is bounded.  Block algebra stays in the working dtype.
        if f64_resid is None:
            f64_resid = (ops.dtype == jnp.float32
                         and jax.config.jax_enable_x64)
        self.f64_resid = f64_resid
        if f64_resid and ops.dtype == jnp.float32:
            self.vo64 = VerticalOps(ops, np.asarray(vo.levs, np.float64),
                                    dtype=jnp.float64)
            self.zv64 = self.vo64.zv_gz()
        else:
            self.vo64 = None
        self.dt = dt
        self.nk = vo.nk
        self.do_visc = do_visc
        # biharmonic temperature dissipation (EC advection path only;
        # reference: do_temp_visc flag, eul/HorizSolve.cpp:36,341-360,
        # default false there too)
        self.do_temp_visc = do_temp_visc
        self.rayleigh = rayleigh
        if rayleigh:
            # graded top sponge on w: 2^-(i-1) weights on the top
            # `rayleigh_levels` interior interfaces (VertOps::AssembleRayleigh,
            # eul/VertOps.cpp fixes 3: the 0.5/0.25/0.125 thickness factors
            # are the VA mass x {1, 1/2, 1/4}; deeper absorbers -- e.g. for
            # mountain-wave radiation -- grade the same way).  Without it,
            # waves reflecting off the rigid lid accumulate and the 12-day
            # UMJS14 run blows up around day 3.
            if vo.nk < rayleigh_levels + 1:
                raise ValueError(
                    f"rayleigh sponge needs >= {rayleigh_levels} interior "
                    f"interfaces (nk >= {rayleigh_levels + 1}), got "
                    f"nk={vo.nk}; pass rayleigh=0.0")
            prof = np.zeros((vo.nk - 1, 1, 1))
            for i in range(1, rayleigh_levels + 1):
                prof[-i] = 0.5 ** (i - 1)
            self.ray_prof = jnp.asarray(prof, ops.dtype)
        self.newton_iters = newton_iters
        # Auto-escalating vertical Newton (VERDICT r4 #5): both vertical
        # solvers always run `newton_iters` iterations, then keep iterating
        # -- up to `newton_max_iters` (default 4x base) -- while the relative
        # d_pi / d_rho increment max-norms exceed `newton_tol`.  These are
        # the reference's own convergence monitors (max|dPi|/|Pi| and
        # |drho|/|rho| iterated to 1e-12, eul/VertSolve.cpp:1915-1928); the
        # loose default tolerance makes escalation a COLLAPSE GUARD, not a
        # tight-convergence contract: quiet steps (norms ~1e-5) pay only the
        # while_loop condition, while frontal-collapse steps (the UMJS14
        # day-11.7 |d|~1e-2 blowup that previously needed a manual
        # UMJS14_NEWTON_ITERS=8 override) automatically get the extra
        # iterations that cross them.  d_w/d_eta norms are reported in aux
        # but excluded from the condition: their normalizers (max|w|,
        # log theta) are near-degenerate on quiet spin-up states and would
        # escalate every step of a from-rest run.
        self.newton_max_iters = (4 * newton_iters if newton_max_iters is None
                                 else newton_max_iters)
        self.newton_tol = newton_tol
        self.hs_forcing = hs_forcing
        # upwinded vertical basis in the theta diagnosis with tau = 0.25 dt
        # (the reference's active diagTheta2 path, box/VertSolve.cpp:580-585)
        self.theta_tau = 0.25 * dt if theta_upwind else 0.0
        self.mass_tol = 1e-13 if ops.dtype == jnp.float64 else 1e-6
        self.f0 = ops.proj0(coriolis) if coriolis is not None else None
        self.zv = vo.zv_gz()                     # (nk, nel, n2loc)
        # layer thickness per quad point and its inverse -- the flux-form
        # velocity weight (module docstring); (nk, nel, nq)
        self.thickq = vo.thickq
        self.tiq = 1.0 / vo.thickq
        if do_visc or do_temp_visc:
            # biharmonic coefficient del^2 = -sqrt(0.072 dx^3.2) (Guba et al.
            # 2014; eul/HorizSolve.cpp:112-119).  dx is the reference's
            # sqrt(area / nDofs0G) with nDofs0G = nel p^2 global 0-forms --
            # i.e. element size / p, NOT /(p+1): the earlier /(p+1) made
            # del2 ~1.6x weaker than the reference at p=3, and the 2026-08-19
            # Held-Suarez run rang a 2dz top-interface mode into a NaN.
            area = float(np.sum(np.asarray(ops.det) * np.asarray(ops.W)[None, :]))
            dx = np.sqrt(area / (ops.nel * ops.p ** 2))
            # python float, not np.float64: a non-weak f64 scalar would
            # promote the whole viscosity path under x64
            self.del2 = -float(np.sqrt(0.072 * dx ** 3.2))
            self._ones_q = jnp.ones_like(self.thickq)
        self._step = jax.jit(self._step_impl)

    # ================================================================ horizontal
    def _m1k_local(self, u, k_weight):
        """Pre-DSS local contributions of the weighted layer 1-form mass."""
        ops = self.ops
        def one(uk, wq):
            G = ops.G1 * wq[..., None, None]
            return ops._apply_G(ops.gather1(uk), G)
        return jax.vmap(one)(u, k_weight)

    def scatter1k(self, loc):
        """Per-level DSS of summed local contributions (nk, nel, 2*n1loc) ->
        (nk, ln1).  Sum locals first, scatter once: each DSS costs ~30 slice
        kernels on TPU (see SWEqn._A_u)."""
        return jax.vmap(self.ops.scatter1)(loc)

    def e12k_local(self, x2):
        return jax.vmap(self.ops.e12_local)(x2.reshape(self.nk, -1))

    def _m1k(self, u, k_weight):
        """Layer 1-form mass: G1 * thick-type weight (vmapped over levels)."""
        return self.scatter1k(self._m1k_local(u, k_weight))

    def apply_M1k(self, u):
        """Flux-form layer 1-form volume mass: <v, u>_V = int iv.iu/thick
        (Umat::assemble vert_scale, eul/Assembly.cpp:109-112)."""
        return self._m1k(u, self.tiq)

    def apply_M1hk(self, u, hphys):
        """rho/theta-weighted layer 1-form mass; hphys (nk, nel, nq) physical.
        Flux form: <v, h u>_V = int iv.iu h/thick (Uhmat, eul/Assembly.cpp:445-447)."""
        return self._m1k(u, self.tiq * hphys)

    def solve_M1k(self, b, wq=None, x0=None):
        """Weighted-Schwarz Richardson on the thickness-weighted layer mass.

        `wq` overrides the per-level quad weights (leading dim must match b --
        stacking several gradient/flux systems into ONE batched solve shares
        the loop and its reduction kernels).  `x0` warm-starts (Newton
        iterates change little between iterations).

        The multiplicity-weighted additive-Schwarz block preconditioner
        (LocalOps.pc_M1w) puts the preconditioned layer mass at
        rho(I - P^-1 A) ~ 0.16 even with thickness/rho/theta quadrature
        weights (measured, UMJS14 stretched levels), so the dot-free
        fixed-depth Richardson sweep replaces CG (which burned 3 reductions
        + a cond sync per iteration inside every per-level solve); the
        residual-checked continuation guards rougher weight fields
        (solvers.richardson_checked)."""
        ops = self.ops
        tq = self.tiq if wq is None else wq
        def mv(u):
            return self._m1k(u, tq)
        w1 = ops.wdot1
        scale = 1.0 / jnp.mean(tq, axis=(1, 2))
        def pc(r):
            vl = jax.vmap(lambda rk: ops.gather1(w1 * rk))(r)
            out = jnp.einsum('eij,lej->lei', ops.M1blkinv,
                             vl) * scale[:, None, None]
            return jax.vmap(lambda ok: w1 * ops.scatter1(ok))(out)
        dot = lambda a, b_: jnp.vdot(a * ops.wdot1[None, :], b_)
        niter = 8 if self.mass_tol >= 1e-8 else 18
        return solvers.richardson_checked(mv, b, pc=pc, tol=self.mass_tol,
                                          niter=niter, dot=dot, x0=x0)

    def apply_M2k(self, x):
        """Layer 2-form mass = vertical VB: proj(x_phys)."""
        return self.vo.apply_w(self.vo.chi_VB(), x)

    def e21k(self, u):
        return jax.vmap(self.ops.e21)(u).reshape(self.nk, self.ops.nel, -1)

    def e12k(self, x2):
        return jax.vmap(self.ops.e12)(x2.reshape(self.nk, -1))

    # -------- volume-form weak-gradient pairings ---------------------------
    # With FLUX-FORM 1-form tests (v_phys = iv/thick) the divergence of the
    # Piola interpolant IS the flux divergence: <v, grad X>_V integrates by
    # parts EXACTLY to -int X_phys div(iv) dA = -(E21 v)^T B2^T[W chi ix]
    # with NO int X v.grad(thick) metric residue -- the property that keeps
    # a balanced atmosphere balanced over sloped (terrain-following) layers.
    # A density-coefficient scalar (X_phys = interp/(det*thick)) gives
    # chi = 1/(det*thick); an area coefficient (e21k outputs, interp/det)
    # gives chi = 1/det.  (The round-2 bug paired the point-value convention
    # over the AREA, time-dilating all horizontal dynamics by 1/thick.)
    def _gradpair_density(self, x2):
        return self.e12k(self.vo.apply_w(self.tiq / self.vo.det, x2))

    def _gradpair_area(self, d2):
        return self.e12k(self.vo.apply_w(1.0 / self.vo.det, d2))

    def grad_k(self, x2):
        """Weak layer gradient of a density-coefficient scalar: pointwise
        grad(x) = M1k(1/thick)^-1 <div v, x>_V (HorizSolve::grad with the
        vert_scale masses, eul/HorizSolve.cpp:208-228)."""
        return self.solve_M1k(self._gradpair_density(x2))

    def grad_k2(self, x2a, x2b):
        """Two weak layer gradients in ONE batched CG (shared while_loop)."""
        b = jnp.concatenate([self._gradpair_density(x2a),
                             self._gradpair_density(x2b)], 0)
        g = self.solve_M1k(b, wq=jnp.concatenate([self.tiq] * 2, 0))
        return g[:self.nk], g[self.nk:]

    def curl_k(self, u):
        ops = self.ops
        return jax.vmap(lambda uk: ops.solve_M0(ops.e01(ops.apply_M1(uk))))(u)

    def dudz(self, u):
        """du/dz 1-forms on interior interfaces: M1int^-1 (M1 u_phys jump)
        (HorizVort, box/Euler_2.cpp:1480-1522).  The jump is of the PHYSICAL
        velocity: flux coefficients carry per-layer 1/thick weights."""
        ops = self.ops
        mu = jax.vmap(lambda uk, tk: ops.apply_M1(uk, weight_q=tk))(
            u, self.tiq)
        du = mu[1:] - mu[:-1]
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        def solve_one(bk, tk):
            G = ops.G1 * tk[..., None, None]
            mv = lambda x: ops.scatter1(ops._apply_G(ops.gather1(x), G))
            sc = 1.0 / jnp.mean(tk)
            pc = lambda r: sc * ops.scatter1(
                jnp.einsum('eij,ej->ei', ops.M1blkinv, ops.gather1(r)))
            return solvers.cg(mv, bk, pc=pc, tol=self.mass_tol, maxiter=100,
                              dot=ops.dot1)
        return jax.vmap(solve_one)(du, tint)

    def laplacian_k(self, u):
        """COEFFICIENT vector laplacian grad(div) - rot(curl) per layer
        (HorizSolve::laplacian, box/HorizSolve.cpp:185-213; the reference
        likewise chains E21/E12 on the raw coefficients), scaled by del2.
        For flux coefficients and per-layer-constant thickness the result is
        thick * del^2(u_phys), so the caller's flux-form volume mass
        (apply_M1k / _m1k_local(., tiq)) yields the physical viscous force;
        over terrain the biharmonic is an approximate regularization (as in
        the reference, whose drivers never run nonzero terrain)."""
        ops = self.ops
        b = self.e12k(jax.vmap(lambda uk: ops.apply_M2(ops.e21(uk)))(u))
        gd = self.solve_M1k(b, wq=self._ones_q)
        w = self.curl_k(u)
        rc = jax.vmap(ops.e10)(w)
        return self.del2 * (gd - rc)

    # ---------------------------------------------------------------- fluxes
    def diagnose_fluxes(self, u1, u2, rho1p, rho2p, theta_p):
        """F = M1k^-1 [1/3-1/6 rule of rho-weighted masses], G = M1k^-1
        M1h(theta-bar) F (diagnose_fluxes, box/HorizSolve.cpp:214-268).
        rho*p are physical (nk, nel, nq); theta_p physical on nk+1 interfaces."""
        b = (self.apply_M1hk(u1, rho1p) / 3.0 + self.apply_M1hk(u2, rho1p) / 6.0
             + self.apply_M1hk(u1, rho2p) / 6.0 + self.apply_M1hk(u2, rho2p) / 3.0)
        F = self.solve_M1k(b)
        tbar = 0.5 * (theta_p[:-1] + theta_p[1:])
        G = self.solve_M1k(self.apply_M1hk(F, tbar))
        return F, G

    def advection_rhs(self, u1, u2, rho1, rho2, theta):
        """Horizontal flux-divergence FUNCTIONALS dF, dG feeding the vertical
        solve (advection_rhs, box/HorizSolve.cpp:270-324): <phi, div F>_V =
        B2^T[W divF_phys] against density test functions (chi = 1/det)."""
        vo = self.vo
        r1p, r2p = vo.phys_layer(rho1), vo.phys_layer(rho2)
        tp = vo.phys_int(theta)
        F, G = self.diagnose_fluxes(u1, u2, r1p, r2p, tp)
        # flux-form F: e21(F) = div(thick rho u) exactly; density-test
        # volume pairing -> chi = chi_VB = 1/(det thick)
        chi_div = vo.chi_VB()
        dG = vo.apply_w(chi_div, self.e21k(G))
        if self.do_temp_visc:
            # biharmonic temperature dissipation del2^2 grad(div(rho grad
            # thetabar)) added to the Theta flux -- the reference implements
            # this in the PLAIN advection path (HorizSolve::advection_rhs
            # do_temp_visc branch, eul/HorizSolve.cpp:341-360), which is the
            # path Held-Suarez runs; the EC mirror lives in
            # _advection_rhs_ec_ws.  thetabar is the layer mean of the
            # interface theta (theta->vh[kk]+vh[kk+1])/2; its weak-gradient
            # rhs needs only physical values: B2^T[W thetabar] = vo.proj.
            tbar = 0.5 * (tp[:-1] + tp[1:])
            dTh = self.solve_M1k(self.e12k(vo.proj(tbar)), wq=self.tiq)
            r_mid = 0.5 * (r1p + r2p)
            rdT = self.solve_M1k(self.scatter1k(
                self._m1k_local(dTh, self.tiq * r_mid)))
            # e21k(rdT) = div(thick rho grad theta) is layer-INTEGRATED, so
            # its scalar continuation is the DENSITY pairing (chi carries
            # 1/thick): the area pairing leaves a net x-thick (~2000)
            # amplification that makes the operator explicit-unstable
            # (measured spectral radius dt*lam 194 vs 0.09; HS ne=6 NaN'd
            # in one step from a smooth IC)
            d3 = self.solve_M1k(self._gradpair_density(self.e21k(rdT)))
            dG = dG + (self.del2 ** 2) * vo.apply_w(chi_div, self.e21k(d3))
        return vo.apply_w(chi_div, self.e21k(F)), dG, F

    # ---------------------------------------------------------------- Phi / momentum
    def diagnose_Phi(self, u1, u2, w1, w2):
        """Bernoulli functional per layer: horizontal KE (1/3 rule) + vertical
        KE contribution from layer-averaged w (1/6 rule)
        (diagnose_Phi, box/HorizSolve.cpp:326-380, eul/HorizSolve.cpp:419-474)
        + the layer-mean geopotential g zbar(x,y).  Returns B2^T[W Phi_phys]:
        against flux-form tests, <div v, Phi>_V = int Phi div(iv) dA = the
        E12 of this functional (the thickness cancels).

        The g zbar term is the Hamiltonian dH/dF contribution of the
        potential energy: over TERRAIN a layer's height varies with x, so
        moving mass along the layer changes PE and the momentum equation
        needs the compensating g grad(zbar) force (the continuum hydrostatic
        identity cp theta dPi = -g dz along a sloped isentrope).  For
        horizontally-flat levels zbar is constant per layer and E12 of its
        projection is exactly zero on the assembled closed mesh, which is why
        the reference (whose drivers all pass f_topog = 0,
        eul/HeldSuarez.cpp:234-236) never needed it."""
        ops, vo = self.ops, self.vo
        up1 = jax.vmap(ops.interp1_phys)(u1) * self.tiq[..., None]
        up2 = jax.vmap(ops.interp1_phys)(u2) * self.tiq[..., None]
        ke = (jnp.sum(up1 * up1, -1) + jnp.sum(up1 * up2, -1)
              + jnp.sum(up2 * up2, -1)) / 6.0

        def wbar_phys(w):
            wq = vo.phys_int(w)                  # (nk-1, nel, nq)
            z = jnp.zeros_like(wq[:1])
            wp = jnp.concatenate([z, wq, z], 0)
            return 0.5 * (wp[:-1] + wp[1:])      # (nk, nel, nq)

        wb1, wb2 = wbar_phys(w1), wbar_phys(w2)
        ke = ke + (wb1 * wb1 + wb1 * wb2 + wb2 * wb2) / 6.0
        # per-layer constant shifts drop out exactly (E12 proj(const) = 0
        # assembled), so subtract the layer mean: flat levels contribute a
        # bit-exact zero and terrain a well-scaled deviation in f32
        zbar = 0.5 * (vo.levs[:-1] + vo.levs[1:])
        gzbar = GRAVITY * (zbar - jnp.mean(zbar, axis=(1, 2), keepdims=True))
        return vo.proj(ke + gzbar)

    def momentum_rhs(self, u1, u2, w1, w2, theta, exner, uz1, uz2, Fz, dwdx1,
                     dwdx2):
        """Horizontal momentum rhs per layer (momentum_rhs,
        box/HorizSolve.cpp:386-540): E12 Phi + omega x u + theta-weighted
        grad Pi + vertical-shear cross terms + Coriolis + viscosity."""
        ops, vo, nk = self.ops, self.vo, self.nk
        Phi = self.diagnose_Phi(u1, u2, w1, w2)
        fu = self.e12k(Phi)

        # vorticity (plus Coriolis on the sphere) cross product: the weak
        # curl of the PHYSICAL velocity (flux coefficients carry 1/thick),
        # paired <v, (omega+f) zhat x u>_V -> quad weight W/thick (two flux
        # velocity slots against one thickness measure)
        uh = 0.5 * (u1 + u2)
        wk = jax.vmap(lambda uk, tk: ops.solve_M0(
            ops.e01(ops.apply_M1(uk, weight_q=tk))))(uh, self.tiq)
        if self.f0 is not None:
            wk = wk + self.f0[None, :]
        wqk = jax.vmap(ops.interp0)(wk) * ops.W * self.tiq
        fu = fu + self.scatter1k(jax.vmap(ops.apply_Rq_local)(wqk, uh))

        # theta-weighted Exner gradient
        tbar = 0.5 * (vo.phys_int(theta)[:-1] + vo.phys_int(theta)[1:])
        dPi = self.grad_k(exner)
        fu = fu + self.apply_M1hk(dPi, tbar)

        # vertical-shear vorticity cross terms: 1/2 sum over adjacent
        # interfaces of tbar-weighted weak projection of
        # Fz_phys * ((du/dz - dw/dx)/rho), exactly as in momentum_rhs_ec.
        # Interface-localized pairing against flux tests: each adjacent
        # layer's half-share carries that layer's 1/thick.
        uzb = 0.5 * (uz1 + uz2)                         # (nk-1, ln1)
        dwb = 0.5 * (dwdx1 + dwdx2)
        vec = jax.vmap(ops.interp1_phys)(uzb - dwb)      # (nk-1, nel, nq, 2)
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        tq = vec * (vo.phys_int(Fz) * tint)[..., None]   # physical integrand
        zq = jnp.zeros_like(tq[:1])
        tpad = jnp.concatenate([zq, tq, zq], 0)
        tsum = 0.5 * (tpad[:-1] + tpad[1:])              # (nk, nel, nq, 2)
        fu = fu + jax.vmap(ops.rhs_P1)(tsum * self.tiq[..., None])

        if self.do_visc:
            lap = self.laplacian_k(self.laplacian_k(uh))
            fu = fu + self.apply_M1k(lap)
        return fu

    # ================================================================ entropy-conserving horizontal
    def dudz_pot(self, u, rho):
        """rho-weighted vertical shear (du/dz)/rho on interior interfaces:
        M1t(rho)^-1 (M1 u_{k+1} - M1 u_k) -- the 'horizontal potential
        vorticity' of the EC scheme (Euler::HorizPotVort, eul/Euler_2.cpp).
        The jump is of the PHYSICAL velocity (flux coefficients / thick)."""
        ops, vo = self.ops, self.vo
        mu = jax.vmap(lambda uk, tk: ops.apply_M1(uk, weight_q=tk))(
            u, self.tiq)
        du = mu[1:] - mu[:-1]
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        rint = 0.5 * (vo.phys_layer(rho)[:-1] + vo.phys_layer(rho)[1:])
        return self._solve_m1_int(du, tint * rint)

    def grad_int_pot(self, w, rho):
        """rho-weighted pointwise interface gradient (dw/dx)/rho
        (HorizSolve::diagVertVort, eul/HorizSolve.cpp:823-861): solve
        M1(tbar*rho) X = <v, tbar grad w> so X = (grad w)/rho, consistent
        with dudz_pot's (du/dz)/rho (both point values per unit rho)."""
        ops, vo = self.ops, self.vo
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        rint = 0.5 * (vo.phys_layer(rho)[:-1] + vo.phys_layer(rho)[1:])
        b = jax.vmap(ops.e12)(
            vo.apply_w(tint / vo.det, w).reshape(self.nk - 1, -1))
        return self._solve_m1_int(b, tint * rint)

    def shear_grad_pot(self, u, w, rho):
        """dudz_pot and grad_int_pot fused into ONE batched interface mass
        solve -- both systems carry the SAME rho-weighted interface metric, so
        stacking them halves the launch-latency-bound CG count."""
        ops, vo = self.ops, self.vo
        mu = jax.vmap(lambda uk, tk: ops.apply_M1(uk, weight_q=tk))(
            u, self.tiq)
        du = mu[1:] - mu[:-1]
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        bw = jax.vmap(ops.e12)(
            vo.apply_w(tint / vo.det, w).reshape(self.nk - 1, -1))
        rint = 0.5 * (vo.phys_layer(rho)[:-1] + vo.phys_layer(rho)[1:])
        wq = tint * rint
        x = self._solve_m1_int(jnp.concatenate([du, bw], 0),
                               jnp.concatenate([wq, wq], 0))
        return x[:self.nk - 1], x[self.nk - 1:]

    def _solve_m1_int(self, b, wq):
        """Batched interface 1-form mass solves with quad weights wq."""
        ops = self.ops
        def solve_one(bk, tk):
            G = ops.G1 * tk[..., None, None]
            mv = lambda x: ops.scatter1(ops._apply_G(ops.gather1(x), G))
            sc = 1.0 / jnp.mean(tk)
            pc = lambda r: sc * ops.scatter1(
                jnp.einsum('eij,ej->ei', ops.M1blkinv, ops.gather1(r)))
            return solvers.cg(mv, bk, pc=pc, tol=self.mass_tol, maxiter=100,
                              dot=ops.dot1)
        return jax.vmap(solve_one)(b, wq)

    def diagnose_q_k(self, u_h, rho_h_phys):
        """Per-layer potential vorticity q = M0h(rho)^-1 (M0 f + E01 M1 u)
        (HorizSolve::diagnose_q, eul/HorizSolve.cpp:475-494).  Circulation
        pairing <curl psi, u>_V = int (grad-perp psi).iu dA carries NO
        thickness for flux-form u (thick * 1/thick cancels)."""
        ops = self.ops
        def one(uk, rk, tk):
            rhs = ops.e01(ops.apply_M1(uk))
            if self.f0 is not None:
                rhs = rhs + ops.apply_M0(self.f0, weight_q=tk)
            return rhs / ops.m0_lumped(tk * rk)
        return jax.vmap(one)(u_h, rho_h_phys, self.thickq)

    def advection_rhs_ec(self, u1, u2, rho1, rho2, theta_l2):
        """Entropy-conserving horizontal flux divergences (WEAK, VB-weighted):
          dF = VB E21 F
          dG = 1/2 VB E21 G + 1/2 VB(theta) E21 F + <gamma, 1/2 grad(theta).F>
        with theta the LAYER potential temperature
        (HorizSolve::advection_rhs_ec, eul/HorizSolve.cpp:380-417).
        Returns (dF_weak, dG_weak, F)."""
        dF, dG, F, _ = self._advection_rhs_ec_ws(u1, u2, rho1, rho2, theta_l2)
        return dF, dG, F

    def _advection_rhs_ec_ws(self, u1, u2, rho1, rho2, theta_l2, ws=None):
        """advection_rhs_ec with CG warm starts `ws` = (F0, dTh0, G0) carried
        across Newton iterations (iterates move little, so warm-started CG
        re-converges in a few iterations).  The flux and theta-gradient
        systems stack into ONE batched CG; the 4 rho-weighted masses collapse
        to 2 locals sharing one DSS (weight linearity)."""
        vo, nk = self.vo, self.nk
        r1p, r2p = vo.phys_layer(rho1), vo.phys_layer(rho2)
        thp = vo.phys_layer(theta_l2)
        b = self.scatter1k(
            self._m1k_local(u1, self.tiq * (r1p / 3.0 + r2p / 6.0))
            + self._m1k_local(u2, self.tiq * (r1p / 6.0 + r2p / 3.0)))
        bth = self._gradpair_density(theta_l2)
        F0, dTh0, G0 = (None, None, None) if ws is None else ws
        x0 = None if ws is None else jnp.concatenate([F0, dTh0], 0)
        x = self.solve_M1k(jnp.concatenate([b, bth], 0),
                           wq=jnp.concatenate([self.tiq] * 2, 0), x0=x0)
        F, dTh = x[:nk], x[nk:]
        G = self.solve_M1k(self.apply_M1hk(F, thp), x0=G0)
        # F is the flux-form mass flux: iF = thick rho u, so e21(F) is the
        # EXACT layer-integrated mass-flux divergence (the reference's
        # strong E21 F, eul/HorizSolve.cpp:365) and the density-test pairing
        # is <phi, .>_V with chi = chi_VB = 1/(det thick)
        chi_div = vo.chi_VB()
        dF = vo.apply_w(chi_div, self.e21k(F))
        dG = 0.5 * vo.apply_w(chi_div, self.e21k(G)) \
            + 0.5 * vo.apply_w(thp * chi_div, self.e21k(F))
        dThp = jax.vmap(self.ops.interp1_phys)(dTh) * self.tiq[..., None]
        Fp = jax.vmap(self.ops.interp1_phys)(F) * self.tiq[..., None]
        dG = dG + vo.proj(0.5 * jnp.sum(dThp * Fp, axis=-1))
        if self.do_temp_visc:
            # biharmonic temperature dissipation del2^2 grad(div(rho grad
            # theta)) added to the Theta flux (HorizSolve::advection_rhs
            # do_temp_visc branch, eul/HorizSolve.cpp:341-360) -- the
            # reference's stabilization for under-resolved theta fronts.
            # Reuses the EC theta gradient dTh already solved above.
            r_mid = 0.5 * (r1p + r2p)
            rdT = self.solve_M1k(self.scatter1k(
                self._m1k_local(dTh, self.tiq * r_mid)))
            # density pairing for the layer-integrated divergence -- the
            # area pairing is a x-thick amplification (see advection_rhs)
            d3 = self.solve_M1k(self._gradpair_density(self.e21k(rdT)))
            dG = dG + (self.del2 ** 2) * vo.apply_w(chi_div, self.e21k(d3))
        return dF, dG, F, (F, dTh, G)

    def momentum_rhs_ec(self, theta_l2, uz1, uz2, w1, w2, exner,
                        u1, u2, rho1, rho2, Fz, dwdx1, dwdx2):
        """Entropy-conserving horizontal momentum rhs
        (HorizSolve::momentum_rhs_ec, eul/HorizSolve.cpp:638-780):
          E12 Phi + R(q) F + 1/2 Uh(theta) grad(Pi) - 1/2 Uh(Pi) grad(theta)
          + 1/2 E12 M2h(Pi) theta + vertical-vorticity cross terms + viscosity,
        with the Coriolis force inside the rho-weighted PV q and theta the
        LAYER (W3) potential temperature.  Returns (fu, k2i) where k2i is the
        horizontal kinetic->internal exchange power tracked exactly as the
        reference does (:704-708)."""
        ops, vo, nk = self.ops, self.vo, self.nk
        Phi = self.diagnose_Phi(u1, u2, w1, w2)

        # rho-weighted PV flux: R(q) F
        r1p, r2p = vo.phys_layer(rho1), vo.phys_layer(rho2)
        u_h = 0.5 * (u1 + u2)
        q = self.diagnose_q_k(u_h, 0.5 * (r1p + r2p))
        # weight linearity: 4 rho-weighted masses collapse to 2, one DSS
        b = self.scatter1k(
            self._m1k_local(u1, self.tiq * (r1p / 3.0 + r2p / 6.0))
            + self._m1k_local(u2, self.tiq * (r1p / 6.0 + r2p / 3.0)))
        F = self.solve_M1k(b)

        # ---- sum-of-locals assembly: ONE DSS for the whole forcing ----
        loc = self.e12k_local(Phi)
        # volume pairing of two flux-form 1-forms (test v, trial F): x 1/thick
        wqk = jax.vmap(ops.interp0)(q) * ops.W * self.tiq
        loc = loc + jax.vmap(ops.apply_Rq_local)(wqk, F)

        # +-1/2 pressure splitting: theta grad(Pi) = 1/2 theta grad(Pi)
        # - 1/2 Pi grad(theta) + 1/2 grad(Pi theta)
        thp = vo.phys_layer(theta_l2)
        pip = vo.phys_layer(exner)
        dPi, dTh = self.grad_k2(exner, theta_l2)
        t1 = self._m1k_local(dPi, 0.5 * self.tiq * thp)
        t2 = self._m1k_local(dTh, -0.5 * self.tiq * pip)
        # <div v, Pi theta>_V = int Pi_phys theta_phys div(iv) dA ->
        # chi = Pi_phys * chi_VB on the theta coefficients
        prod = vo.apply_w(pip * vo.chi_VB(), theta_l2)
        dp = 0.5 * self.e12k_local(prod)
        loc = loc + t1 + t2 + dp
        # kinetic->internal exchange powers of the three pressure terms
        # (the reference dots F with only the E12 M2h(Pi) theta piece,
        # eul/HorizSolve.cpp:704-708); returned separately so the energetics
        # can assemble the combination that closes the f64 budget.  For a
        # CONSISTENT F, <F wdot, dss(x)> == <F, x>, so the powers dot the
        # pre-DSS locals directly.
        Ff = F.reshape(self.nk, ops.nel, -1)
        k2i_parts = jnp.stack([_dot_hp(Ff, t1), _dot_hp(Ff, t2),
                               _dot_hp(Ff, dp)])

        # vertical-vorticity cross terms with the rho-weighted shear:
        # uz/dwdx are pointwise (du/dz - grad w)/rho, Fz_phys = rho*w, and
        # the interface-localized volume pairing carries tbar (half to each
        # adjacent layer below)
        uzb = 0.5 * (uz1 + uz2)
        dwb = 0.5 * (dwdx1 + dwdx2)
        vec = jax.vmap(ops.interp1_phys)(uzb - dwb)      # (nk-1, nel, nq, 2)
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        tq = vec * (vo.phys_int(Fz) * tint)[..., None]   # physical integrand
        zq = jnp.zeros_like(tq[:1])
        tpad = jnp.concatenate([zq, tq, zq], 0)
        tsum = 0.5 * (tpad[:-1] + tpad[1:])              # (nk, nel, nq, 2)
        loc = loc + jax.vmap(ops.rhs_P1_local)(tsum * self.tiq[..., None])

        if self.do_visc:
            lap = self.laplacian_k(self.laplacian_k(u_h))
            visc_loc = self._m1k_local(lap, self.tiq)
            loc = loc + visc_loc
            # biharmonic KE dissipation power, same <F, forcing-local>
            # convention as the pressure powers above: positive = KE sink.
            # This is the first measured channel of the production energy
            # budget (eul/Euler_2.cpp:600-744 tracks only the exchange
            # powers; the dissipation channels close dE_tot).
            visc_p = _dot_hp(Ff, visc_loc)
        else:
            visc_p = jnp.zeros((), loc.dtype)
        return self.scatter1k(loc), jnp.concatenate(
            [k2i_parts, visc_p[None]])

    # ================================================================ vertical implicit
    def vert_residual_w(self, theta, pi, w1, w2, rho1, rho2, VAinv, uuz1, uuz2):
        return self._vert_residual_w_in(self.vo, self.zv, theta, pi, w1, w2,
                                        rho1, rho2, VAinv, uuz1)

    def _vert_residual_w_in(self, vo, zv, theta, pi, w1, w2, rho1, rho2,
                            VAinv, uuz):
        """w-momentum residual F_w and the fluxes F_z, G_z
        (assemble_residual, box/VertSolve.cpp:533-578)."""
        dt = self.dt
        Fz = vo.diagnose_Fz(w1, w2, rho1, rho2, VAinv)
        Phiz = vo.diagnose_Phiz(w1, w2, zv)
        chiA = vo.chi_VA()
        fw = vo.apply_w(chiA, w2 - w1) + dt * vo.v01(Phiz)
        # theta-weighted Exner gradient: VA(theta) VA^-1 V01 VB pi
        gradpi = jnp.einsum('lnij,lnj->lni', VAinv,
                            vo.v01(vo.apply_w(vo.chi_VB(), pi)))
        tint = theta[1:-1]
        fw = fw + dt * vo.apply_w(vo.chi_VA_theta(tint), gradpi)
        if self.rayleigh:
            fw = fw + 0.5 * dt * self.rayleigh * vo.apply_w(
                chiA * self.ray_prof, w1 + w2)
        if uuz is not None:
            fw = fw + dt * uuz
        Gz = jnp.einsum('lnij,lnj->lni', VAinv,
                        vo.apply_w(vo.chi_VA_theta(tint), Fz))
        return fw, Fz, Gz, gradpi

    def _tridiag_factor(self, lo, di, up):
        """Block-Thomas forward factorization of a block-tridiagonal system
        over the layer axis.  lo/di/up: (nk, nel, n2, n2) with lo[0] and
        up[-1] ignored.  Returns (Cs, dinvs) reused across solves -- the
        factorization carries nk SEQUENTIAL Gauss-Jordan inverses, so with a
        lagged (quasi-Newton) Jacobian it is hoisted out of the Newton loop
        and only the cheap sweeps below run per iteration."""
        def fwd(Cp, inputs):
            lo_k, di_k, up_k = inputs
            dinv = inv_small(di_k - jnp.einsum('nij,njk->nik', lo_k, Cp))
            Cn = jnp.einsum('nij,njk->nik', dinv, up_k)
            return Cn, (Cn, dinv)

        _, (Cs, dinvs) = jax.lax.scan(fwd, jnp.zeros_like(di[0]),
                                      (lo, di, up))
        return Cs, dinvs

    def _tridiag_apply(self, lo, Cs, dinvs, b):
        """Forward/backward sweeps of a factored block-tridiagonal solve
        (matvec-only; no inverses)."""
        def fwd(Dp, inputs):
            lo_k, dinv_k, b_k = inputs
            Dn = jnp.einsum('nij,nj->ni', dinv_k,
                            b_k - jnp.einsum('nij,nj->ni', lo_k, Dp))
            return Dn, Dn

        _, Ds = jax.lax.scan(fwd, jnp.zeros_like(b[0]), (lo, dinvs, b))

        def bwd(x_next, inputs):
            C_k, D_k = inputs
            x_k = D_k - jnp.einsum('nij,nj->ni', C_k, x_next)
            return x_k, x_k

        _, xs = jax.lax.scan(bwd, jnp.zeros_like(b[0]), (Cs, Ds), reverse=True)
        return xs

    def _tridiag_thomas(self, lo, di, up, b):
        """Batched block-tridiagonal solve (factor + sweeps)."""
        Cs, dinvs = self._tridiag_factor(lo, di, up)
        return self._tridiag_apply(lo, Cs, dinvs, b)

    def _newton_while(self, body, state0, base, max_iters, pick):
        """Run `body(state) -> (state, outs)` at least `base` times, then
        keep iterating while `pick(outs) > self.newton_tol`, up to
        `max_iters` total -- checked extra iterations, the same pattern as
        solvers.richardson_checked, approximating the reference's
        iterate-to-tolerance vertical Newton (eul/VertSolve.cpp:1915-1928)
        under jit.  NaN norms stop the loop at `base` (NaN > tol is False),
        so a diverged state cannot spin to max_iters."""
        outs_sd = jax.eval_shape(body, state0)[1]
        init = jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, jnp.inf, s.dtype), outs_sd)
        tol = self.newton_tol

        def cond(c):
            it, _, outs = c
            return (it < base) | ((it < max_iters) & (pick(outs) > tol))

        def bodyf(c):
            it, st, _ = c
            st, outs = body(st)
            return (it + 1, st, outs)

        return jax.lax.while_loop(
            cond, bodyf, (jnp.zeros((), jnp.int32), state0, init))

    def vert_solve(self, w_i, rho_i, rt_i, pi_i, dFx_fn, uuz=None,
                   rt_forcing_fn=None):
        """Newton iterations of the vertical implicit solve (solve_schur_2,
        box/VertSolve.cpp:1264-1458).  dFx_fn(rho_j) -> (dFx, dGx) recomputes
        the horizontal forcing each iteration (:1332-1333).

        Chord (quasi-Newton) structure as in vert_solve_eta: the linearized
        blocks and the block-tridiagonal Thomas factorization are assembled
        ONCE at the initial state (== the first iteration's half state) and
        reused; the residuals stay exact per iteration, preserving the
        converged state."""
        vo, dt, nk = self.vo, self.dt, self.nk
        chiVB = vo.chi_VB()
        VB = vo.VB_blk
        VAinv = vo.VAinv_blk
        mm = lambda a, b: jnp.einsum('lnij,lnjk->lnik', a, b)
        mvp = lambda a, b: jnp.einsum('lnij,lnj->lni', a, b)
        dtf = 0.5 * dt

        # ---- lagged linearization (initial state) ----
        theta_0 = vo.diag_theta(rho_i, rt_i,
                                w=w_i if self.theta_tau else None,
                                tau=self.theta_tau)
        M_u_chi = vo.chi_VA()
        if self.rayleigh:
            M_u_inv = inv_small(vo.wblk(M_u_chi * (
                1.0 + 0.5 * dt * self.rayleigh * self.ray_prof)))
        else:
            M_u_inv = vo.VAinv_blk
        N_pi_inv = inv_small(vo.n_pi_blocks(pi_i))
        N_rt = vo.n_rt_blocks(rt_i)
        # G_pi: interfaces x layers, bands {0, +1}: 0.5 dt VA(theta) VA^-1 V01 VB
        VAth = vo.wblk(vo.chi_VA_theta(theta_0[1:-1]))
        A_ = mm(VAth, VAinv)                              # (nk-1,...)
        Gpi_lo = -dtf * mm(A_, VB[:-1])                   # col = i
        Gpi_up = +dtf * mm(A_, VB[1:])                    # col = i+1
        # G_rt: 0.5 dt VAB(gradpi) VB(rho)^-1 VB  (bands {0,+1})
        VBrinv = inv_small(vo.wblk(vo.chi_VB_rho(rho_i)))
        Br = mm(VBrinv, VB)                               # (nk, ...)
        gq = vo.interp(vo.grad_z(pi_i, VAinv)) / vo.det   # gradpi_phys (nk-1,..)
        Wg = vo.wblk(0.5 * gq / vo.det)                   # (nk-1, nel, n2, n2)
        Grt_lo = dtf * mm(Wg, Br[:-1])
        Grt_up = dtf * mm(Wg, Br[1:])
        # combine: Gcomb = G_rt - G_pi N_pi^-1 N_rt  (cols are layers)
        NpiNrt = mm(N_pi_inv, N_rt)
        Gc_lo = Grt_lo - mm(Gpi_lo, NpiNrt[:-1])
        Gc_up = Grt_up - mm(Gpi_up, NpiNrt[1:])
        # D_rt: layers x interfaces, bands {-1, 0}: 0.5 dt VB(rt) V10
        VBrt = vo.wblk(vo.chi_VB_rho(rt_i))
        # L = M_rt - Dcomb M_u^-1 Gcomb  (tridiagonal in layers; Q_rt_rho
        # lagged, see module docstring)
        MuG_lo = mm(M_u_inv, Gc_lo)                       # (nk-1,..) col=i
        MuG_up = mm(M_u_inv, Gc_up)                       # col=i+1
        zero = jnp.zeros_like(VB[:1])
        diag = VB - dtf * jnp.concatenate([
            mm(VBrt[:-1], MuG_lo), zero], 0) \
            + dtf * jnp.concatenate([zero, mm(VBrt[1:], MuG_up)], 0)
        up = jnp.concatenate([-dtf * mm(VBrt[:-1], MuG_up), zero], 0)
        lo = jnp.concatenate([zero, +dtf * mm(VBrt[1:], MuG_lo)], 0)
        Cs, dinvs = self._tridiag_factor(lo, diag, up)
        Rnu = mm(VAinv, vo.wblk(vo.chi_VA_rho(rho_i)))

        def newton(state, _):
            w_j, rho_j, rt_j, pi_j = state
            wh_ = 0.5 * (w_i + w_j)
            theta_h = vo.diag_theta(0.5 * (rho_i + rho_j), 0.5 * (rt_i + rt_j),
                                    w=wh_ if self.theta_tau else None,
                                    tau=self.theta_tau)
            pi_h = 0.5 * (pi_i + pi_j)
            rho_h = 0.5 * (rho_i + rho_j)
            rt_h = 0.5 * (rt_i + rt_j)

            dFx, dGx, _ = dFx_fn(rho_j)

            if self.vo64 is not None:
                c64 = lambda a: jnp.asarray(a, jnp.float64)
                vo_r, zv_r = self.vo64, self.zv64
                VAinv_r = vo_r.VA_inv_blocks()
                F_w, Fz, Gz, gradpi = self._vert_residual_w_in(
                    vo_r, zv_r, c64(theta_h), c64(pi_h), c64(w_i), c64(w_j),
                    c64(rho_i), c64(rho_j), VAinv_r,
                    None if uuz is None else c64(uuz))
                F_pi = vo_r.eos_residual(c64(rt_j), c64(pi_j))
                dFz = vo_r.v10(Fz)
                dGz = vo_r.v10(Gz)
                F_rho = vo_r.apply_w(vo_r.chi_VB(),
                                     c64(rho_j - rho_i) + dt * dFz) \
                    + dt * c64(dFx)
                F_rt = vo_r.apply_w(vo_r.chi_VB(),
                                    c64(rt_j - rt_i) + dt * dGz) \
                    + dt * c64(dGx)
                f32 = lambda a: jnp.asarray(a, self.ops.dtype)
                F_w, F_pi, F_rho, F_rt = map(f32, (F_w, F_pi, F_rho, F_rt))
                gradpi = f32(gradpi)
            else:
                F_w, Fz, Gz, gradpi = self.vert_residual_w(
                    theta_h, pi_h, w_i, w_j, rho_i, rho_j, VAinv,
                    uuz, uuz)
                F_pi = vo.eos_residual(rt_j, pi_j)
                dFz = vo.v10(Fz)
                dGz = vo.v10(Gz)
                F_rho = vo.apply_w(chiVB, rho_j - rho_i + dt * dFz) + dt * dFx
                F_rt = vo.apply_w(chiVB, rt_j - rt_i + dt * dGz) + dt * dGx
            if rt_forcing_fn is not None:
                F_rt = F_rt + dt * rt_forcing_fn(rho_h, rt_h, pi_h, theta_h)

            # ---- reduce residuals (hoisted blocks) ----
            FpiN = mvp(N_pi_inv, F_pi)
            Fu_p = F_w - (mvp(Gpi_lo, FpiN[:-1]) + mvp(Gpi_up, FpiN[1:]))
            MuF = mvp(M_u_inv, Fu_p)
            # F_rt'' = F_rt - D M_u^-1 F_u'
            DMuF = dtf * (jnp.concatenate([
                mvp(VBrt[:-1], MuF), zero[..., 0]], 0)
                - jnp.concatenate([zero[..., 0], mvp(VBrt[1:], MuF)], 0))
            F_rt2 = F_rt - DMuF

            d_rt = self._tridiag_apply(lo, Cs, dinvs, -F_rt2)

            # ---- back substitution ----
            Gc_drt = mvp(Gc_lo, d_rt[:-1]) + mvp(Gc_up, d_rt[1:])
            d_w = -mvp(M_u_inv, Fu_p + Gc_drt)
            d_pi = -mvp(N_pi_inv, F_pi + mvp(N_rt, d_rt))
            # rho: VB d_rho = -(F_rho + D_rho d_w),
            # D_rho = 0.5 dt VB V10 VA^-1 VA(rho); Rnu lagged at rho_i
            rw = mvp(Rnu, d_w)
            d_rho = -mvp(vo.VBinv_blk,
                         F_rho + dtf * vo.apply_w(chiVB, vo.v10(rw)))

            d = self.ops.dtype
            w_n = (w_j + d_w).astype(d)
            rho_n = (rho_j + d_rho).astype(d)
            rt_n = (rt_j + d_rt).astype(d)
            pi_n = (pi_j + d_pi).astype(d)
            # the reference's convergence monitors (max|dPi|/|Pi|,
            # |drho|/|rho|; eul/VertSolve.cpp:1923) drive escalation
            mx = lambda a, b: jnp.max(jnp.abs(a) / jnp.maximum(
                jnp.max(jnp.abs(b)), 1e-30))
            norms = jnp.stack([mx(d_pi, pi_n), mx(d_rho, rho_n)])
            return (w_n, rho_n, rt_n, pi_n), norms

        state = (w_i, rho_i, rt_i, pi_i)
        max_iters = max(self.newton_max_iters, self.newton_iters)
        _, state, _ = self._newton_while(
            lambda st: newton(st, None), state, self.newton_iters,
            max_iters, jnp.max)
        return state

    # ================================================================ entropy-variable vertical solve
    def vert_residual_ec(self, theta_l2, pi_h, w1, w2, rho1, rho2, VAinv, uuz):
        """EC w-momentum residual with the +-1/2 vertical pressure splitting
        and the entropy-conserving temperature-transport correction
        (VertSolve::assemble_residual_ec, eul/VertSolve.cpp:432-502):
          F_w = VA(w2-w1) + dt V01 Phi_z + 0.5 dt VA(theta) VA^-1 V01 VB Pi
                + 0.5 dt V01 VB(theta) Pi - 0.5 dt VAB(grad_z theta) Pi
          f_theta_corr = 0.5 dt [ VB(theta) V10 F_z + VBA(grad_z theta) F_z ]
        Returns (F_w, F_z, G_z, f_theta_corr, k2i_z)."""
        vo, dt = self.vo, self.dt
        Fz = vo.diagnose_Fz(w1, w2, rho1, rho2, VAinv)
        Phiz = vo.diagnose_Phiz(w1, w2, self.zv)
        fw = vo.apply_w(vo.chi_VA(), w2 - w1) + dt * vo.v01(Phiz)

        # 0.5 theta grad(Pi) with the LAYER theta weighting (chi_VA_rho)
        gradpi = vo.grad_z(pi_h, VAinv)
        VAth = vo.wblk(vo.chi_VA_rho(theta_l2))
        press = jnp.einsum('lnij,lnj->lni', VAth, gradpi)
        fw = fw + 0.5 * dt * press
        k2i_z = _dot_hp(Fz, press)

        # temperature flux G_z = VA^-1 VA(theta) F_z
        Gz = jnp.einsum('lnij,lnj->lni', VAinv,
                        jnp.einsum('lnij,lnj->lni', VAth, Fz))

        # entropy-conserving corrections: +0.5 grad(theta Pi) - 0.5 Pi grad(theta)
        gradth = vo.grad_z(theta_l2, VAinv)
        fw = fw + 0.5 * dt * vo.v01(vo.apply_w(vo.chi_VB_rho(theta_l2), pi_h))
        fw = fw - 0.5 * dt * vo.vab_w(gradth, pi_h)

        if self.rayleigh:
            ray_term = 0.5 * self.rayleigh * vo.apply_w(
                vo.chi_VA() * self.ray_prof, w1 + w2)
            fw = fw + dt * ray_term
            # sponge KE sink power, same <F_z, forcing> convention as k2i_z
            # (positive = KE leaves the resolved budget)
            ray_p = _dot_hp(Fz, ray_term)
        else:
            ray_p = jnp.zeros((), fw.dtype)
        if uuz is not None:
            fw = fw + dt * uuz

        f_theta_corr = 0.5 * dt * (
            vo.apply_w(vo.chi_VB_rho(theta_l2), vo.v10(Fz))
            + vo.vba_w(gradth, Fz))
        return fw, Fz, Gz, f_theta_corr, k2i_z, ray_p

    def vert_solve_eta(self, w_i, rho_i, rt_i, pi_i, theta_l2_i, dFx_fn,
                       uuz=None, rt_forcing_fn=None, newton_iters=None):
        """Newton iterations of the entropy-variable vertical solve
        (VertSolve::solve_schur_eta, eul/VertSolve.cpp:1721-1975): unknowns
        (w, rho, eta=log(Theta/rho), Pi), residuals assembled exactly at the
        half state, column 4x4 block system reduced to a block-TRIDIAGONAL
        Helmholtz solve in d(Pi) with a block-diagonal-lumped w-mass
        (the reference lumps pointwise, :747-752), then back-substitution
        Theta = VB^-1 proj(rho exp(eta)) (:1864-1873).

        Returns (w, rho, rt, pi, theta_l2_h, aux) with aux carrying the
        k2i_z exchange power and the final increment max-norms (the
        reference's 1e-12 convergence monitors, :1915-1928).

        Newton structure (self.vert_newton):
        - 'chord' (quasi-Newton, default): ALL linearization blocks --
          including the block-tridiagonal Helmholtz factorization, whose
          forward elimination is nk sequential Gauss-Jordan inverses -- are
          assembled ONCE at the initial state (identical to the first
          iteration's half state, since w_j = w_i there) and reused by
          every iteration.  The residuals stay exact at the current half
          state, so the converged state is unchanged (same argument as the
          lagged Q_rt_rho block, module docstring; the reference instead
          rebuilds ~70 PETSc mats per iteration).
        - 'full': the reference's structure -- every linearization block is
          reassembled at the CURRENT iterate's half state each iteration
          (eul/VertSolve.cpp:1760-1797).  ~2x the per-iteration block
          algebra.  Chord was exonerated for the day-2.8 UMJS14 blowup by
          checkpoint replay (chord/full/round-2 all grew identically), so
          'full' is a robustness knob, not the default."""
        vo, dt, nk = self.vo, self.dt, self.nk
        rdcv = RD / CV
        chiVB = vo.chi_VB()
        VB = vo.VB_blk
        VBinv = vo.VBinv_blk
        VAinv = vo.VAinv_blk
        # the lumped w-block of the Jacobian carries the Rayleigh sponge term
        # (AssembleLinearWithRayleighInv, eul/VertSolve.cpp:519-520); the
        # residual itself adds it in vert_residual_ec
        VA_jac = vo.wblk(vo.chi_VA()) if not self.rayleigh else vo.wblk(
            vo.chi_VA() * (1.0 + 0.5 * self.dt * self.rayleigh
                           * self.ray_prof))
        if newton_iters is None:
            newton_iters = self.newton_iters
        mm = lambda a, b: jnp.einsum('lnij,lnjk->lnik', a, b)
        mv = lambda a, b: jnp.einsum('lnij,lnj->lni', a, b)
        hdt = 0.5 * dt
        zero = jnp.zeros_like(VB[:1])

        def assemble(w_a, rho_a, rt_a, pi_a):
            """All linearization blocks at state a (chord: the initial
            state, once; full: the current half state, every iteration)."""
            VBrt_inv = inv_small(vo.wblk(vo.chi_VB_rho(rt_a)))
            VBrho_inv = inv_small(vo.wblk(vo.chi_VB_rho(rho_a)))
            th_W3 = jnp.einsum('lnij,lnj->lni', VBrho_inv,
                               vo.apply_w(chiVB, rt_a))
            eta_0 = vo.log_theta_plus_eta(th_W3)
            thp = vo.phys_layer(th_W3)
            gradpi = vo.grad_z(pi_a, VAinv)
            dPip = vo.phys_int(gradpi)
            gradeta = vo.grad_z(eta_0, VAinv)
            dEtap = vo.phys_int(gradeta)

            # G_eta[i,k], k in {i, i+1}: 0.5 dt wblk(0.5 dPi theta_k / det)
            Ge_lo = hdt * vo.wblk(0.5 * dPip * thp[:-1] / vo.det)
            Ge_up = hdt * vo.wblk(0.5 * dPip * thp[1:] / vo.det)
            # G_pi[i,m]: 0.5 dt VA(theta) VA^-1 V01 VB
            A_ = mm(vo.wblk(vo.chi_VA_rho(th_W3)), VAinv)
            Gp_lo = -hdt * mm(A_, VB[:-1])
            Gp_up = +hdt * mm(A_, VB[1:])
            # D_rho row blocks: +-0.5 dt VB[k] (VA^-1 VA(rho))[i]
            Rnu = mm(VAinv, vo.wblk(vo.chi_VA_rho(rho_a)))
            # A_eta row blocks: 0.5 dt wblk(0.5 dEta / det)
            Wd = hdt * vo.wblk(0.5 * dEtap / vo.det)
            # EOS blocks
            N_pi = vo.eos_block(pi_a)
            N_rho = vo.eos_block(rho_a)
            CrVBi = mm(N_rho, VBinv)

            # lumped w-block: L_eta[i,i] = VA[i] - Ge_lo VBinv[i] Wd[i]
            #                              - Ge_up VBinv[i+1] Wd[i]
            L_eta_d = VA_jac - mm(Ge_lo, mm(VBinv[:-1], Wd)) \
                - mm(Ge_up, mm(VBinv[1:], Wd))
            Mw_inv = inv_small(L_eta_d)

            # pc_DIV row blocks (layers k): i=k ('hi') and i=k-1 ('lo')
            D_hi = +hdt * mm(VB[:-1], Rnu)                 # rows k=0..nk-2
            D_lo = -hdt * mm(VB[1:], Rnu)                  # rows k=1..nk-1
            PD_hi = mm(mm(CrVBi[:-1], D_hi) + Wd, Mw_inv)  # row k=i
            PD_lo = mm(mm(CrVBi[1:], D_lo) + Wd, Mw_inv)   # row k=i+1

            # Helmholtz operator L_pi (block-tridiagonal over layers)
            diag = N_pi - rdcv * (
                jnp.concatenate([zero, mm(PD_lo, Gp_up)], 0)
                + jnp.concatenate([mm(PD_hi, Gp_lo), zero], 0))
            lower = -rdcv * jnp.concatenate([zero, mm(PD_lo, Gp_lo)], 0)
            upper = -rdcv * jnp.concatenate([mm(PD_hi, Gp_up), zero], 0)
            Cs, dinvs = self._tridiag_factor(lower, diag, upper)
            return dict(VBrt_inv=VBrt_inv, VBrho_inv=VBrho_inv,
                        Ge_lo=Ge_lo, Ge_up=Ge_up, Gp_lo=Gp_lo, Gp_up=Gp_up,
                        Rnu=Rnu, Wd=Wd, CrVBi=CrVBi, Mw_inv=Mw_inv,
                        PD_hi=PD_hi, PD_lo=PD_lo, lower=lower, Cs=Cs,
                        dinvs=dinvs)

        chord = getattr(self, "vert_newton", "full") == "chord"
        blk0 = assemble(w_i, rho_i, rt_i, pi_i) if chord else None

        def newton(state, _):
            w_j, rho_j, rt_j, pi_j, ws = state
            rho_h = 0.5 * (rho_i + rho_j)
            rt_h = 0.5 * (rt_i + rt_j)
            pi_h = 0.5 * (pi_i + pi_j)
            theta_l2_j = vo.diag_theta_l2(rho_j, rt_j)
            theta_l2_h = 0.5 * (theta_l2_i + theta_l2_j)

            blk = blk0 if chord else assemble(
                0.5 * (w_i + w_j), rho_h, rt_h, pi_h)
            VBrt_inv, VBrho_inv = blk["VBrt_inv"], blk["VBrho_inv"]
            Ge_lo, Ge_up = blk["Ge_lo"], blk["Ge_up"]
            Gp_lo, Gp_up = blk["Gp_lo"], blk["Gp_up"]
            Rnu, Wd, CrVBi = blk["Rnu"], blk["Wd"], blk["CrVBi"]
            Mw_inv, PD_hi, PD_lo = blk["Mw_inv"], blk["PD_hi"], blk["PD_lo"]
            lower, Cs, dinvs = blk["lower"], blk["Cs"], blk["dinvs"]

            # horizontal forcing recomputed every Newton iteration
            # (eul/VertSolve.cpp:1798-1799), warm-started CG
            dFx, dGx, ws = dFx_fn(rho_j, theta_l2_h, ws)

            # ---- residuals (exact, at the half state) ----
            F_w, Fz, Gz, f_corr, k2i_z, ray_p = self.vert_residual_ec(
                theta_l2_h, pi_h, w_i, w_j, rho_i, rho_j, VAinv, uuz)
            F_pi = vo.eos_residual(rt_j, pi_j)
            F_rho = vo.apply_w(chiVB, rho_j - rho_i + dt * vo.v10(Fz)) + dt * dFx
            F_rt = vo.apply_w(chiVB, rt_j - rt_i + 0.5 * dt * vo.v10(Gz)) \
                + dt * dGx + f_corr
            if rt_forcing_fn is not None:
                F_rt = F_rt + dt * rt_forcing_fn(rho_h, rt_h, pi_h)

            # entropy residual from the Theta and rho residuals
            # (eul/VertSolve.cpp:1840-1846): F_eta = VB [VB(rt)^-1 F_rt
            # - VB(rho)^-1 F_rho]; lagged weights preserve the fixed point
            # (F_rt = F_rho = 0 => F_eta = 0 for any invertible weighting)
            F_eta = jnp.einsum('lnij,lnj->lni', VB,
                               jnp.einsum('lnij,lnj->lni', VBrt_inv, F_rt)
                               - jnp.einsum('lnij,lnj->lni', VBrho_inv, F_rho))

            # ---- residual reduction ----
            VBiFe = mv(VBinv, F_eta)
            F_u1 = F_w - (mv(Ge_lo, VBiFe[:-1]) + mv(Ge_up, VBiFe[1:]))
            zr = jnp.zeros_like(F_pi[:1])
            PDF = (jnp.concatenate([zr, mv(PD_lo, F_u1)], 0)
                   + jnp.concatenate([mv(PD_hi, F_u1), zr], 0))
            rhs_pi = -F_pi + rdcv * (PDF - mv(CrVBi, F_rho) - F_eta)
            d_pi = self._tridiag_apply(lower, Cs, dinvs, rhs_pi)

            # ---- back substitution ----
            F_u2 = -(F_u1 + mv(Gp_lo, d_pi[:-1]) + mv(Gp_up, d_pi[1:]))
            d_w = mv(Mw_inv, F_u2)
            AeDw = (jnp.concatenate([zr, mv(Wd, d_w)], 0)
                    + jnp.concatenate([mv(Wd, d_w), zr], 0))
            d_eta = -mv(VBinv, F_eta + AeDw)
            DrDw = hdt * vo.apply_w(chiVB, vo.v10(mv(Rnu, d_w)))
            d_rho = -mv(VBinv, F_rho + DrDw)

            # Theta back-substitution.  The reference reconstructs
            # rt = VB^-1 proj[rho exp(VB^-1 proj[log theta] + d_eta)]
            # (eul/VertSolve.cpp:1858-1873, VertOps.cpp:1204-1305).  The
            # log->project->exp->project round trip through the LOSSY L2
            # projection (16 quad points vs 9 modes) carries a Jensen
            # (convexity) bias: rt is inflated by O((grad_z log theta)^2 h^2)
            # PER STEP, independent of dt and Newton convergence -- measured
            # +5e-5 Etot/step on the stratified sphere (HS ne4/nk8; the
            # near-uniform-theta box oracle cannot see it), which pumped a
            # top-of-model circulation until blowup.  Instead reconstruct
            #   rt = VB^-1 VB(rho_n exp(d_eta)) theta
            # directly from the W3 theta: at d_eta=0, d_rho=0 this is the
            # identity EXACTLY (theta := VB(rho)^-1 VB rt), so the fixed
            # point is bias-free while the d_eta Newton update acts the same
            # way the reference's exp(eta + d_eta) does.
            th_j_W3 = jnp.einsum(
                'lnij,lnj->lni',
                inv_small(vo.wblk(vo.chi_VB_rho(rho_j))),
                vo.apply_w(chiVB, rt_j))

            d = self.ops.dtype
            w_n = (w_j + d_w).astype(d)
            rho_n = (rho_j + d_rho).astype(d)
            pi_n = (pi_j + d_pi).astype(d)
            exp_deta = jnp.exp(jnp.clip(vo.phys_layer(d_eta), -30.0, 30.0))
            rt_n = jnp.einsum(
                'lnij,lnj->lni', VBinv,
                vo.apply_w(vo.chi_VB_rho(rho_n) * exp_deta,
                           th_j_W3)).astype(d)

            mx = lambda a, b: jnp.max(jnp.abs(a) / jnp.maximum(
                jnp.max(jnp.abs(b)), 1e-30))
            # d_eta is an increment of log(theta) ~ 6, so normalize against
            # the physical log-theta magnitude
            log_th = jnp.log(jnp.maximum(vo.phys_layer(th_j_W3), 1e-12))
            norms = jnp.stack([mx(d_pi, pi_n), mx(d_w, w_n),
                               mx(d_rho, rho_n),
                               mx(vo.phys_layer(d_eta), log_th)])
            return (w_n, rho_n, rt_n, pi_n, ws), (norms, k2i_z, ray_p)

        zf = jnp.zeros((nk, self.ops.ln1), self.ops.dtype)
        state = (w_i, rho_i, rt_i, pi_i, (zf, zf, zf))
        max_iters = max(self.newton_max_iters, newton_iters)
        # escalate on the d_pi / d_rho monitors only (norms stack order:
        # [d_pi, d_w, d_rho, d_eta]; see the constructor comment)
        nit, state, (norms, k2i_z, ray_p) = self._newton_while(
            lambda st: newton(st, None), state, newton_iters, max_iters,
            lambda outs: jnp.maximum(outs[0][0], outs[0][2]))
        w_j, rho_j, rt_j, pi_j, _ = state
        theta_l2_h = 0.5 * (theta_l2_i + vo.diag_theta_l2(rho_j, rt_j))
        aux = dict(newton_norms=norms, k2i_z=k2i_z, ray_p=ray_p,
                   newton_iters_run=nit)
        return w_j, rho_j, rt_j, pi_j, theta_l2_h, aux

    # ================================================================ Held-Suarez forcing
    def hs_friction(self, u, exner):
        """Rayleigh boundary-layer friction k_v(sigma) u (Held & Suarez 1994;
        Umat_ray, eul/Assembly.h:325-335).  Applied explicitly (k_f dt << 1)."""
        vo = self.vo
        kf = 1.0 / 86400.0
        sigma_b = 0.7
        pip = vo.phys_layer(exner)
        p = (pip / CP) ** (CP / RD)
        sigma = p / p[0:1]
        kv = kf * jnp.maximum(0.0, (sigma - sigma_b) / (1.0 - sigma_b))
        return self._m1k(u, self.tiq * kv)

    def hs_temp_forcing(self, rho, rt, exner, theta):
        """Temperature relaxation rho k_T (theta - theta_eq) projected onto
        layers (compute_k_T/AssembleTempForcing_HS, eul/VertOps.cpp)."""
        vo = self.vo
        phi = self.ops.lonlat[None, :, :, 1]
        pip = vo.phys_layer(exner)
        p = (pip / CP) ** (CP / RD)
        sigma = p / p[0:1]
        ka, ks = 1.0 / 40.0 / 86400.0, 1.0 / 4.0 / 86400.0
        sigma_b = 0.7
        kt = ka + jnp.maximum(0.0, (sigma - sigma_b) / (1.0 - sigma_b)) \
            * (ks - ka) * jnp.cos(phi) ** 4
        t_eq = (315.0 - 60.0 * jnp.sin(phi) ** 2
                - 10.0 * jnp.log(p) * jnp.cos(phi) ** 2) * p ** (RD / CP)
        t_eq = jnp.maximum(t_eq, 200.0)
        theta_eq = t_eq * p ** (-RD / CP)
        thq = 0.5 * (vo.phys_int(theta)[:-1] + vo.phys_int(theta)[1:])
        return vo.proj(vo.phys_layer(rho) * kt * (thq - theta_eq))

    # ================================================================ aux diagnostics
    def grad_int(self, w):
        """Pointwise horizontal gradient 1-forms of the interface field w
        (diagVertVort analogue, eul/HorizSolve.cpp:823-861)."""
        ops, vo = self.ops, self.vo
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        b = jax.vmap(ops.e12)(
            vo.apply_w(tint / vo.det, w).reshape(self.nk - 1, -1))
        def solve_one(bk, tk):
            G = ops.G1 * tk[..., None, None]
            mv = lambda x: ops.scatter1(ops._apply_G(ops.gather1(x), G))
            sc = 1.0 / jnp.mean(tk)
            pc = lambda r: sc * ops.scatter1(
                jnp.einsum('eij,ej->ei', ops.M1blkinv, ops.gather1(r)))
            return solvers.cg(mv, bk, pc=pc, tol=self.mass_tol, maxiter=100,
                              dot=ops.dot1)
        return jax.vmap(solve_one)(b, tint)

    def uuz_term(self, u, uz, rint=None):
        """u . du/dz as an interface w-equation functional (AssembleVertMomVort,
        box/VertSolve.cpp:1460+): <phi_w, u.du/dz>_V = B2^T[W tbar (u.du/dz)]
        for density interface tests (phys = interp/det).  With `rint` the
        shear uz is the rho-weighted pointwise (du/dz)/rho from
        shear_grad_pot, un-weighted back by the interface density."""
        ops, vo = self.ops, self.vo
        # interface-avg PHYSICAL velocity: per-layer 1/thick before averaging
        ua = jax.vmap(ops.interp1_phys)(u) * self.tiq[..., None]
        up = 0.5 * (ua[:-1] + ua[1:])                   # (nk-1, nel, nq, 2)
        uzp = jax.vmap(ops.interp1_phys)(uz)
        tint = 0.5 * (self.thickq[:-1] + self.thickq[1:])
        s = jnp.sum(up * uzp, axis=-1)
        if rint is not None:
            s = s * rint
        return vo.proj(tint * s)

    # ================================================================ step
    def _step_impl(self, velx, w, rho, rt, exner, velx_prev, first):
        vo, dt, nk = self.vo, self.dt, self.nk
        theta_i = vo.diag_theta(rho, rt, w=w if self.theta_tau else None,
                                tau=self.theta_tau)

        # --- 1. explicit horizontal predictor (leapfrog 2dt after first step)
        uz1, dwdx1 = self.shear_grad_pot(velx, w, rho)
        VAinv = vo.VA_inv_blocks()
        Fz1 = vo.diagnose_Fz(w, w, rho, rho, VAinv)
        fu0 = self.momentum_rhs(velx, velx, w, w, theta_i, exner, uz1, uz1,
                                Fz1, dwdx1, dwdx1)
        if self.hs_forcing:
            fu0 = fu0 + self.hs_friction(velx, exner)
        bu = jnp.where(first,
                       self.apply_M1k(velx) - dt * fu0,
                       self.apply_M1k(velx_prev) - 2.0 * dt * fu0)
        velx_1 = self.solve_M1k(bu)

        # --- 2. implicit vertical solve
        rp = vo.phys_layer(rho)
        uuz = self.uuz_term(velx, uz1, rint=0.5 * (rp[:-1] + rp[1:]))
        def dFx_fn(rho_j):
            theta_h = vo.diag_theta(0.5 * (rho + rho_j), rt,
                                    w=w if self.theta_tau else None,
                                    tau=self.theta_tau)
            return self.advection_rhs(velx, velx_1, rho, rho_j, theta_h)
        w_j, rho_j, rt_j, pi_j = self.vert_solve(
            w, rho, rt, exner, dFx_fn, uuz,
            rt_forcing_fn=self.hs_temp_forcing if self.hs_forcing else None)

        # --- 3. explicit horizontal corrector (dt, midpoint fields)
        theta_j = vo.diag_theta(rho_j, rt_j, w=w_j if self.theta_tau else None,
                                tau=self.theta_tau)
        theta_h = 0.5 * (theta_i + theta_j)
        pi_h = 0.5 * (exner + pi_j)
        uz2, dwdx2 = self.shear_grad_pot(velx_1, w_j, rho_j)
        Fz = vo.diagnose_Fz(w, w_j, rho, rho_j, VAinv)
        fu = self.momentum_rhs(velx, velx_1, w_j, w, theta_h, pi_h, uz2, uz1,
                               Fz, dwdx1, dwdx2)
        if self.hs_forcing:
            fu = fu + self.hs_friction(0.5 * (velx + velx_1), pi_h)
        velx_2 = self.solve_M1k(self.apply_M1k(velx) - dt * fu)

        d = self.ops.dtype
        return (velx_2.astype(d), w_j.astype(d), rho_j.astype(d),
                rt_j.astype(d), pi_j.astype(d), velx.astype(d))

    def step(self, state, first=False):
        """state = (velx, w, rho, rt, exner, velx_prev)."""
        return self._step(*state, jnp.asarray(first))

    def run_steps(self, state, nsteps: int):
        """nsteps plain-Strang steps in ONE lax.scan dispatch (first=False
        steps) -- the scan-chunked production runner for the non-EC path
        (Euler::Strang, the reference's Held-Suarez integrator,
        eul/HeldSuarez.cpp:352).  The plain path carries no Newton-norm aux;
        returns max|w| of the final state as the health scalar production
        drivers watch for NaN."""
        def body(st, _):
            return self._step_impl(*st, jnp.asarray(False)), None
        state, _ = jax.lax.scan(body, state, None, length=nsteps)
        return state, dict(wmax=jnp.max(jnp.abs(state[1])))

    # ================================================================ trapezoidal step
    def horiz_rhs(self, u, w_z, rho, rt, exner, uz, dwdx, Fz):
        """Single-state horizontal RHS (Euler::HorizRHS, eul/Euler_2.cpp:340-427):
        momentum forcing Fu, mass-flux divergence Fp, temperature-flux
        divergence Ft (strong 2-form coefficients)."""
        vo = self.vo
        theta = vo.diag_theta(rho, rt, w=w_z if self.theta_tau else None,
                              tau=self.theta_tau)
        Fu = self.momentum_rhs(u, u, w_z, w_z, theta, exner, uz, uz, Fz,
                               dwdx, dwdx)
        Fp, Ft, _ = self.advection_rhs(u, u, rho, rho, theta)
        return Fu, Fp, Ft

    def _step_trap_impl(self, velx, w, rho, rt, exner):
        """Trapezoidal (Heun / Crank-Nicolson-like) HEVI step
        (Euler::Trapazoidal, eul/Euler_2.cpp:762-1003).  NOTE: the reference
        body is compiled out (`#if 0`, :763), so the live GravWave driver's
        per-step call is a no-op there; this implements the documented scheme:
          1. Euler horizontal predictor at state 0
          2. trapezoidal horizontal redo + implicit vertical solve with the
             FIXED half-sum horizontal forcings (vert forcings are not
             recomputed per Newton iteration in this variant, :1027)
          3. trapezoidal horizontal corrector + final vertical solve."""
        vo, dt = self.vo, self.dt
        VAinv = vo.VA_inv_blocks()

        # stage 0
        uz0, dwdx0 = self.shear_grad_pot(velx, w, rho)
        Fz0 = vo.diagnose_Fz(w, w, rho, rho, VAinv)
        rp = vo.phys_layer(rho)
        uuz = self.uuz_term(velx, uz0, rint=0.5 * (rp[:-1] + rp[1:]))
        Fu0, Fp0, Ft0 = self.horiz_rhs(velx, w, rho, rt, exner, uz0, dwdx0, Fz0)

        # 1. explicit Euler horizontal predictor (Fp/Ft are volume-form
        # functionals against density tests -> coefficient update via VB^-1)
        vbinv = lambda b: jnp.einsum('lnij,lnj->lni', vo.VBinv_blk, b)
        velx_1 = self.solve_M1k(self.apply_M1k(velx) - dt * Fu0)
        rho_1 = rho - dt * vbinv(Fp0)
        rt_1 = rt - dt * vbinv(Ft0)
        pi_1 = vo.eos_exner(rt_1)

        # 2. trapezoidal horizontal redo (velz stays state-0, :841)
        uz1, _ = self.shear_grad_pot(velx_1, w, rho_1)
        Fu1, Fp1, Ft1 = self.horiz_rhs(velx_1, w, rho_1, rt_1, pi_1, uz1,
                                       dwdx0, Fz0)
        velx_2 = self.solve_M1k(self.apply_M1k(velx) - 0.5 * dt * (Fu0 + Fu1))
        dFh = 0.5 * (Fp0 + Fp1)
        dGh = 0.5 * (Ft0 + Ft1)
        w_2, rho_2, rt_2, pi_2 = self.vert_solve(
            w, rho, rt, exner, lambda rho_j: (dFh, dGh, None), uuz)

        # 3. trapezoidal horizontal corrector + final vertical solve
        uz2, dwdx2 = self.shear_grad_pot(velx_2, w_2, rho_2)
        Fz2 = vo.diagnose_Fz(w_2, w_2, rho_2, rho_2, VAinv)
        Fu2, Fp2, Ft2 = self.horiz_rhs(velx_2, w_2, rho_2, rt_2, pi_2, uz2,
                                       dwdx2, Fz2)
        velx_f = self.solve_M1k(self.apply_M1k(velx) - 0.5 * dt * (Fu0 + Fu2))
        dFh2 = 0.5 * (Fp0 + Fp2)
        dGh2 = 0.5 * (Ft0 + Ft2)
        w_f, rho_f, rt_f, pi_f = self.vert_solve(
            w, rho, rt, exner, lambda rho_j: (dFh2, dGh2, None), uuz)

        d = self.ops.dtype
        return (velx_f.astype(d), w_f.astype(d), rho_f.astype(d),
                rt_f.astype(d), pi_f.astype(d))

    def step_trap(self, state):
        """state = (velx, w, rho, rt, exner); trapezoidal HEVI step."""
        if not hasattr(self, '_step_trap'):
            self._step_trap = jax.jit(self._step_trap_impl)
        return self._step_trap(*state)

    # ================================================================ entropy-conserving step
    def _step_ec_impl(self, velx, w, rho, rt, exner, velx_prev, uz_prev, first):
        """Strang_ec HEVI step (Euler::Strang_ec, eul/Euler_2.cpp:1366-1557):
        EC horizontal predictor (leapfrog 2dt) -> entropy-variable vertical
        Newton (solve_schur_eta) -> EC horizontal corrector at half states.
        Carries uz_prev (the rho-weighted shear of the previous corrector,
        :1410-1414) for the two-state vorticity cross terms."""
        vo, dt = self.vo, self.dt
        theta_l2_i = vo.diag_theta_l2(rho, rt)
        VAinv = vo.VA_inv_blocks()

        # --- 1. explicit horizontal predictor (all at state 0)
        uz0, dwdx1 = self.shear_grad_pot(velx, w, rho)
        uz_prev = jnp.where(first, uz0, uz_prev)
        Fz1 = vo.diagnose_Fz(w, w, rho, rho, VAinv)
        fu0, _ = self.momentum_rhs_ec(theta_l2_i, uz0, uz0, w, w, exner,
                                      velx, velx, rho, rho, Fz1, dwdx1, dwdx1)
        if self.hs_forcing:
            fu0 = fu0 + self.hs_friction(velx, exner)
        bu = jnp.where(first,
                       self.apply_M1k(velx) - dt * fu0,
                       self.apply_M1k(velx_prev) - 2.0 * dt * fu0)
        velx_1 = self.solve_M1k(bu, x0=velx)

        # --- 2. implicit entropy-variable vertical solve
        def dFx_fn(rho_j, theta_l2_h, ws):
            dF, dG, _, ws = self._advection_rhs_ec_ws(velx, velx_1, rho,
                                                      rho_j, theta_l2_h, ws)
            return dF, dG, ws
        rt_forcing = None
        if self.hs_forcing:
            def rt_forcing(rho_h, rt_h, pi_h):
                th = vo.diag_theta(rho_h, rt_h)
                return self.hs_temp_forcing(rho_h, rt_h, pi_h, th)
        w_j, rho_j, rt_j, pi_j, theta_l2_h, aux = self.vert_solve_eta(
            w, rho, rt, exner, theta_l2_i, dFx_fn, rt_forcing_fn=rt_forcing)

        # --- 3. explicit horizontal corrector (dt, half states)
        pi_h = 0.5 * (exner + pi_j)
        if self.corr_centering == "h":
            w_c, rho_c = 0.5 * (w + w_j), 0.5 * (rho + rho_j)
        else:
            w_c, rho_c = w_j, rho_j
        uz_new, dwdx2 = self.shear_grad_pot(velx_1, w_c, rho_c)
        Fz = vo.diagnose_Fz(w, w_c, rho, rho_c, VAinv)
        fu, k2i_parts = self.momentum_rhs_ec(theta_l2_h, uz_new, uz_prev,
                                             w_c, w, pi_h, velx, velx_1,
                                             rho, rho_c, Fz, dwdx1, dwdx2)
        if self.hs_forcing:
            fu = fu + self.hs_friction(0.5 * (velx + velx_1), pi_h)
        velx_2 = self.solve_M1k(self.apply_M1k(velx) - dt * fu, x0=velx_1)

        d = self.ops.dtype
        state = (velx_2.astype(d), w_j.astype(d), rho_j.astype(d),
                 rt_j.astype(d), pi_j.astype(d), velx.astype(d),
                 uz_new.astype(d))
        aux = dict(aux, k2i=jnp.sum(k2i_parts[:3]), k2i_parts=k2i_parts[:3],
                   visc_p=k2i_parts[3])
        return state, aux

    def init_state_ec(self, velx, w, rho, rt, exner):
        """Extended state tuple for step_ec."""
        return (velx, w, rho, rt, exner, velx, jnp.zeros_like(velx[:-1]))

    def step_ec(self, state, first=False):
        """state = (velx, w, rho, rt, exner, velx_prev, uz_prev);
        returns (state, aux) with aux = exchange powers (k2i, k2i_z),
        measured dissipation powers (visc_p, ray_p: the KE sinks that
        close the TOTAL energy budget, dE_tot ~= -dt*(visc_p + ray_p)),
        and Newton norms."""
        if not hasattr(self, '_step_ec'):
            self._step_ec = jax.jit(self._step_ec_impl)
        return self._step_ec(*state, jnp.asarray(first))

    def run_steps_ec(self, state, nsteps: int):
        """nsteps EC steps in ONE lax.scan dispatch (first=False steps).

        Per-step python dispatch costs ~0.5 s over a tunneled TPU and is
        host-CPU sensitive; long production runs should advance in scanned
        chunks between dumps.  Returns (state, aux) where aux carries the
        dt-integrated exchange powers over the chunk (`exch_int`, the budget
        diagnostic) and the LAST step's Newton norms."""
        def body(st, _):
            st, aux = self._step_ec_impl(*st, jnp.asarray(False))
            return st, (aux["k2i"], aux["k2i_z"], aux["visc_p"],
                        aux["ray_p"], aux["newton_norms"])
        state, (k2i, k2iz, visc, ray, norms) = jax.lax.scan(
            body, state, None, length=nsteps)
        # diss_int is the dt-integrated KE LOSS to the measured dissipation
        # channels over the chunk; with exch_int it closes the total-energy
        # budget: dE_tot ~= -diss_int + O(dt^2) time-truncation (the
        # exchange powers cancel between KE and IE by construction).
        return state, dict(exch_int=self.dt * jnp.sum(k2i + k2iz),
                           diss_int=self.dt * jnp.sum(visc + ray),
                           k2i_mean=jnp.mean(k2i), k2i_z_mean=jnp.mean(k2iz),
                           visc_p_mean=jnp.mean(visc), ray_p_mean=jnp.mean(ray),
                           newton_norms=norms[-1])

    # ================================================================ 12-term energetics
    def energetics_ec(self, velx, w, rho, rt, exner, k2i=0.0, k2i_z=0.0):
        """Full reference energy budget (Euler::diagnostics,
        eul/Euler_2.cpp:600-744): keh, kev, pe, ie, k2p, p2k, k2i, i2k,
        k2i_z, i2k_z, mass, entr.  i2k and i2k_z are written as zero exactly
        as the reference does (:694-697); k2i/k2i_z are the exchange powers
        accumulated by the last step (momentum_rhs_ec / assemble_residual_ec).

        DEVIATION from the reference's k2i column: eul/HorizSolve.cpp:704-708
        dots F with only the E12 M2h(Pi) theta pressure piece, which is
        near-orthogonal to F and under-reports the horizontal K->I power by
        ~7 orders; here k2i sums ALL THREE EC pressure-splitting term powers
        so that dIE = dt*(k2i + k2i_z) closes in f64 (verified by
        tests/test_euler3d.py::test_ec_budget_closure_f64).  A reference-
        comparable single-term value is k2i_parts[2] from momentum_rhs_ec.

        When x64 is enabled the integrals are evaluated in f64 regardless of
        the model dtype: at production sizes the f32 dot noise (~sqrt(N) eps
        |IE| ~ 5e19 for IE ~ 9e23) exceeds the per-dump dIE signal, making
        budget closure unmeasurable in working precision."""
        ops, vo = self.ops, self.vo
        if jax.config.jax_enable_x64:
            f8 = jnp.float64
            velx, w, rho = velx.astype(f8), w.astype(f8), rho.astype(f8)
            rt, exner = rt.astype(f8), exner.astype(f8)
        rhop = vo.phys_layer(rho)
        keh = 0.5 * jnp.sum(jax.vmap(ops.dot1)(self.apply_M1hk(velx, rhop),
                                               velx))
        kev = 0.5 * jnp.vdot(rho, vo.vba_w(w, w))
        pe = jnp.vdot(self.zv, rho)
        ie = (CV / CP) * jnp.vdot(rt, vo.apply_w(vo.chi_VB(), exner))
        VAinv = vo.VA_inv_blocks()
        Fz1 = jnp.einsum('lnij,lnj->lni', VAinv,
                         vo.apply_w(vo.chi_VA_rho(rho), w))
        gv = vo.v01(self.zv)
        k2p = jnp.vdot(Fz1, gv)
        p2k = jnp.vdot(vo.v10(Fz1), self.zv)
        mass = jnp.sum(vo.interp(rho) * vo.Wq)
        entr = 0.5 * jnp.vdot(vo.apply_w(vo.chi_VB(), rt),
                              vo.diag_theta_l2(rho, rt))
        return dict(keh=keh, kev=kev, pe=pe, ie=ie, k2p=k2p, p2k=p2k,
                    k2i=k2i, i2k=0.0, k2i_z=k2i_z, i2k_z=0.0,
                    mass=mass, entr=entr)

    def mass_total(self, rho):
        """Global mass integral (the energetics `mass` column,
        eul/Euler_2.cpp:600-744).  Exactly conserved per HEVI step to
        roundoff regardless of Newton convergence -- the rho update is a
        discrete flux divergence, so <1, d_rho>_V telescopes to zero --
        which makes it a cheap single-build correctness oracle for the
        sharded production step (parallel/dryrun.py stage 4): any broken
        DSS scatter or psum in the horizontal flux path destroys it."""
        vo = self.vo
        if jax.config.jax_enable_x64:
            rho = rho.astype(jnp.float64)
        return jnp.sum(vo.interp(rho) * vo.Wq)

    # ================================================================ energetics
    def energetics(self, velx, w, rho, rt, exner):
        """Energy budget (diagnostics, box/Euler_2.cpp:887-1026): horizontal
        and vertical KE, potential, internal energies, mass, entropy."""
        ops, vo = self.ops, self.vo
        dV = ops.W[None] * vo.det[None] * vo.thickq       # (nk, nel, nq)
        rhop = vo.phys_layer(rho)
        rtp = vo.phys_layer(rt)
        pip = vo.phys_layer(exner)
        up = jax.vmap(ops.interp1_phys)(velx) * self.tiq[..., None]
        k_h = jnp.sum(dV * 0.5 * rhop * jnp.sum(up ** 2, axis=-1))
        wq = vo.phys_int(w)
        z = jnp.zeros_like(wq[:1])
        wp = jnp.concatenate([z, wq, z], 0)
        wbar = 0.5 * (wp[:-1] + wp[1:])
        k_v = jnp.sum(dV * 0.5 * rhop * wbar ** 2)
        zbar = 0.5 * (vo.levs[:-1] + vo.levs[1:])
        pe = jnp.sum(dV * rhop * GRAVITY * zbar)
        ie = jnp.sum(dV * (CV / CP) * rtp * pip)
        mass = jnp.sum(dV * rhop)
        entr = jnp.sum(dV * 0.5 * rtp * (rtp / jnp.maximum(rhop, 1e-12)))
        return dict(k_h=k_h, k_v=k_v, pe=pe, ie=ie, mass=mass, entr=entr)

    # ================================================================ init
    def project_layers(self, f):
        """Project f(x_horiz, z_mid) to layer 2-form coefficients.
        f: callable (x (nel, nq, 3), z (nel, nq)) -> (nel, nq) physical."""
        vo = self.vo
        zmid = 0.5 * (vo.levs[:-1] + vo.levs[1:])
        vals = jax.vmap(lambda zk: f(self.ops.x, zk))(zmid)
        return vo._project_layer(vals).astype(vo.dtype)

    def project_velx(self, fu, fv):
        """Volume-weighted projection of horizontal velocity (fu/fv of (x, z))
        onto FLUX-FORM coefficients: M1k(1/thick) u = <v, u_analytic>_V, whose
        right side is the plain area functional rhs_P1 (the thickness of the
        measure cancels the test's 1/thick); iu/thick then L2-approximates
        the analytic wind in the volume metric."""
        ops, vo = self.ops, self.vo
        zmid = 0.5 * (vo.levs[:-1] + vo.levs[1:])
        def one(zk):
            fq = jnp.stack([fu(ops.x, zk), fv(ops.x, zk)], axis=-1)
            return ops.rhs_P1(fq)
        b = jax.vmap(one)(zmid)
        # the analytic IC closures may evaluate in f64 (host numpy constants
        # under x64); the state must come out in the model dtype
        return self.solve_M1k(b.astype(ops.dtype)).astype(ops.dtype)
