"""Matrix-free mimetic operators, element-batched for the MXU.

The reference assembles global sparse PETSc matrices from per-element dense
triple products B^T Q(J, fields) B (src/Assembly.cpp).  Here every operator is
applied matrix-free in three steps that map directly onto TPU hardware:

  gather  : global DOF vector -> element-local views  [nel, nloc]   (index gather)
  compute : two large matmuls through the shared reference basis tables
            [nel, nloc] @ [nloc, nq] -> pointwise metric/field weights ->
            [nel, nq] @ [nq, nloc]                                   (MXU)
  scatter : signed scatter-add back to the global vector             (segment sum)

All metric data lives in precomputed per-quad-point tensors (geometry.py), so
the only per-element data are diagonal weights -- the basis matmuls are shared
across all elements and become single large GEMMs with nel as the M dimension.

Incidence operators (E10/E21 and adjoints) are pure index arithmetic with +-1
signs (src/Assembly.cpp:1415-1533) -- no metric, which is what makes the scheme
exactly conservative.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..basis import Basis
from ..mesh.geometry import Geometry
from ..mesh.topology import Topology


def _inverse_table(dst: np.ndarray, n_dst: int) -> np.ndarray:
    """Invert a scatter map: table[d, k] lists the flat source positions that
    accumulate into destination d, padded with len(dst) (a zero slot).

    Turns scatter-adds into gather+sum -- TPU scatters serialize, gathers don't.
    """
    dst = dst.ravel()
    order = np.argsort(dst, kind='stable')
    sorted_dst = dst[order]
    counts = np.bincount(dst, minlength=n_dst)
    m = int(counts.max())
    starts = np.zeros(n_dst + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    table = np.full((n_dst, m), len(dst), dtype=np.int64)
    rank = np.arange(len(dst)) - starts[sorted_dst]
    table[sorted_dst, rank] = order
    return table


class SpaceOps:
    """Bundles topology/basis/geometry arrays and exposes matrix-free operators.

    All heavy arrays are jnp device arrays; methods are traceable under jit.
    """

    def __init__(self, topo: Topology, basis: Basis, geom: Geometry,
                 dtype=jnp.float64, el_sharding=None, el_perm=None):
        self.topo = topo
        self.basis = basis
        self.geom = geom  # host-side numpy metrics (for setup-time PC assembly)
        self.p = topo.p
        self.nel = topo.nel
        self.n0, self.n1, self.n2 = topo.n0, topo.n1, topo.n2
        self.n1loc = topo.n1loc
        self.el_sharding = el_sharding
        # tile-major element permutation (new_el -> old_el) for 2-D device
        # meshes: structural (row-major) construction logic is unchanged; the
        # element-leading arrays and flat-index tables are reordered ONCE here
        # so each device owns a contiguous (row-block x col-block) tile.
        # Global 0/1-form DOF IDs come from the geometric merge and are
        # order-free; 2-form "IDs" are positional (element-major), so the
        # e21 incidence rows are re-ordered along with the elements.
        self.el_perm = el_perm
        self.el_perm_inv = None if el_perm is None else np.argsort(el_perm)
        pm = (lambda a: a) if el_perm is None else (lambda a: a[el_perm])

        def put(a):
            """Place an element-dim-leading array, sharded across chips if requested."""
            return a if el_sharding is None else jax.device_put(a, el_sharding)

        f = lambda a: jnp.asarray(a, dtype=dtype)         # replicated
        fe = lambda a: put(jnp.asarray(pm(a), dtype=dtype))   # element-sharded
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        ie = lambda a: put(jnp.asarray(pm(a), dtype=jnp.int32))
        self.dtype = dtype

        # permuted HOST views: every flat-local table below must be built
        # from these so device arrays and index tables agree on element order
        # (LocalOps builds its multiplicity weights / partner tables from the
        # same views)
        e2d0_h, e2d1_h, sgn1_h = pm(topo.e2d0), pm(topo.e2d1), pm(topo.sgn1)
        self.e2d0_h, self.e2d1_h, self.sgn1_h = e2d0_h, e2d1_h, sgn1_h
        pp = topo.p * topo.p
        e21_idx_h = pm(topo.e21_idx.reshape(self.nel, pp, 4)).reshape(-1, 4)
        e21_sgn_h = pm(topo.e21_sgn.reshape(self.nel, pp, 4)).reshape(-1, 4)

        self.e2d0 = put(jnp.asarray(e2d0_h, jnp.int32))
        self.e2d1 = put(jnp.asarray(e2d1_h, jnp.int32))
        self.sgn1 = put(jnp.asarray(sgn1_h, dtype))
        self.e10_plus = i(topo.e10_plus)
        self.e10_minus = i(topo.e10_minus)
        self.e21_idx = i(e21_idx_h)
        self.e21_sgn = f(e21_sgn_h)

        self.B0 = f(basis.B0)    # (nq, n0loc)
        self.B1x = f(basis.B1x)  # (nq, n1loc)
        self.B1y = f(basis.B1y)
        self.B2 = f(basis.B2)    # (nq, n2loc)
        self.W = f(basis.W)      # (nq,)

        self.x = fe(geom.x)
        self.lonlat = fe(geom.lonlat)
        self.J = fe(geom.J)        # (nel, nq, 2, 2)
        self.det = fe(geom.det)    # (nel, nq)
        self.wdet = fe(geom.wdet)
        self.winvdet = fe(geom.winvdet)
        self.G1 = fe(geom.G1)      # (nel, nq, 2, 2)

        # ---- precomputed solve helpers ----
        # Dense block inverses are computed host-side in float64 numpy: the TPU
        # compiler has no f64 LU, and these are one-off setup costs anyway.
        npB2, npW = basis.B2, geom.winvdet
        M2blk = np.einsum('qi,eq,qj->eij', npB2, npW, npB2)
        self.M2blk = fe(M2blk)
        self.M2inv = fe(np.linalg.inv(M2blk))
        # 0-form: with colocated quadrature (q == p) B0 == I and M0 is diagonal
        self.m0_diag_exact = bool(basis.q == basis.p)
        # 1-form block-Jacobi (additive Schwarz) preconditioner blocks
        M1blk = self._m1_blocks_np(geom.G1, basis)
        self.M1blkinv = fe(np.linalg.inv(M1blk))

        # ---- scatter-free assembly tables (gather+sum instead of scatter-add) ----
        self.t_asm0 = i(_inverse_table(e2d0_h, self.n0))           # (n0, m)
        self.t_asm1 = i(_inverse_table(e2d1_h, self.n1))           # (n1, 2)
        # adjoint incidence: invert the E10/E21 row->col maps
        e01_dst = np.concatenate([topo.e10_plus, topo.e10_minus])
        self.t_e01 = i(_inverse_table(e01_dst, self.n0))           # (n0, m)
        self.t_e12 = i(_inverse_table(e21_idx_h, self.n1))         # (n1, 2)

    def device_order(self, a):
        """Apply the tile-major element permutation to a host-built array in
        structural element order -- either element-leading (nel, ...) or a
        flat local-form array [..., nel*K] -- so it matches the device
        layout.  Identity when no permutation is active."""
        if self.el_perm is None:
            return a
        a = jnp.asarray(a)
        if a.ndim and a.shape[0] == self.nel:
            return a[self.el_perm]
        if a.ndim >= 2 and a.shape[-2] == self.nel:   # (..., nel, K) layout
            return a[..., self.el_perm, :]
        K = a.shape[-1] // self.nel
        v = a.reshape(*a.shape[:-1], self.nel, K)
        return v[..., self.el_perm, :].reshape(a.shape)

    def struct_order(self, vl):
        """Undo the tile-major element permutation of a flat local-form array
        (any per-element slot width), returning structural element-major
        order for host-side I/O / cross-layout comparison.  Identity when no
        permutation is active."""
        if self.el_perm_inv is None:
            return vl
        if vl.ndim >= 2 and vl.shape[-2] == self.nel:  # (..., nel, K) layout
            return vl[..., self.el_perm_inv, :]
        K = vl.shape[-1] // self.nel
        v = vl.reshape(*vl.shape[:-1], self.nel, K)
        return v[..., self.el_perm_inv, :].reshape(vl.shape)

    def dtype_np(self):
        import numpy as _np
        return _np.float32 if self.dtype == jnp.float32 else _np.float64

    # default (global-vector) inner products; LocalOps overrides with
    # multiplicity-weighted versions
    def dot0(self, a, b):
        return jnp.vdot(a, b)

    dot1 = dot0
    dot2 = dot0
    wdot1 = None   # diagonal weight for gmres on 1-forms (LocalOps sets it)

    # ------------------------------------------------------------------ gather/scatter
    def gather0(self, u0):
        return u0[self.e2d0]

    def scatter0(self, vl):
        src = jnp.concatenate([vl.ravel(), jnp.zeros(1, self.dtype)])
        return jnp.sum(src[self.t_asm0], axis=1)

    def gather1(self, u1):
        return self.sgn1 * u1[self.e2d1]

    def scatter1(self, vl):
        src = jnp.concatenate([(self.sgn1 * vl).ravel(), jnp.zeros(1, self.dtype)])
        return jnp.sum(src[self.t_asm1], axis=1)

    def gather2(self, u2):
        return u2.reshape(self.nel, self.p * self.p)

    def scatter2(self, vl):
        return vl.reshape(self.n2)

    # ------------------------------------------------------------------ interpolation
    def interp0(self, u0):
        """0-form values at quadrature points: (nel, nq)."""
        return self.gather0(u0) @ self.B0.T

    def interp1_ref(self, u1):
        """1-form reference components at quad points: two (nel, nq) arrays."""
        vl = self.gather1(u1)
        vx, vy = vl[:, :self.n1loc], vl[:, self.n1loc:]
        return vx @ self.B1x.T, vy @ self.B1y.T

    def interp1_phys(self, u1):
        """Piola-mapped physical vector at quad points: (nel, nq, 2).

        u_phys = J u_ref / det (src/Geom.cpp:302-313).
        """
        qx, qy = self.interp1_ref(u1)
        J, det = self.J, self.det
        ux = (J[..., 0, 0] * qx + J[..., 0, 1] * qy) / det
        uy = (J[..., 1, 0] * qx + J[..., 1, 1] * qy) / det
        return jnp.stack([ux, uy], axis=-1)

    def interp2_ref(self, u2):
        return self.gather2(u2) @ self.B2.T

    def interp2_phys(self, u2):
        """2-form physical values at quad points: u/det (src/Geom.cpp:315-324)."""
        return self.interp2_ref(u2) / self.det

    # ------------------------------------------------------------------ mass operators
    def apply_M0(self, u0, weight_q=None):
        """0-form mass; weight_q (nel, nq) multiplies the physical measure."""
        q = self.interp0(u0) * self.wdet
        if weight_q is not None:
            q = q * weight_q
        return self.scatter0(q @ self.B0)

    def apply_M2(self, u2, weight_q=None):
        q = self.interp2_ref(u2) * self.winvdet
        if weight_q is not None:
            q = q * weight_q
        return self.scatter2(q @ self.B2)

    def _apply_G(self, vl, G):
        """Core 1-form metric application on local views."""
        vx, vy = vl[:, :self.n1loc], vl[:, self.n1loc:]
        qx = vx @ self.B1x.T
        qy = vy @ self.B1y.T
        rx = G[..., 0, 0] * qx + G[..., 0, 1] * qy
        ry = G[..., 1, 0] * qx + G[..., 1, 1] * qy
        return jnp.concatenate([rx @ self.B1x, ry @ self.B1y], axis=1)

    @staticmethod
    def _m1_blocks_np(G, basis):
        """Dense per-element 1-form mass blocks (host-side numpy, setup only)."""
        Bx, By = basis.B1x, basis.B1y
        Axx = np.einsum('qi,eq,qj->eij', Bx, G[..., 0, 0], Bx)
        Axy = np.einsum('qi,eq,qj->eij', Bx, G[..., 0, 1], By)
        Ayx = np.einsum('qi,eq,qj->eij', By, G[..., 1, 0], Bx)
        Ayy = np.einsum('qi,eq,qj->eij', By, G[..., 1, 1], By)
        top = np.concatenate([Axx, Axy], axis=2)
        bot = np.concatenate([Ayx, Ayy], axis=2)
        return np.concatenate([top, bot], axis=1)

    def apply_M1_local(self, u1, h2=None, weight_q=None):
        """Pre-assembly local contributions of apply_M1, (nel, 2*n1loc).

        The DSS/scatter is LINEAR: consumers that sum several operator
        outputs should sum the local contributions and scatter ONCE -- on
        TPU each scatter costs ~30 small kernels, and fusing them was the
        single largest step-time win (see SWEqn._A_u)."""
        G = self.G1
        if h2 is not None:
            G = G * self.interp2_phys(h2)[..., None, None]
        if weight_q is not None:
            G = G * weight_q[..., None, None]
        return self._apply_G(self.gather1(u1), G)

    def apply_M1(self, u1, h2=None, weight_q=None):
        """1-form mass (Umat); with h2 (a 2-form) or weight_q (physical values
        at quad points, (nel, nq)) the field-weighted Uhmat
        (src/Assembly.cpp:30-124, 675-734): G = w J^T J h_phys / det."""
        return self.scatter1(self.apply_M1_local(u1, h2, weight_q))

    def apply_R_local(self, q0, u1):
        """Pre-assembly local contributions of apply_R, (nel, 2*n1loc)."""
        wq = self.interp0(q0) * self.W
        qx, qy = self.interp1_ref(u1)
        return jnp.concatenate([(-wq * qy) @ self.B1x,
                                (+wq * qx) @ self.B1y], axis=1)

    def apply_R(self, q0, u1):
        """Rotational (potential-vorticity cross-product) operator RotMat
        (src/Assembly.cpp:1346-1395): metric-free q x ( ) in reference coords."""
        return self.scatter1(self.apply_R_local(q0, u1))

    def apply_R_apvm(self, q0, u_adv, dq1, tau, v1, q_prev=None, dt=None):
        """Anticipated-potential-vorticity rotational operator applied to v1:
        PV corrected by q* = q - tau (u_adv x grad q) before the cross product
        (RotMat_up::assemble_supg, src/Assembly.cpp:1854-1926; used by the
        Rosenbrock SW solver).  With q_prev/dt the FULL SUPG correction
        including the reference's time-derivative term (:1903):
            q* = q - tau (u_adv x grad q + (q - q_prev)/dt)."""
        up = self.interp1_phys(u_adv)
        dqp = self.interp1_phys(dq1)
        corr = up[..., 0] * dqp[..., 1] - up[..., 1] * dqp[..., 0]
        if q_prev is not None:
            corr = corr + (self.interp0(q0) - self.interp0(q_prev)) / dt
        wq = (self.interp0(q0) - tau * corr) * self.W
        qx, qy = self.interp1_ref(v1)
        rx = -wq * qy
        ry = +wq * qx
        return self.scatter1(jnp.concatenate([rx @ self.B1x, ry @ self.B1y], axis=1))

    def m1_up(self, u1, tau):
        """Departure-point 1-form TEST tensors (B1x_up, B1y_up), each
        (nel, nq, n1loc): the NODAL factor of each family evaluated at the
        characteristics-displaced quadrature point x_q + tau*u_ref, the edge
        factor kept centred, exactly the reference's choice
        (Umat::assemble_up, src/Assembly.cpp:174-188 -- the edge-factor
        shift there is commented out).  Note p0_up's displacement is
        x_q - tau*u_ref; pass tau with the sign the scheme needs."""
        from ..basis import lagrange_eval
        ul = self.ref_velocity(u1)                     # (nel, nq, 2)
        b = self.basis
        q1 = b.q + 1
        qx = jnp.asarray(np.tile(b.qpts, q1), self.dtype)
        qy = jnp.asarray(np.repeat(b.qpts, q1), self.dtype)
        nodes = np.asarray(b.nodes, self.dtype_np())
        lx = lagrange_eval(nodes, qx[None, :] + tau * ul[..., 0])  # (nel,nq,p+1)
        ly = lagrange_eval(nodes, qy[None, :] + tau * ul[..., 1])
        ex = np.asarray(b.e_at_q, self.dtype_np())     # (q+1, p)
        p, np1 = self.p, self.p + 1
        # x-family cols ix_node + (p+1)*jy_edge: l_i(x) e_j(y)
        ix = np.arange(self.n1loc) % np1
        jy = np.arange(self.n1loc) // np1
        ey_q = ex[np.repeat(np.arange(q1), q1)]        # (nq, p) edge in y
        B1x_up = lx[..., ix] * jnp.asarray(ey_q[:, jy])
        # y-family cols ix_edge + p*jy_node: e_i(x) l_j(y)
        ixe = np.arange(self.n1loc) % p
        jyn = np.arange(self.n1loc) // p
        ex_q = ex[np.tile(np.arange(q1), q1)]          # (nq, p) edge in x
        B1y_up = jnp.asarray(ex_q[:, ixe]) * ly[..., jyn]
        return B1x_up, B1y_up

    def apply_M1h_up(self, v1, B1x_up, B1y_up, h2=None, weight_q=None):
        """Upwinded-TEST-function (field-weighted) 1-form mass action
        (Umat::assemble_up / Uhmat::assemble_up, src/Assembly.cpp:127-245,
        736-861): trial side = centred B1 interpolation + metric
        G = w J^T J [h]/det, test side = the m1_up departure-point tensors.
        Nonsymmetric; reduces to apply_M1(h) exactly at tau = 0."""
        G = self.G1
        if h2 is not None:
            G = G * self.interp2_phys(h2)[..., None, None]
        if weight_q is not None:
            G = G * weight_q[..., None, None]
        vl = self.gather1(v1)
        qx = vl[:, :self.n1loc] @ self.B1x.T
        qy = vl[:, self.n1loc:] @ self.B1y.T
        rx = G[..., 0, 0] * qx + G[..., 0, 1] * qy
        ry = G[..., 1, 0] * qx + G[..., 1, 1] * qy
        lx = jnp.einsum('eq,eqj->ej', rx, B1x_up)
        ly = jnp.einsum('eq,eqj->ej', ry, B1y_up)
        return self.scatter1(jnp.concatenate([lx, ly], axis=1))

    def apply_K(self, uK, v1):
        """Kinetic-energy operator WtQUmat (src/Assembly.cpp:1146-1218):
        projects (1/2) u_phys . v_phys onto 2-forms."""
        up = self.interp1_phys(uK)
        vp = self.interp1_phys(v1)
        kq = 0.5 * self.W * jnp.sum(up * vp, axis=-1)
        return self.scatter2(kq @ self.B2)

    def apply_K_T(self, uK, h2):
        """Transpose of the kinetic-energy operator: WtQUmat^T h
        (used by the thermal-SW momentum equation, src/ThermalSW_EEC_2.cpp:1082):
        projects (1/2) h_phys u_phys onto 1-form test functions."""
        up = self.interp1_phys(uK)
        hq = 0.5 * self.W * self.interp2_ref(h2) / self.det
        fx = hq * (self.J[..., 0, 0] * up[..., 0] + self.J[..., 1, 0] * up[..., 1])
        fy = hq * (self.J[..., 0, 1] * up[..., 0] + self.J[..., 1, 1] * up[..., 1])
        return self.scatter1(jnp.concatenate([fx @ self.B1x, fy @ self.B1y], axis=1))

    def apply_M2h(self, u2, h2):
        """2-form mass weighted by interpolated h (Whmat, src/Assembly.cpp:1541+)."""
        return self.apply_M2(u2, weight_q=self.interp2_phys(h2))

    def solve_M1h(self, b1, h2, tol=1e-13, maxiter=200):
        """Field-weighted 1-form mass solve (Uhmat system)."""
        from . import solvers
        mv = lambda u: self.apply_M1(u, h2)
        return solvers.cg(mv, b1, pc=self.pc_M1, tol=tol, maxiter=maxiter,
                          dot=self.dot1)

    # ------------------------------------------------------------------ projections (ICs)
    def rhs_P0(self, f_q):
        """PtQmat action: quadrature values -> 0-form rhs (src/Assembly.cpp:994-1036)."""
        return self.scatter0((f_q * self.wdet) @ self.B0)

    def rhs_P1_local(self, f_q):
        """Pre-assembly local contributions of rhs_P1, (nel, 2*n1loc)."""
        fx = self.W * (self.J[..., 0, 0] * f_q[..., 0] + self.J[..., 1, 0] * f_q[..., 1])
        fy = self.W * (self.J[..., 0, 1] * f_q[..., 0] + self.J[..., 1, 1] * f_q[..., 1])
        return jnp.concatenate([fx @ self.B1x, fy @ self.B1y], axis=1)

    def rhs_P1(self, f_q):
        """UtQmat action: physical vector at quads (nel, nq, 2) -> 1-form rhs
        (src/Assembly.cpp:1052-1139): B^T (w J^T f)."""
        return self.scatter1(self.rhs_P1_local(f_q))

    def rhs_P2(self, f_q):
        """WtQmat action: physical values at quads -> 2-form rhs (src/Assembly.cpp:934-979)."""
        return self.scatter2((f_q * self.W) @ self.B2)

    def proj0(self, f):
        """Project f(lon, lat) onto 0-forms (init0, src/SWEqn_Picard.cpp:842-878)."""
        fq = f(self.lonlat[..., 0], self.lonlat[..., 1])
        return self.solve_M0(self.rhs_P0(fq)).astype(self.dtype)

    def proj1(self, fu, fv, tol=1e-14):
        """Project physical vector field (zonal, meridional components as
        functions of lon/lat) onto 1-forms (init1, src/SWEqn_Picard.cpp:880-932)."""
        fq = jnp.stack([fu(self.lonlat[..., 0], self.lonlat[..., 1]),
                        fv(self.lonlat[..., 0], self.lonlat[..., 1])], axis=-1)
        return self.solve_M1(self.rhs_P1(fq.astype(self.dtype)),
                             tol=tol).astype(self.dtype)

    def proj2(self, f):
        """Project f(lon, lat) onto 2-forms (init2, src/SWEqn_Picard.cpp:934-979)."""
        fq = f(self.lonlat[..., 0], self.lonlat[..., 1])
        return self.solve_M2(self.rhs_P2(fq.astype(self.dtype))).astype(self.dtype)

    # ------------------------------------------------------------------ incidence
    def e10(self, psi):
        """Rotated gradient 0-form -> 1-form (E10mat, src/Assembly.cpp:1415-1475)."""
        return psi[self.e10_plus] - psi[self.e10_minus]

    def e01(self, w1):
        """-E10^T: 1-form -> 0-form (weak curl building block)."""
        src = jnp.concatenate([-w1, +w1, jnp.zeros(1, self.dtype)])
        return jnp.sum(src[self.t_e01], axis=1)

    def e21(self, u1):
        """Divergence 1-form -> 2-form (E21mat, src/Assembly.cpp:1483-1533)."""
        return jnp.sum(self.e21_sgn * u1[self.e21_idx], axis=1)

    def e12(self, h2):
        """-E21^T: 2-form -> 1-form (weak gradient building block)."""
        src = jnp.concatenate([(-self.e21_sgn * h2[:, None]).ravel(),
                               jnp.zeros(1, self.dtype)])
        return jnp.sum(src[self.t_e12], axis=1)

    def e12_local(self, h2):
        """Pre-assembly local contributions of e12, (nel, 2*n1loc): the
        per-element adjoint divergence stencil (sum with other local
        contributions, then scatter1 once)."""
        p, np1 = self.p, self.p + 1
        nel = self.nel
        h = self.gather2(h2).reshape(nel, p, p)
        gx = jnp.zeros((nel, p, np1), self.dtype)
        gx = gx.at[:, :, 1:].add(-h).at[:, :, :-1].add(+h)
        gy = jnp.zeros((nel, np1, p), self.dtype)
        gy = gy.at[:, 1:, :].add(-h).at[:, :-1, :].add(+h)
        return jnp.concatenate([gx.reshape(nel, -1),
                                gy.reshape(nel, -1)], axis=1)

    # ------------------------------------------------------------------ upwinded (departure-point) operators
    def ref_velocity(self, u1):
        """Reference-coordinate velocity J^{-1} u_phys at quad points (nel, nq, 2)
        (the departure-point speed, src/Assembly.cpp:530-532)."""
        up = self.interp1_phys(u1)
        J, det = self.J, self.det
        vx = (+J[..., 1, 1] * up[..., 0] - J[..., 0, 1] * up[..., 1]) / det
        vy = (-J[..., 1, 0] * up[..., 0] + J[..., 0, 0] * up[..., 1]) / det
        return jnp.stack([vx, vy], axis=-1)

    def p0_up(self, u1, tau):
        """Departure-point 0-form evaluation tensor (nel, nq, n0loc):
        nodal basis evaluated at (x_q - tau * u_ref) (src/Assembly.cpp:539-547)."""
        from ..basis import lagrange_eval
        ul = self.ref_velocity(u1)
        q1 = self.basis.q + 1
        qx = jnp.asarray(np.tile(self.basis.qpts, q1), self.dtype)
        qy = jnp.asarray(np.repeat(self.basis.qpts, q1), self.dtype)
        X = qx[None, :] - tau * ul[..., 0]
        Y = qy[None, :] - tau * ul[..., 1]
        nodes = np.asarray(self.basis.nodes, self.dtype_np())
        lx = lagrange_eval(nodes, X)   # (nel, nq, p+1)
        ly = lagrange_eval(nodes, Y)
        np1 = self.p + 1
        jjx = np.arange(np1 * np1) % np1
        jjy = np.arange(np1 * np1) // np1
        return lx[..., jjx] * ly[..., jjy]

    def interp0_up(self, q0, P_up):
        """0-form values at departure points given the P_up tensor."""
        return jnp.einsum('eqj,ej->eq', P_up, self.gather0(q0))

    def apply_M0h_up(self, v0, hq, P_up):
        """Upwinded-test-function weighted 0-form mass (Phmat::assemble_up,
        src/Assembly.cpp:499-567): P_up^T diag(w h_loc) P.  Nonsymmetric.
        hq = physical depth at quad points; dets re-enter via hq*det
        (src/Assembly.cpp:543-545)."""
        vq = self.interp0(v0) * self.W * (hq * self.det)
        return self.scatter0(jnp.einsum('eq,eqj->ej', vq, P_up))

    def solve_M0h_up(self, b0, hq, P_up, tol=1e-13, niter=10):
        """Solve the nonsymmetric upwinded PV mass matrix system.

        The departure-point offsets are O(CFL) perturbations of the diagonal
        centred M0h, so diagonally-preconditioned Richardson converges
        geometrically (the reference uses GMRES+BJACOBI on the same system;
        here the fixed-depth iteration compiles to a tight TPU loop).

        Guard: `niter` fixed sweeps are sized for CFL <~ 0.5 (tau*dt*|u_ref|);
        a residual-checked continuation (up to 3*niter total) catches a driver
        pushing the departure offsets larger, where the fixed count would
        silently under-converge.  Costs one matvec + dot in the common case."""
        from . import solvers
        d = self.m0_lumped(hq)
        mv = lambda x: self.apply_M0h_up(x, hq, P_up)
        x = solvers.richardson(mv, b0, pc=lambda r: r / d, niter=niter)
        tol2 = tol * tol * jnp.maximum(self.dot0(b0, b0), 1e-300)

        def cond(state):
            x, k = state
            r = b0 - mv(x)
            return jnp.logical_and(k < 2 * niter, self.dot0(r, r) > tol2)

        def body(state):
            x, k = state
            return (x + (b0 - mv(x)) / d).astype(b0.dtype), k + 1

        x, _ = jax.lax.while_loop(cond, body, (x, 0))
        return x

    def apply_Rq_local(self, wq, u1):
        """Local cross-product contributions for a precomputed PV quadrature
        weight wq (nel, nq) -- lets callers combine several PV fields into
        one weight and share one DSS."""
        qx, qy = self.interp1_ref(u1)
        return jnp.concatenate([(-wq * qy) @ self.B1x,
                                (+wq * qx) @ self.B1y], axis=1)

    def apply_R_up(self, q0, u1, P_up):
        """Upwinded rotational operator RotMat_up (src/Assembly.cpp:1784-1853):
        PV interpolated at departure points, metric-free cross product."""
        wq = self.interp0_up(q0, P_up) * self.W
        return self.scatter1(self.apply_Rq_local(wq, u1))

    # ------------------------------------------------------------------ solves
    def solve_M2(self, b2, h2=None, tol=1e-14):
        """Exact 2-form mass solve: block-diagonal batched dense inverse.

        For the field-weighted case the precomputed unweighted inverse serves as
        a (block-exact) preconditioner for a short CG -- avoids runtime f64
        factorizations, which the TPU backend does not support.
        """
        bl = self.gather2(b2)
        x = self.scatter2(jnp.einsum('eij,ej->ei', self.M2inv, bl))
        if h2 is None:
            return x
        from . import solvers
        mv = lambda v: self.apply_M2(v, weight_q=self.interp2_phys(h2))
        pc = lambda r: self.scatter2(jnp.einsum('eij,ej->ei', self.M2inv,
                                                self.gather2(r)))
        return solvers.cg(mv, b2, pc=pc, x0=x, tol=tol, maxiter=50)

    def m0_lumped(self, weight_q=None):
        """Diagonal (lumped) 0-form mass vector (Pvec, src/Assembly.cpp:857-914)."""
        q = self.wdet if weight_q is None else self.wdet * weight_q
        return self.scatter0(jnp.broadcast_to(q, (self.nel, q.shape[-1]))
                             @ (self.B0 * self.B0))

    def solve_M0(self, b0, weight_q=None):
        """0-form mass solve.  Exact (diagonal) when quadrature is colocated."""
        if self.m0_diag_exact:
            return b0 / self.m0_lumped(weight_q)
        from . import solvers
        mv = lambda x: self.apply_M0(x, weight_q)
        d = self.m0_lumped(weight_q)
        return solvers.cg(mv, b0, pc=lambda r: r / d, tol=1e-14, maxiter=100)

    def pc_M1(self, r1):
        """Additive-Schwarz (per-element block) preconditioner for M1, the
        TPU-native analogue of the reference's PCBJACOBI with one block per
        element (src/SWEqn_Picard.cpp:92-93)."""
        vl = self.gather1(r1)
        return self.scatter1(jnp.einsum('eij,ej->ei', self.M1blkinv, vl))

    def solve_M1(self, b1, tol=1e-14, maxiter=200):
        from . import solvers
        return solvers.cg(self.apply_M1, b1, pc=self.pc_M1, tol=tol, maxiter=maxiter)
