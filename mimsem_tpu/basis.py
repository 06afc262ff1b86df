"""1D Gauss-Lobatto-Legendre quadrature and mimetic basis functions.

Provides the discrete de Rham structure in 1D:
  * nodal (Lagrange) basis l_i on GLL points  -- H1-conforming 0-form pieces
  * edge (histopolation) basis e_j = -sum_{k<=j} dl_k/dx -- L2-conforming 1-form pieces
and the 2D tensor-product evaluation tables used by the element operators.

Reference parity: src/Basis.cpp (GaussLobatto, LagrangeNode, LagrangeEdge) and
src/ElMats.cpp (M0_j_xy_i, M1x_j_xy_i, M1y_j_xy_i, M2_j_xy_i, Wii) of MiMSEM.
Unlike the reference (hard-coded orders 1..7), nodes/weights are computed for any
order via Newton iteration on (1-x^2) P'_n(x).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp


def gll(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Lobatto-Legendre nodes and weights of order n (n+1 points on [-1,1]).

    Exact for polynomials of degree 2n-1.  Weights satisfy sum(w) == 2.
    """
    if n < 1:
        raise ValueError("GLL order must be >= 1")
    # Chebyshev-Gauss-Lobatto initial guess
    x = -np.cos(np.pi * np.arange(n + 1) / n)
    # Newton iteration on the derivative condition: interior nodes are roots of P'_n.
    # Build Legendre Vandermonde via three-term recurrence each sweep.
    P = np.zeros((n + 1, n + 1))
    x_old = np.full_like(x, 2.0)
    for _ in range(200):
        if np.max(np.abs(x - x_old)) < 1e-16:
            break
        x_old = x.copy()
        P[:, 0] = 1.0
        if n >= 1:
            P[:, 1] = x
        for k in range(2, n + 1):
            P[:, k] = ((2 * k - 1) * x * P[:, k - 1] - (k - 1) * P[:, k - 2]) / k
        # f = (1-x^2) P'_n ~ n*(P_{n-1} - x P_n); Newton update from standard GLL recipe
        x = x_old - (x * P[:, n] - P[:, n - 1]) / ((n + 1) * P[:, n])
    x[0], x[n] = -1.0, 1.0
    w = 2.0 / (n * (n + 1) * P[:, n] ** 2)
    assert abs(w.sum() - 2.0) < 1e-12, "GLL weight sum check failed"
    return x, w


def lagrange_eval(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Evaluate the n+1 Lagrange cardinal functions on `nodes` at points `x`.

    Returns array of shape (len(x), len(nodes)).  Works for numpy or jax inputs
    (pure product formula, traceable under jit).
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    nodes = xp.asarray(nodes)
    x = xp.asarray(x)
    npts = nodes.shape[0]
    diff = x[..., None] - nodes  # (..., n+1)
    out = []
    for i in range(npts):
        mask = np.arange(npts) != i
        denom = nodes[i] - nodes[mask]
        out.append(xp.prod(diff[..., mask] / denom, axis=-1))
    return xp.stack(out, axis=-1)


def lagrange_deriv(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Evaluate d/dx of the Lagrange cardinal functions at points `x`.

    Shape (len(x), len(nodes)).  Traceable (static loops over small basis order).
    Mirrors LagrangeNode::evalDeriv (src/Basis.cpp:192-213).
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    nodes = np.asarray(nodes) if not isinstance(nodes, np.ndarray) else nodes
    x = xp.asarray(x)
    npts = nodes.shape[0]
    cols = []
    for i in range(npts):
        acc = 0.0
        for j in range(npts):
            if j == i:
                continue
            term = 1.0
            for k in range(npts):
                if k == i or k == j:
                    continue
                term = term * (x - nodes[k]) / (nodes[i] - nodes[k])
            acc = acc + term / (nodes[i] - nodes[j])
        cols.append(acc)
    return xp.stack(cols, axis=-1)


def edge_eval(nodes: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Evaluate the n edge (histopolation) functions e_j(x) = -sum_{k<=j} l_k'(x).

    Shape (len(x), n).  The edge basis integrates to 1 on each node interval and
    spans polynomials of degree n-1 (src/Basis.cpp:277-286).
    """
    xp = jnp if isinstance(x, jnp.ndarray) else np
    dl = lagrange_deriv(nodes, x)  # (..., n+1)
    csum = xp.cumsum(dl, axis=-1)
    return -csum[..., :-1]


@dataclass(frozen=True)
class Basis:
    """Precomputed 1D/2D basis-evaluation tables for element order p, quad order q.

    All 2D tables have rows = (q+1)^2 quadrature points (x-fastest ordering) and
    columns = element-local DOFs with the reference's orderings
    (src/ElMats.cpp:20-224):
      B0  [(q+1)^2, (p+1)^2]  cols (ix + (p+1)*iy)        l_i(x) l_j(y)
      B1x [(q+1)^2, (p+1)*p]  cols (ix_node + (p+1)*jy_edge)  l_i(x) e_j(y)
      B1y [(q+1)^2, p*(p+1)]  cols (ix_edge + p*jy_node)      e_i(x) l_j(y)
      B2  [(q+1)^2, p^2]      cols (ix + p*iy)            e_i(x) e_j(y)
      W   [(q+1)^2]           w_ix * w_iy quadrature weights
    """
    p: int
    q: int
    nodes: np.ndarray = field(repr=False)
    qpts: np.ndarray = field(repr=False)
    qwts: np.ndarray = field(repr=False)
    l_at_q: np.ndarray = field(repr=False)   # (q+1, p+1)
    dl_at_q: np.ndarray = field(repr=False)  # (q+1, p+1)
    e_at_q: np.ndarray = field(repr=False)   # (q+1, p)
    B0: np.ndarray = field(repr=False)
    B1x: np.ndarray = field(repr=False)
    B1y: np.ndarray = field(repr=False)
    B2: np.ndarray = field(repr=False)
    W: np.ndarray = field(repr=False)

    @property
    def nq(self) -> int:
        return (self.q + 1) ** 2

    @property
    def n0(self) -> int:
        return (self.p + 1) ** 2

    @property
    def n1(self) -> int:
        return self.p * (self.p + 1)

    @property
    def n2(self) -> int:
        return self.p ** 2


@functools.lru_cache(maxsize=None)
def make_basis(p: int, q: int | None = None) -> Basis:
    """Build the basis tables for element order p and quadrature order q (default p).

    q == p reproduces the reference's co-located inexact integration, under which
    the 0-form mass matrix is diagonal (src/Assembly.cpp:853-856).
    """
    if q is None:
        q = p
    nodes, _ = gll(p)
    qpts, qwts = gll(q)
    l_at_q = lagrange_eval(nodes, qpts)      # (q+1, p+1)
    dl_at_q = lagrange_deriv(nodes, qpts)
    e_at_q = edge_eval(nodes, qpts)          # (q+1, p)

    mp1, np1, nn = q + 1, p + 1, p
    # 2D tensor tables, x-fastest in both rows and columns.
    B0 = np.zeros((mp1 * mp1, np1 * np1))
    B1x = np.zeros((mp1 * mp1, np1 * nn))
    B1y = np.zeros((mp1 * mp1, nn * np1))
    B2 = np.zeros((mp1 * mp1, nn * nn))
    W = np.zeros(mp1 * mp1)
    for qq in range(mp1 * mp1):
        qx, qy = qq % mp1, qq // mp1
        W[qq] = qwts[qx] * qwts[qy]
        for j in range(np1 * np1):
            B0[qq, j] = l_at_q[qx, j % np1] * l_at_q[qy, j // np1]
        for j in range(np1 * nn):
            B1x[qq, j] = l_at_q[qx, j % np1] * e_at_q[qy, j // np1]
        for j in range(nn * np1):
            B1y[qq, j] = e_at_q[qx, j % nn] * l_at_q[qy, j // nn]
        for j in range(nn * nn):
            B2[qq, j] = e_at_q[qx, j % nn] * e_at_q[qy, j // nn]
    return Basis(p=p, q=q, nodes=nodes, qpts=qpts, qwts=qwts,
                 l_at_q=l_at_q, dl_at_q=dl_at_q, e_at_q=e_at_q,
                 B0=B0, B1x=B1x, B1y=B1y, B2=B2, W=W)
