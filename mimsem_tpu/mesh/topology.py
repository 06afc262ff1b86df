"""Global DOF topology for the mimetic element complex (0/1/2-forms).

Replaces the reference's offline index-file generator (scr/Proc2.py, src/Topo.cpp)
with a geometric construction that is independent of panel orientation
book-keeping: DOF slots of all elements are mapped to physical space and merged
by position; shared 1-form DOFs additionally carry a relative sign computed by
comparing the Piola image of the slot's reference direction against the
canonical (owner) occurrence.  This reproduces the reference's conforming
identification (scr/Proc2.py:133-230 orientation cases) without case analysis
and generalizes to any panel layout.

Conventions (matching src/ElMats.cpp column orders and src/Assembly.cpp:1415-1533
incidence signs):
  * x-family 1-form slot (ix in 0..p nodes, jy in 0..p-1 edges), col jy*(p+1)+ix,
    basis l_ix(x) e_jy(y); its DOF equals the flux of the Piola field across the
    physical image of the sub-edge {x=nodes[ix], y in [nodes[jy], nodes[jy+1]]}
    oriented along the image of +e_x.
  * y-family slot (ix in 0..p-1 edges, jy in 0..p nodes), col jy*p+ix,
    basis e_ix(x) l_jy(y), flux oriented along the image of +e_y.
  * E10 = rotated gradient (0->1): x-row: +psi(ix,jy) - psi(ix,jy+1);
    y-row: -psi(ix,jy) + psi(ix+1,jy).
  * E21 = divergence (1->2): -ux(ix,jy) + ux(ix+1,jy) - uy(ix,jy) + uy(ix,jy+1).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..basis import gll
from .cubed_sphere import bilinear_sphere_map


@dataclass
class Topology:
    p: int
    nel: int
    n0: int
    n1: int
    n2: int
    e2d0: np.ndarray   # (nel, (p+1)^2) int32 global 0-form ids
    e2d1: np.ndarray   # (nel, 2p(p+1)) int32 global 1-form ids (x slots then y)
    sgn1: np.ndarray   # (nel, 2p(p+1)) float64 +-1 local-view signs
    e2d2: np.ndarray   # (nel, p^2) int32
    e10_plus: np.ndarray   # (n1,) 0-form id with +1 coeff
    e10_minus: np.ndarray  # (n1,) 0-form id with -1 coeff
    e21_idx: np.ndarray    # (n2, 4) 1-form ids
    e21_sgn: np.ndarray    # (n2, 4) +-1 coeffs (incl. local-view sign)

    @property
    def n1loc(self) -> int:
        return self.p * (self.p + 1)


def _map_points(mesh: dict, x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """Physical coords of reference points (x1,x2) in every element: (nel, npts, 3)."""
    corners = mesh['corners']
    if mesh['kind'] == 'cubed_sphere':
        return bilinear_sphere_map(corners, x1, x2, mesh['radius'])
    # affine/bilinear planar map
    s = np.stack([0.25 * (1 - x1) * (1 - x2),
                  0.25 * (1 + x1) * (1 - x2),
                  0.25 * (1 + x1) * (1 + x2),
                  0.25 * (1 - x1) * (1 + x2)], axis=-1)
    return np.einsum('pc,ecd->epd', s, corners)


def _quantize(mesh: dict, pos: np.ndarray, tol: float) -> np.ndarray:
    """Integer keys for merging; periodic boxes wrap in integer space."""
    k = np.round(pos / tol).astype(np.int64)
    if mesh.get('periodic'):
        kx = np.int64(round(mesh['lx'] / tol))
        ky = np.int64(round(mesh['ly'] / tol))
        k[..., 0] = k[..., 0] % kx
        k[..., 1] = k[..., 1] % ky
    return k


def _merge(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Merge rows of integer keys: (gid per row, first-occurrence row, count).

    Delegates to the native C++ engine (native/topology.cpp via ctypes) with a
    numpy fallback -- the framework's graph-builder core."""
    from ..native import merge_rows
    return merge_rows(keys)


def build_topology(mesh: dict, p: int) -> Topology:
    nodes, _ = gll(p)
    nel = mesh['nel']
    np1 = p + 1
    n0loc = np1 * np1
    n1loc = p * np1
    mids = 0.5 * (nodes[:-1] + nodes[1:])

    # merge tolerance from typical element edge length
    c = mesh['corners']
    el_len = np.median(np.linalg.norm(c[:, 1] - c[:, 0], axis=-1))
    tol = 1e-6 * el_len

    # ---- 0-forms ----
    gx, gy = np.meshgrid(nodes, nodes, indexing='xy')  # [iy, ix]
    x1 = gx.ravel()  # slot jj = iy*np1+ix, x fastest
    x2 = gy.ravel()
    pos0 = _map_points(mesh, x1, x2)
    gid0, _, n0 = _merge(_quantize(mesh, pos0, tol).reshape(-1, 3))
    e2d0 = gid0.reshape(nel, n0loc).astype(np.int32)

    # ---- 1-forms (x-family then y-family) ----
    # x-family: (nodes[ix], mids[jy]), slot jy*np1+ix
    xx1 = np.tile(nodes, p)                      # ix fastest
    xx2 = np.repeat(mids, np1)
    # y-family: (mids[ix], nodes[jy]), slot jy*p+ix
    yx1 = np.tile(mids, np1)
    yx2 = np.repeat(nodes, p)
    x1all = np.concatenate([xx1, yx1])
    x2all = np.concatenate([xx2, yx2])
    pos1 = _map_points(mesh, x1all, x2all)       # (nel, 2*n1loc, 3)

    eps = 1e-5
    dA = (_map_points(mesh, x1all + eps, x2all) - _map_points(mesh, x1all - eps, x2all)) / (2 * eps)
    dB = (_map_points(mesh, x1all, x2all + eps) - _map_points(mesh, x1all, x2all - eps)) / (2 * eps)
    # family direction (flux orientation) and edge tangent per slot
    fam = np.concatenate([np.zeros(n1loc, np.int64), np.ones(n1loc, np.int64)])
    dirs = np.where(fam[None, :, None] == 0, dA, dB)     # e_x image | e_y image
    tang = np.where(fam[None, :, None] == 0, dB, dA)
    # transversal (normal-ish) part of the flux direction
    t2 = np.sum(tang * tang, axis=-1, keepdims=True)
    nrm = dirs - tang * (np.sum(dirs * tang, axis=-1, keepdims=True) / t2)

    keys1 = _quantize(mesh, pos1, tol).reshape(-1, 3)
    gid1, first1, n1 = _merge(keys1)
    nrm_flat = nrm.reshape(-1, 3)
    canon = nrm_flat[first1]                              # (n1, 3) owner normals
    dots = np.sum(nrm_flat * canon[gid1], axis=-1)
    mags = np.linalg.norm(nrm_flat, axis=-1) * np.linalg.norm(canon[gid1], axis=-1)
    if np.any(np.abs(dots) < 0.5 * mags):
        raise RuntimeError("ambiguous 1-form orientation during merge")
    sgn = np.where(dots >= 0.0, 1.0, -1.0)
    e2d1 = gid1.reshape(nel, 2 * n1loc).astype(np.int32)
    sgn1 = sgn.reshape(nel, 2 * n1loc)

    # ---- 2-forms: element-local ----
    n2 = nel * p * p
    e2d2 = np.arange(n2, dtype=np.int32).reshape(nel, p * p)

    # ---- incidence E10 (rows = global 1-form dofs, from owner occurrence) ----
    own_el = first1 // (2 * n1loc)
    own_slot = first1 % (2 * n1loc)
    e10_plus = np.zeros(n1, dtype=np.int32)
    e10_minus = np.zeros(n1, dtype=np.int32)
    is_x = own_slot < n1loc
    # x-family owner: +psi(ix,jy) - psi(ix,jy+1)
    sx = own_slot[is_x]
    ix, jy = sx % np1, sx // np1
    e10_plus[is_x] = e2d0[own_el[is_x], jy * np1 + ix]
    e10_minus[is_x] = e2d0[own_el[is_x], (jy + 1) * np1 + ix]
    # y-family owner: -psi(ix,jy) + psi(ix+1,jy)
    sy = own_slot[~is_x] - n1loc
    ix, jy = sy % p, sy // p
    e10_plus[~is_x] = e2d0[own_el[~is_x], jy * np1 + ix + 1]
    e10_minus[~is_x] = e2d0[own_el[~is_x], jy * np1 + ix]

    # ---- incidence E21 (rows = global 2-form dofs; cols with local-view signs) ----
    e21_idx = np.zeros((n2, 4), dtype=np.int32)
    e21_sgn = np.zeros((n2, 4))
    iy2, ix2 = np.divmod(np.arange(p * p), p)  # slot = iy*p+ix
    els = np.repeat(np.arange(nel), p * p)
    ix2 = np.tile(ix2, nel)
    iy2 = np.tile(iy2, nel)
    sxl = iy2 * np1 + ix2          # ux(ix,jy) slot
    sxr = iy2 * np1 + ix2 + 1      # ux(ix+1,jy)
    syb = n1loc + iy2 * p + ix2    # uy(ix,jy)
    syt = n1loc + (iy2 + 1) * p + ix2
    e21_idx[:, 0] = e2d1[els, sxl]; e21_sgn[:, 0] = -sgn1[els, sxl]
    e21_idx[:, 1] = e2d1[els, sxr]; e21_sgn[:, 1] = +sgn1[els, sxr]
    e21_idx[:, 2] = e2d1[els, syb]; e21_sgn[:, 2] = -sgn1[els, syb]
    e21_idx[:, 3] = e2d1[els, syt]; e21_sgn[:, 3] = +sgn1[els, syt]

    return Topology(p=p, nel=nel, n0=n0, n1=n1, n2=n2,
                    e2d0=e2d0, e2d1=e2d1, sgn1=sgn1, e2d2=e2d2,
                    e10_plus=e10_plus, e10_minus=e10_minus,
                    e21_idx=e21_idx, e21_sgn=e21_sgn)
