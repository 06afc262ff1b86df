"""Metric terms: quadrature-point coordinates, Jacobians, determinants.

Vectorized form of the reference Jacobian (src/Geom.cpp:168-252, after Guba,
Taylor, Ullrich, Overfelt and Levy, GMD 7, 2014): the element is the bilinear
patch through its 4 corner points, radially projected to the sphere; the
Jacobian columns are the tangent vectors of that map expressed in the local
orthonormal (east, north) frame and scaled by R/|r_tilde|.

Note the reference's A*B matrix product (src/Geom.cpp:191-204) is algebraically
the projection onto the orthonormal (east, north) frame: B = I - r r^T with the
meridional row scaled by 1/cos(phi), so for tangent-plane output it reduces to
J[a][k] = (R/|r~|) * frame_a . d r~/d x_k, which is what is computed here.

For the periodic box the map is bilinear in the plane and J is affine
(box/Geom.cpp:122-140).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..basis import Basis


@dataclass
class Geometry:
    x: np.ndarray        # (nel, nq, 3) physical quadrature-point coords
    lonlat: np.ndarray   # (nel, nq, 2) lon/lat (sphere) or x/y (box)
    J: np.ndarray        # (nel, nq, 2, 2)
    det: np.ndarray      # (nel, nq)
    # precomputed operator metrics
    wdet: np.ndarray = field(default=None)     # (nel, nq) w*det       [0-form mass]
    winvdet: np.ndarray = field(default=None)  # (nel, nq) w/det       [2-form mass]
    G1: np.ndarray = field(default=None)       # (nel, nq, 2, 2) w*J^T J/det [1-form mass]


def _bilinear_shape(x1: np.ndarray, x2: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    s = np.stack([0.25 * (1 - x1) * (1 - x2),
                  0.25 * (1 + x1) * (1 - x2),
                  0.25 * (1 + x1) * (1 + x2),
                  0.25 * (1 - x1) * (1 + x2)], axis=-1)
    ds1 = np.stack([-0.25 * (1 - x2), +0.25 * (1 - x2),
                    +0.25 * (1 + x2), -0.25 * (1 + x2)], axis=-1)
    ds2 = np.stack([-0.25 * (1 - x1), -0.25 * (1 + x1),
                    +0.25 * (1 + x1), +0.25 * (1 - x1)], axis=-1)
    return s, ds1, ds2


def build_geometry(mesh: dict, basis: Basis) -> Geometry:
    """Coordinates + Jacobians at the (q+1)^2 quadrature points of every element."""
    corners = mesh['corners']
    q1 = basis.q + 1
    qx = np.tile(basis.qpts, q1)      # x fastest (quad slot = qy*(q+1)+qx)
    qy = np.repeat(basis.qpts, q1)
    s, ds1, ds2 = _bilinear_shape(qx, qy)

    rt = np.einsum('pc,ecd->epd', s, corners)    # (nel, nq, 3) bilinear points
    T1 = np.einsum('pc,ecd->epd', ds1, corners)  # tangents d r~/d x1
    T2 = np.einsum('pc,ecd->epd', ds2, corners)

    if mesh['kind'] == 'cubed_sphere':
        R = mesh['radius']
        rmag = np.linalg.norm(rt, axis=-1)
        rhat = rt / rmag[..., None]
        x = R * rhat                              # snapped coords (src/Geom.cpp:539-556)
        lon = np.arctan2(x[..., 1], x[..., 0])
        lat = np.arcsin(np.clip(x[..., 2] / R, -1.0, 1.0))
        east = np.stack([-np.sin(lon), np.cos(lon), np.zeros_like(lon)], axis=-1)
        north = np.stack([-np.cos(lon) * np.sin(lat),
                          -np.sin(lon) * np.sin(lat),
                          np.cos(lat)], axis=-1)
        scale = (R / rmag)[..., None]
        J = np.stack([
            np.stack([np.sum(east * T1, -1), np.sum(east * T2, -1)], axis=-1),
            np.stack([np.sum(north * T1, -1), np.sum(north * T2, -1)], axis=-1),
        ], axis=-2) * scale[..., None]
        lonlat = np.stack([lon, lat], axis=-1)
    else:
        x = rt
        J = np.stack([
            np.stack([T1[..., 0], T2[..., 0]], axis=-1),
            np.stack([T1[..., 1], T2[..., 1]], axis=-1),
        ], axis=-2)
        lonlat = rt[..., :2].copy()

    det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    assert np.all(det > 0), "negative Jacobian determinant"

    W = basis.W[None, :]  # (1, nq)
    wdet = W * det
    winvdet = W / det
    JtJ = np.einsum('eqki,eqkj->eqij', J, J)
    G1 = JtJ * (W / det)[..., None, None]
    return Geometry(x=x, lonlat=lonlat, J=J, det=det,
                    wdet=wdet, winvdet=winvdet, G1=G1)
