"""Equiangular cubed-sphere mesh generation (in-library, no text files).

Reproduces the reference's offline generator math (scr/Geom2.py:10-277,
scr/Setup.py) as vectorized numpy executed at model setup:
  * face 0 is built on the equator centred at lon=0 from the equiangular
    gnomonic projection; elements partition [-pi/4, pi/4] uniformly in angle
    with GLL-in-angle interior points,
  * the other five faces are cumulative +pi/2 rotations of face 0
    (scr/Geom2.py:78-190): face 1 north polar, face 2 lon=90, face 3 lon=180,
    face 4 south polar, face 5 lon=270.

Only element corners define the discrete geometry: interior quadrature points
are re-snapped onto the sphere through the bilinear corner map, consistent with
the Jacobian definition (src/Geom.cpp:518-562, Guba et al. GMD 2014).
"""
from __future__ import annotations

import numpy as np

RAD_SPHERE = 6371220.0

# Cumulative face rotation matrices (scr/Geom2.py:78-190).
_A1 = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], dtype=np.float64)   # north
_A2 = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=np.float64)   # east
_A3 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
_A4 = _A1
_A5 = _A2


def face_rotations() -> np.ndarray:
    """(6,3,3) rotation taking face-0 points to face f."""
    R = np.zeros((6, 3, 3))
    R[0] = np.eye(3)
    R[1] = _A1
    R[2] = _A2 @ R[1]
    R[3] = _A3 @ R[2]
    R[4] = _A4 @ R[3]
    R[5] = _A5 @ R[4]
    return R


def _face0_point(ax: np.ndarray, ay: np.ndarray) -> np.ndarray:
    """Unit-sphere Cartesian coords of face-0 equiangular point (ax, ay in angle).

    theta = ax; phi = arcsin(tan(ay)/sqrt(1+tan^2 ax+tan^2 ay)) (scr/Geom2.py:53-61).
    """
    tx, ty = np.tan(ax), np.tan(ay)
    theta = ax
    phi = np.arcsin(ty / np.sqrt(1.0 + tx * tx + ty * ty))
    return np.stack([np.cos(phi) * np.cos(theta),
                     np.cos(phi) * np.sin(theta),
                     np.sin(phi)], axis=-1)


def cubed_sphere_mesh(ne: int, radius: float = RAD_SPHERE) -> dict:
    """Build the cubed-sphere element-corner arrays.

    Returns dict with:
      corners : (nel, 4, 3) element corner Cartesian coords (radius `radius`),
                corner order (SW, SE, NE, NW) matching the reference Jacobian
                (src/Geom.cpp:174-188: c1..c4).
      nel     : 6*ne*ne elements ordered (face, ey, ex), ex fastest.
      ne, radius.
    """
    # element boundary angles: uniform in [-pi/4, pi/4]
    ang = np.linspace(-0.25 * np.pi, 0.25 * np.pi, ne + 1)
    R = face_rotations()

    ax, ay = np.meshgrid(ang, ang, indexing='xy')  # (ne+1, ne+1) [iy, ix]
    grid0 = _face0_point(ax, ay)                   # (ne+1, ne+1, 3) grid0[iy, ix]

    corners = np.zeros((6, ne, ne, 4, 3))
    for f in range(6):
        g = grid0 @ R[f].T
        corners[f, :, :, 0, :] = g[:-1, :-1]   # SW
        corners[f, :, :, 1, :] = g[:-1, 1:]    # SE
        corners[f, :, :, 2, :] = g[1:, 1:]     # NE
        corners[f, :, :, 3, :] = g[1:, :-1]    # NW
    corners = corners.reshape(6 * ne * ne, 4, 3) * radius
    return dict(kind='cubed_sphere', corners=corners, nel=6 * ne * ne, ne=ne,
                radius=radius, nfaces=6, periodic=False)


def bilinear_sphere_map(corners: np.ndarray, x1: np.ndarray, x2: np.ndarray,
                        radius: float) -> np.ndarray:
    """Map reference coords (x1,x2) in [-1,1]^2 to sphere surface points.

    corners: (nel, 4, 3).  x1, x2: (npts,).  Returns (nel, npts, 3).
    Bilinear patch through the 4 corners, radially projected (src/Geom.cpp:539-556).
    """
    s = np.stack([0.25 * (1 - x1) * (1 - x2),
                  0.25 * (1 + x1) * (1 - x2),
                  0.25 * (1 + x1) * (1 + x2),
                  0.25 * (1 - x1) * (1 + x2)], axis=-1)  # (npts, 4)
    r = np.einsum('pc,ecd->epd', s, corners)             # (nel, npts, 3)
    rn = np.linalg.norm(r, axis=-1, keepdims=True)
    return radius * r / rn
