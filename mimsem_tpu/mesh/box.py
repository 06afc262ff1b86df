"""Doubly-periodic planar box mesh (the reference's box/ geometry).

Affine elements: jac = 0.5*Lx/nex * I (box/Geom.cpp:122-140), corners on a
uniform grid with periodic wrap in both directions.
"""
from __future__ import annotations

import numpy as np


def periodic_box_mesh(nex: int, ney: int | None = None,
                      lx: float = 1000.0, ly: float | None = None) -> dict:
    """Build a doubly-periodic box mesh of nex x ney quad elements.

    corners: (nel, 4, 3) with z=0; corner order (SW, SE, NE, NW).
    Physical coordinates are NOT wrapped (corner coords of wrap-around elements
    exceed the box) so the per-element affine map is well defined; topology
    identification is periodic in index space (handled in topology.py via the
    `periodic` flag and wrapped corner keys).
    """
    if ney is None:
        ney = nex
    if ly is None:
        ly = lx
    xs = np.linspace(0.0, lx, nex + 1)
    ys = np.linspace(0.0, ly, ney + 1)
    corners = np.zeros((ney, nex, 4, 3))
    for ey in range(ney):
        for ex in range(nex):
            x0, x1 = xs[ex], xs[ex + 1]
            y0, y1 = ys[ey], ys[ey + 1]
            corners[ey, ex, 0] = (x0, y0, 0.0)
            corners[ey, ex, 1] = (x1, y0, 0.0)
            corners[ey, ex, 2] = (x1, y1, 0.0)
            corners[ey, ex, 3] = (x0, y1, 0.0)
    return dict(kind='box', corners=corners.reshape(-1, 4, 3), nel=nex * ney,
                ne=nex, nex=nex, ney=ney, lx=lx, ly=ly, nfaces=1, periodic=True)
