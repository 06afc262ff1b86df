"""Flagship regression oracles for the 12-day UMJS14 production run.

Round 3 proved that the at-rest/hydrostatic-balance oracles alone cannot see
a horizontal time-dilation bug (all 3D horizontal dynamics ran 1/thick too
slow for two rounds while every balance test passed).  These tests pin the
flagship from two directions:

1. `test_umjs14_artifact_envelope` -- the COMMITTED 12-day artifacts
   (demo/umjs14/energetics.dat + wave_growth.dat) must satisfy the
   conservation envelope and the PHYSICAL wave-growth rate (the quantity the
   time-dilation bug corrupted: the pre-fix run deepened only ~1.4 hPa by
   day 10 vs the physical ~66 hPa).  Catches silently-regenerated-invalid
   artifacts.

2. `test_umjs14_short_trajectory_pin` -- a 6-step f64 trajectory of the
   small UMJS14 configuration against energetics pinned at the
   corrected-dynamics commit.  Any convention refactor that changes the
   horizontal dynamics (metric pairings, velocity form, time scaling)
   moves these functionals far beyond the 1e-6 gate; legitimate
   solver/reduction-order changes sit at ~1e-10.

Reference budget being pinned: eul/Euler_2.cpp:600-744 (diagnostics);
flagship config eul/UMJS14.cpp:275-353.
"""
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "demo", "umjs14")


def test_umjs14_artifact_envelope():
    edat = os.path.join(OUT, "energetics.dat")
    wdat = os.path.join(OUT, "wave_growth.dat")
    if not (os.path.exists(edat) and os.path.exists(wdat)):
        pytest.skip("12-day UMJS14 artifacts not present")
    e = np.loadtxt(edat)
    assert e[-1, 0] >= 12.0, "energetics must reach day 12"
    # columns: day keh kev pe ie k2p p2k k2i i2k k2i_z i2k_z mass entr
    mass, entr = e[:, 11], e[:, 12]
    etot = e[:, 1] + e[:, 2] + e[:, 3] + e[:, 4]
    assert abs(mass[-1] / mass[0] - 1.0) < 5e-9, "mass drift envelope"
    assert abs(etot[-1] / etot[0] - 1.0) < 2e-3, "total-energy envelope"
    assert abs(entr[-1] / entr[0] - 1.0) < 5e-3, "entropy envelope"
    # physical growth: KE_h (zonal jet + eddies) grew 1.32x over the life
    # cycle in the committed run; the time-dilated run stayed ~flat
    assert etot.shape[0] >= 20 and e[-1, 1] > 1.2 * e[0, 1], \
        "horizontal KE must grow through the baroclinic life cycle"

    w = np.loadtxt(wdat)            # day, NH min ps (hPa), NH vmax (m/s)
    day, pmin, vmax = w[:, 0], w[:, 1], w[:, 2]
    p10 = pmin[np.argmin(np.abs(day - 10.0))]
    assert pmin[0] - p10 > 40.0, (
        f"surface low must deepen >40 hPa by day 10 (got "
        f"{pmin[0] - p10:.1f}); the time-dilated dynamics managed ~1.4")
    i4 = np.argmin(np.abs(day - 4.0))
    i85 = np.argmin(np.abs(day - 8.5))
    assert vmax[i85] / max(vmax[i4], 1e-9) > 8.0, \
        "vmax must e-fold at the physical rate through days 4-8.5"


def test_umjs14_short_trajectory_pin():
    """6-step ne=4/nk=8 f64 energetics pinned at commit 2832dba (flux-form
    dynamics + weighted-Schwarz Richardson solves + the reference-parity
    biharmonic dx = sqrt(area/(nel p^2)), which moved keh/umax by ~2e-5
    from the e63e38b pins)."""
    import jax
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    import jax.numpy as jnp
    from mimsem_tpu.testcases import umjs14

    eul, state = umjs14.build(ne=4, p=3, nk=8, dt=75.0, dtype=jnp.float64)
    state, _ = eul.step_ec(state, first=True)
    for _ in range(5):
        state, _ = eul.step_ec(state)
    velx, w, rho, rt, exner = state[:5]
    e = eul.energetics_ec(velx, w, rho, rt, exner)
    pinned = dict(keh=4.032565367274e+20, kev=3.668233863695e+17,
                  pe=3.619381266840e+23, ie=9.156209712451e+23,
                  mass=5.129584059396e+18, entr=2.857127090451e+23)
    for k, v in pinned.items():
        rel = abs(float(e[k]) / v - 1.0)
        assert rel < 1e-6, (k, float(e[k]), v, rel)
    assert abs(float(jnp.max(jnp.abs(w))) / 1.368294919118e+12 - 1.0) < 1e-4
    assert abs(float(jnp.max(jnp.abs(velx))) / 1.126727943788e+11 - 1.0) < 1e-4
