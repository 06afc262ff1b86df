"""Artifact-envelope oracles for the 100-day Held-Suarez climatology
(eul/HeldSuarez.cpp:25,275-298: NK=16, dt=120 s, 100 days, hs_forcing).

Pattern follows tests/test_umjs14_oracle.py: the COMMITTED artifacts must
satisfy (1) the conservation/equilibration envelope of the energetics
series and (2) the published climatology structure -- two midlatitude
westerly jets in the time+zonal-mean zonal wind (Held & Suarez 1994,
Fig. 2) -- via the machine-readable zonal-mean companion written by
scr/plot_zonal_mean.py.

Both tests SKIP while the run is still in flight (artifacts absent or
short), so the suite stays green during production.
"""
import glob
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "demo", "held_suarez")


def test_hs_energetics_envelope():
    edat = os.path.join(OUT, "energetics.dat")
    if not os.path.exists(edat):
        pytest.skip("Held-Suarez energetics not present")
    e = np.loadtxt(edat)
    if e.ndim == 1 or e[-1, 0] < 99.0:
        pytest.skip(f"run in flight (day {e[-1, 0] if e.ndim > 1 else 0:.0f})")
    # columns: day keh kev pe ie k2p p2k k2i i2k k2i_z i2k_z mass entr
    day, keh, mass = e[:, 0], e[:, 1], e[:, 11]
    assert abs(mass[-1] / mass[0] - 1.0) < 1e-6, "mass drift envelope"
    # forced-dissipative equilibration: eddies spin up (KE_h well above the
    # axisymmetric start) and the series neither collapses nor runs away in
    # the second half (statistically steady band)
    late = keh[day > 50.0]
    assert late.size >= 10
    assert late.mean() > 1.2 * keh[0], "eddies must spin up KE_h"
    assert late.max() < 10.0 * late.min(), "KE_h must equilibrate, not run away"
    # the Held-Suarez forcing drains available potential energy into a
    # statistically steady IE: no secular blowup
    ie = e[:, 4]
    assert abs(ie[-1] / ie[0] - 1.0) < 0.05, "IE envelope"


def test_hs_westerly_jets():
    zm = os.path.join(OUT, "zonal_mean_u_x.npz")
    if not os.path.exists(zm):
        pytest.skip("zonal-mean climatology not present")
    d = np.load(zm)
    mean, lat, zkm = d["mean"], d["lat_deg"], d["z_km"]
    # upper-troposphere band (8-14 km): two westerly maxima at +-(20-60)deg
    band = (zkm.mean(axis=1) > 8.0) & (zkm.mean(axis=1) < 14.0)
    assert band.any()
    u = mean[band].mean(axis=0)
    nh = u[(lat > 20) & (lat < 60)]
    sh = u[(lat < -20) & (lat > -60)]
    assert nh.max() > 15.0, f"NH jet too weak: {nh.max():.1f} m/s"
    assert sh.max() > 15.0, f"SH jet too weak: {sh.max():.1f} m/s"
    # easterly (or weak) equatorial upper flow separates the jets
    eq = u[np.abs(lat) < 10]
    assert eq.max() < 0.7 * max(nh.max(), sh.max()), \
        "jets must be separated by weaker equatorial flow"
