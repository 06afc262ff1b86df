"""Driver-zoo coverage: every reference test-case builder exercised end-to-end.

Closes the round-1 gap "half the driver zoo is dead code as far as
verification goes": deform_flow, williamson5, rossby_haurwitz, galewsky_tsw,
held_suarez, gravwave each run a few production steps here with a physics
oracle (conservation drift / boundedness / forcing sign), mirroring the
reference's conservation-as-regression strategy (SURVEY.md section 4).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mimsem_tpu.utils import diagnostics as dg


# ------------------------------------------------------------- Williamson 5
def test_williamson5_topography_conservation():
    """Flow over the isolated mountain (src/Williamson5.cpp): topography
    enters through the precomputed balanced forcing (bot_fn at construction)
    so the plain run_steps path is exercised WITH `bot`."""
    from mimsem_tpu.testcases import williamson5 as w5
    sw, u, hp = w5.build(ne=2, p=3, dt=600.0)
    assert sw.bot_g is not None          # mountain actually wired in
    c0 = sw.conservation_f64(u, hp)
    u1, hp1 = sw.run_steps(u, hp, 5)
    c1 = sw.conservation_f64(u1, hp1)
    assert np.isfinite(np.asarray(u1)).all()
    assert abs((c1["mass"] - c0["mass"]) / c0["mass"]) < 1e-12
    assert abs((c1["vort"] - c0["vort"]) / c0["mass"]) < 1e-12
    # energy (incl. the g*h*b topography term) conserved to solver tolerance
    assert abs((c1["ener"] - c0["ener"]) / c0["ener"]) < 1e-9


# ------------------------------------------------------- Rossby-Haurwitz wave
def test_rossby_haurwitz_conservation():
    from mimsem_tpu.testcases import rossby_haurwitz as rh
    sw, u, hp = rh.build(ne=2, p=3, dt=180.0)
    c0 = sw.conservation_f64(u, hp)
    u1, hp1 = sw.run_steps(u, hp, 5)
    c1 = sw.conservation_f64(u1, hp1)
    assert np.isfinite(np.asarray(u1)).all()
    assert abs((c1["mass"] - c0["mass"]) / c0["mass"]) < 1e-12
    assert abs((c1["ener"] - c0["ener"]) / c0["ener"]) < 1e-9
    # the wave pattern moves but stays bounded (initial perturbation ~2.7 km)
    h0max = float(jnp.abs(sw.ops.interp2_phys(hp)).max())
    h1max = float(jnp.abs(sw.ops.interp2_phys(hp1)).max())
    assert h1max < 1.5 * h0max


# ----------------------------------------------------------- deformational flow
def test_deform_flow_mass_and_reversal():
    """Nair-Lauritzen reversing deformational flow (src/DeformFlow.cpp; note
    the reference driver itself has a stale AdvEqn.h include and no longer
    compiles -- the capability bar is the configuration, not its output).
    One full period through the scanned time-dependent-velocity path.

    Oracles: exact mass conservation (telescoping E21), stability (no
    blow-up of the un-stabilized centered flux form), and the period-return
    error as a regression bound.  Measured behavior at ne=3/p=3: the return
    error plateaus at 0.75 under dt refinement (240/480/960 steps) -- it is
    pure spatial dispersion: the mid-period filaments are ~R/20 wide,
    unresolvable at this grid (a pure solid-body revolution of the same C^1
    bells already returns with 0.24 error).  The bound 0.9 guards against
    instability/regression, not accuracy; resolving the filaments needs
    ne>~12, demo-scale, not unit-test scale."""
    from mimsem_tpu.testcases import deform_flow as df
    import jax
    nsteps = 240
    adv, h0 = df.build(ne=3, p=3, nsteps=nsteps)
    ops = adv.ops
    m0 = float(dg.int2(ops, h0))
    vel = lambda t: df.velocity(ops, t)
    run = jax.jit(lambda h: adv.run_steps_t(h, vel, nsteps))
    h = run(h0)
    m1 = float(dg.int2(ops, h))
    assert abs((m1 - m0) / m0) < 1e-11
    hq = np.asarray(ops.interp2_phys(h))
    assert np.isfinite(hq).all()
    # stays O(1): measured max|h| = 1.44 after the period (initial projected
    # peak 0.39 -- the unit bells are clipped by the coarse projection);
    # dispersive ringing, no growth
    assert np.abs(hq).max() < 4.0
    num = float(ops.dot2(h - h0, h - h0))
    den = float(ops.dot2(h0, h0))
    assert np.sqrt(num / den) < 0.9


# ------------------------------------------------------------ thermal SW Galewsky
def test_galewsky_tsw_conservation():
    """GalewskyTSW_2 (EEC thermal SW, SSP-RK3): mass, buoyancy and energy
    drift at solver tolerance by construction (README.md:73-75)."""
    from mimsem_tpu.testcases import galewsky_tsw as gt
    tsw, u, h, S = gt.build(ne=2, p=3, dt=30.0)
    c0 = {k: float(v) for k, v in tsw.conservation(u, h, S).items()}
    u, h, S = tsw.run_steps(u, h, S, 10)
    c1 = {k: float(v) for k, v in tsw.conservation(u, h, S).items()}
    assert np.isfinite(np.asarray(u)).all()
    assert abs((c1["mass"] - c0["mass"]) / c0["mass"]) < 1e-12
    # buoyancy flux G comes through iterative mass solves (tol ~1e-13 rel per
    # application), so the drift floor is solver tolerance, not round-off
    assert abs((c1["buoy"] - c0["buoy"]) / c0["buoy"]) < 1e-8
    assert abs((c1["ener"] - c0["ener"]) / c0["ener"]) < 1e-7


# ------------------------------------------------------------------ Held-Suarez
def test_held_suarez_forced_steps():
    """Two Strang steps with hs_forcing on (eul/HeldSuarez.cpp): state stays
    finite and bounded; the temperature relaxation has the restoring sign."""
    from mimsem_tpu.testcases import held_suarez as hs
    eul, state = hs.build(ne=2, p=2, nk=4, dt=120.0)
    velx, w, rho, rt, exner, _ = state
    vo = eul.vo

    # forcing sign: rho k_T (theta - theta_eq) projected -- a column warmer
    # than equilibrium must be cooled (F_rt residual term is +dt*forcing)
    theta = vo.diag_theta(rho, rt)
    f_warm = eul.hs_temp_forcing(rho, 2.0 * rt, exner, 2.0 * theta)
    f_cold = eul.hs_temp_forcing(rho, 0.5 * rt, exner, 0.5 * theta)
    assert float(jnp.mean(vo.phys_layer(f_warm))) > 0.0
    assert float(jnp.mean(vo.phys_layer(f_cold))) < 0.0

    st = state
    for first in (True, False):
        st = eul.step(st, first=first)
    velx2, w2, rho2, rt2, pi2, _ = st
    assert np.isfinite(np.asarray(velx2)).all()
    assert np.isfinite(np.asarray(rt2)).all()
    # friction + relaxation must not blow up the velocity in 2 steps
    u0 = float(jnp.abs(jax.vmap(eul.ops.interp1_phys)(velx)).max())
    u2 = float(jnp.abs(jax.vmap(eul.ops.interp1_phys)(velx2)).max())
    assert u2 < 2.0 * u0 + 1.0


# ------------------------------------------------------------------ gravity wave
def test_gravwave_trapezoidal_steps():
    """Non-hydrostatic gravity wave on the reduced planet through the
    trapezoidal HEVI integrator (eul/GravWave.cpp:274; scheme per the
    Trapazoidal body, eul/Euler_2.cpp:762-1003)."""
    from mimsem_tpu.testcases import gravwave as gw
    eul, state = gw.build(ne=2, p=2, nk=8, dt=1.0)
    velx, w, rho, rt, exner, _ = state
    vo = eul.vo
    m0 = float(jnp.sum(vo.interp(rho) * vo.Wq))
    st = (velx, w, rho, rt, exner)
    for _ in range(3):
        st = eul.step_trap(st)
    velx2, w2, rho2, rt2, pi2 = st
    assert np.isfinite(np.asarray(w2)).all()
    m1 = float(jnp.sum(vo.interp(rho2) * vo.Wq))
    assert abs((m1 - m0) / m0) < 1e-8
    # the +-1 K theta perturbation radiates as a wave: w responds but stays
    # in the linear regime (reference wave speeds ~ 10 m/s)
    wmax = float(jnp.abs(vo.phys_int(w2)).max())
    assert 0.0 < wmax < 20.0
