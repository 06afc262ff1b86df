"""Bisect the EC sphere energy leak (f64, CPU) by term-group substitution.

demo/ec_sphere_energy.py measured a CONSTANT +5e-5/step total-energy
injection in the unforced f64 EC step on the stratified sphere (the box
oracle closes to 1e-9 -- the leak lives in a grad(theta)-proportional term
the box's near-uniform theta cannot see).  This driver monkey-patches term
groups back to their plain (non-EC) forms and reruns the audit:

  base   -- unmodified step_ec (control; leak = +5e-5/step)
  vplain -- VERTICAL theta transport plain: full-dt theta grad(Pi) in the
            w residual, full-dt V10 G_z in the rt residual, no
            entropy-correction terms (the plain Strang vertical form)
  hplain -- HORIZONTAL plain: momentum pressure term = full M1h(theta) dPi,
            dG = full VB E21 G (no 1/2 splits, no K(dTheta) F term)
  strang -- plain Strang step (truncation-level control)

Whichever substitution kills the constant drift owns the leak.

Usage: ec_leak_bisect.py VARIANT [nsteps] [ne] [nk] [dt]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax
import jax.numpy as jnp


def patch_vplain(eul):
    """Plain vertical theta transport (energy-inconsistent, stable)."""
    vo, dt = eul.vo, eul.dt
    from mimsem_tpu.models.euler3d import _dot_hp

    def vert_residual_ec(theta_l2, pi_h, w1, w2, rho1, rho2, VAinv, uuz):
        Fz = vo.diagnose_Fz(w1, w2, rho1, rho2, VAinv)
        Phiz = vo.diagnose_Phiz(w1, w2, eul.zv)
        fw = vo.apply_w(vo.chi_VA(), w2 - w1) + dt * vo.v01(Phiz)
        gradpi = vo.grad_z(pi_h, VAinv)
        VAth = vo.wblk(vo.chi_VA_rho(theta_l2))
        press = jnp.einsum('lnij,lnj->lni', VAth, gradpi)
        fw = fw + dt * press                      # FULL dt, no splitting
        k2i_z = _dot_hp(Fz, press)
        Gz = jnp.einsum('lnij,lnj->lni', VAinv,
                        jnp.einsum('lnij,lnj->lni', VAth, Fz))
        if eul.rayleigh:
            fw = fw + 0.5 * dt * eul.rayleigh * vo.apply_w(
                vo.chi_VA() * eul.ray_prof, w1 + w2)
        if uuz is not None:
            fw = fw + dt * uuz
        # FULL-dt transport smuggled through f_theta_corr:
        # the caller assembles rt_j - rt_i + 0.5*dt*V10(Gz) + f_corr, so
        # f_corr = 0.5*dt*VB(V10 Gz) completes the plain full-dt flux.
        f_corr = 0.5 * dt * vo.apply_w(vo.chi_VB(), vo.v10(Gz))
        # ray_p slot (unmeasured in this energy-inconsistent bisect variant)
        return fw, Fz, Gz, f_corr, k2i_z, jnp.zeros((), fw.dtype)

    eul.vert_residual_ec = vert_residual_ec


def patch_hplain(eul):
    """Plain horizontal pressure + theta flux (energy-inconsistent)."""
    vo = eul.vo
    ops = eul.ops
    from mimsem_tpu.models.euler3d import _dot_hp

    orig_adv = eul._advection_rhs_ec_ws

    def adv_ws(u1, u2, rho1, rho2, theta_l2, ws=None):
        dF, _dG, F, ws2 = orig_adv(u1, u2, rho1, rho2, theta_l2, ws)
        # plain dG: full VB E21 G with G = M1^-1 M1h(thetabar) F
        thp = vo.phys_layer(theta_l2)
        G = eul.solve_M1k(eul.apply_M1hk(F, thp))
        dG = vo.apply_w(vo.chi_VB(), eul.e21k(G))
        return dF, dG, F, ws2

    eul._advection_rhs_ec_ws = adv_ws

    def momentum_rhs_ec(theta_l2, uz1, uz2, w1, w2, exner,
                        u1, u2, rho1, rho2, Fz, dwdx1, dwdx2):
        nk = eul.nk
        Phi = eul.diagnose_Phi(u1, u2, w1, w2)
        r1p, r2p = vo.phys_layer(rho1), vo.phys_layer(rho2)
        u_h = 0.5 * (u1 + u2)
        q = eul.diagnose_q_k(u_h, 0.5 * (r1p + r2p))
        b = eul.scatter1k(
            eul._m1k_local(u1, eul.thickq * (r1p / 3.0 + r2p / 6.0))
            + eul._m1k_local(u2, eul.thickq * (r1p / 6.0 + r2p / 3.0)))
        F = eul.solve_M1k(b)
        loc = eul.e12k_local(Phi)
        wqk = jax.vmap(ops.interp0)(q) * ops.W
        loc = loc + jax.vmap(ops.apply_Rq_local)(wqk, F)
        # plain pressure: FULL M1h(theta) dPi, no splitting
        thp = vo.phys_layer(theta_l2)
        dPi = eul.grad_k(exner)
        t1 = eul._m1k_local(dPi, eul.thickq * thp)
        loc = loc + t1
        Ff = F.reshape(eul.nk, ops.nel, -1)
        # 4th slot = visc_p (unmeasured in this bisect variant)
        k2i_parts = jnp.stack([_dot_hp(Ff, t1), jnp.zeros(()), jnp.zeros(()),
                               jnp.zeros(())])
        uzb = 0.5 * (uz1 + uz2)
        dwb = 0.5 * (dwdx1 + dwdx2)
        vec = jax.vmap(ops.interp1_phys)(uzb - dwb)
        Fzp = vo.phys_int(Fz)
        contrib = jax.vmap(ops.rhs_P1_local)(vec * Fzp[..., None])
        z = jnp.zeros_like(contrib[:1])
        cp = jnp.concatenate([z, contrib, z], 0)
        loc = loc + 0.5 * (cp[:-1] + cp[1:])
        if eul.do_visc:
            lap = eul.laplacian_k(eul.laplacian_k(u_h))
            loc = loc + eul._m1k_local(lap, eul.thickq)
        return eul.scatter1k(loc), k2i_parts

    eul.momentum_rhs_ec = momentum_rhs_ec


def main():
    variant = sys.argv[1]
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ne = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    nk = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    dt = float(sys.argv[5]) if len(sys.argv) > 5 else 120.0

    from mimsem_tpu.testcases import held_suarez
    eul, st5 = held_suarez.build(ne=ne, p=3, nk=nk, dt=dt, dtype=jnp.float64)
    eul.hs_forcing = False
    if variant == "vplain":
        patch_vplain(eul)
    elif variant == "hplain":
        patch_hplain(eul)
    elif variant == "vh":
        patch_vplain(eul)
        patch_hplain(eul)
    elif variant not in ("base", "strang"):
        raise SystemExit(f"unknown variant {variant}")
    print(f"variant={variant} ne={ne} nk={nk} dt={dt}", flush=True)

    if variant == "strang":
        st = st5[:5] + (st5[0],)
    else:
        st = eul.init_state_ec(*st5[:5])
    e_prev = None
    for i in range(nsteps):
        if variant == "strang":
            st = eul.step(st, first=(i == 0))
        else:
            st, aux = eul.step_ec(st, first=(i == 0))
        e = {k: float(v) for k, v in eul.energetics_ec(*st[:5]).items()}
        tot = e["keh"] + e["kev"] + e["pe"] + e["ie"]
        line = f"[{i:3d}] keh {e['keh']:.6e} ie {e['ie']:.8e}"
        if e_prev is not None:
            line += f"  dEtot/E {(tot - e_prev) / abs(tot):+.3e}"
        e_prev = tot
        print(line, flush=True)


if __name__ == "__main__":
    main()
