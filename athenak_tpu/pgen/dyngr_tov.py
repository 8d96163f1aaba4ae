"""TOV star initial data for dynamical GRMHD.

Parity target: reference src/pgen/dyn_grmhd/tov.cpp with the TOV ODE
solver from src/utils/tov/ — a static spherical star in isotropic
coordinates (conformally flat spatial metric gamma_ij = psi^4 delta_ij),
either on a fixed ADM background (<mhd>+<adm>) or fully coupled to Z4c
(<mhd>+<z4c>).  Optional interior poloidal seed field like the
reference's mag_tov deck (A_phi ~ max(P - pcut, 0)^np).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils_tov import PolytropeEOS, TOVStar


def init(pin, mesh, phys):
    rhoc = pin.get_or_add_real("problem", "rhoc", 1.28e-3)
    kappa = pin.get_or_add_real("problem", "kappa", 100.0)
    gamma = pin.get_or_add_real("problem", "gamma", 2.0)
    dr = pin.get_or_add_real("problem", "dr", 1e-3)
    d_atm = pin.get_or_add_real("mhd", "dfloor", 1e-12)
    p_atm = pin.get_or_add_real("mhd", "pfloor", 1e-15)

    # cold EOS for the background star: the evolution EOS (phys.policy)
    # may be the matching piecewise polytrope or a Gamma-law
    from ..eos_ps.policies import PiecewisePolytropePS
    if isinstance(phys.policy, PiecewisePolytropePS):
        eos = phys.policy
    else:
        eos = PolytropeEOS(kappa=kappa, gamma=gamma)
    tov = TOVStar(eos, rhoc=rhoc, dr=dr)
    # stash for tests / user callbacks
    phys.tov = tov

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    shp = (nmb, mbi.ncells3, mbi.ncells2, mbi.ncells1)
    rho = np.empty(shp)
    P = np.empty(shp)
    alp = np.empty(shp)
    psi4 = np.empty(shp)
    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        X1 = x1v[None, None, :]
        X2 = x2v[None, :, None]
        X3 = x3v[:, None, None]
        r = np.sqrt(np.broadcast_to(X1 ** 2 + X2 ** 2 + X3 ** 2,
                                    shp[1:]))
        rg, pg, _m, ag, p4g = tov.sample_iso(r.ravel())
        rho[gid] = rg.reshape(shp[1:])
        P[gid] = pg.reshape(shp[1:])
        alp[gid] = ag.reshape(shp[1:])
        psi4[gid] = p4g.reshape(shp[1:])

    rho = np.maximum(rho, d_atm)
    P = np.maximum(P, p_atm)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w = np.zeros((nmb, 5) + shp[1:])
    w[:, 0] = rho
    w[:, 4] = P
    wj = jnp.asarray(w, dtype=dtype)

    # optional interior seed field via vector potential
    # A_phi = b_amp * max(P - pcut, 0)^np (reference: mag_tov.athinput)
    b_amp = pin.get_or_add_real("problem", "b_norm", 0.0)
    bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
    if b_amp != 0.0:
        pcut = pin.get_or_add_real("problem", "pcut", 1e-6)
        npow = pin.get_or_add_real("problem", "magindex", 2.0)

        def a_pot(x, y, z):
            rr = np.sqrt(x * x + y * y + z * z)
            pp, _ = _interp_p(tov, rr)
            am = b_amp * np.maximum(pp - pcut, 0.0) ** npow
            return -am * y, am * x  # (A_x, A_y); A_z = 0

        def _interp_p(tov, rr):
            _, p_, _, _, _ = tov.sample_iso(rr.ravel())
            return p_.reshape(rr.shape), None

        for gid in range(nmb):
            x1f, x2f, x3f = mesh.face_edges(gid)
            x1v, x2v, x3v = mesh.cell_centers(gid)
            d2, d3 = mesh.mesh_size.dx2, mesh.mesh_size.dx3
            d1 = mesh.mesh_size.dx1
            # B = curl A on the staggered mesh via edge differences
            # B1 on x1-faces: dA_z/dy - dA_y/dz = -dA_y/dz
            X, Y, Z = np.meshgrid(x1f, x2v, x3v, indexing="ij")
            ax, ay = a_pot(X, Y, Z + 0.5 * d3)
            ax2, ay2 = a_pot(X, Y, Z - 0.5 * d3)
            bfc["x1f"][gid] = (-(ay - ay2) / d3).transpose(2, 1, 0)
            # B2 on x2-faces: dA_x/dz
            X, Y, Z = np.meshgrid(x1v, x2f, x3v, indexing="ij")
            ax, ay = a_pot(X, Y, Z + 0.5 * d3)
            ax2, ay2 = a_pot(X, Y, Z - 0.5 * d3)
            bfc["x2f"][gid] = ((ax - ax2) / d3).transpose(2, 1, 0)
            # B3 on x3-faces: dA_y/dx - dA_x/dy
            X, Y, Z = np.meshgrid(x1v, x2v, x3f, indexing="ij")
            ayp = a_pot(X + 0.5 * d1, Y, Z)[1]
            aym = a_pot(X - 0.5 * d1, Y, Z)[1]
            axp = a_pot(X, Y + 0.5 * d2, Z)[0]
            axm = a_pot(X, Y - 0.5 * d2, Z)[0]
            bfc["x3f"][gid] = ((ayp - aym) / d1
                               - (axp - axm) / d2).transpose(2, 1, 0)
    bfc = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
    bcc = phys.compute_bcc(bfc)

    one = np.ones(shp)
    zero = np.zeros(shp)
    g3d = [psi4 * one, zero, zero, psi4 * one, zero, psi4 * one]

    if phys.fixed_evolution:
        phys.set_fixed_adm(g3d, alp, [zero, zero, zero])
        adm = phys.adm_of({})
        z = None
    else:
        from ..z4c.z4c import (I_ALPHA, I_CHI, I_GXX, I_GYY, I_GZZ, NZ4C)
        npow_chi = phys.z4c.opt.chi_psi_power
        zst = np.zeros((nmb, NZ4C) + shp[1:])
        zst[:, I_CHI] = psi4 ** (npow_chi / 4.0)
        zst[:, I_GXX] = 1.0
        zst[:, I_GYY] = 1.0
        zst[:, I_GZZ] = 1.0
        zst[:, I_ALPHA] = alp
        z = jnp.asarray(zst, dtype=dtype)
        adm = {"g3d": [jnp.asarray(c, dtype=dtype) for c in g3d],
               "alpha": jnp.asarray(alp, dtype=dtype),
               "beta_u": [jnp.zeros(shp, dtype=dtype)] * 3,
               "K_dd": [jnp.zeros(shp, dtype=dtype)] * 6}

    n = wj[:, 0] / phys.ps.mb
    T = phys.policy.temperature_from_p(jnp.maximum(n, phys.ps.n_atm),
                                       wj[:, 4])
    u = phys.prim_to_cons_state(wj, T, bcc, adm)
    return phys.make_state(u, wj, bfc, T=T, z=z)
