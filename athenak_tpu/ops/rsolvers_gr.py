"""Riemann solvers for GR hydrodynamics on a stationary spacetime.

Numerically equivalent to the reference per-face solvers
(reference: src/hydro/rsolvers/{llf,hlle}_grhyd.hpp), vectorized with the
face metric supplied as nested 4x4 component arrays (computed on the fly
from Cartesian Kerr-Schild coordinates; sqrt(-g) = 1 in CKS).

Conventions: primitives are (rho, utilde^i, e) where utilde^i =
u^i + alpha gamma g^{0i}; conserved are (D, T^0_i, T^0_0 + D); fluxes
returned are of those conserved variables.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import IDN, IEN, IVX, IVY, IVZ
from .eos import EOSData


def _vel_idx(ivx: int):
    ivy = IVX + ((ivx - IVX) + 1) % 3
    ivz = IVX + ((ivx - IVX) + 2) % 3
    return ivy, ivz


def gr_sound_speeds(eos: EOSData, d, p, u0, u1, g00, g01, g11):
    """Characteristic speeds along one axis
    (reference: IdealGRHydroSoundSpeeds, eos.hpp:127-158)."""
    cs_sq = eos.gamma * p / (d + eos.gamma * p / (eos.gamma - 1.0))
    a = u0 * u0 - (g00 + u0 * u0) * cs_sq
    b = -2.0 * (u0 * u1 - (g01 + u0 * u1) * cs_sq)
    c = u1 * u1 - (g11 + u1 * u1) * cs_sq
    dis = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    ds = jnp.sqrt(dis)
    r1 = (-b + ds) / (2.0 * a)
    r2 = (-b - ds) / (2.0 * a)
    return jnp.maximum(r1, r2), jnp.minimum(r1, r2)


def _four_velocity(w, glower, gupper, ivx):
    """Contravariant u^mu and covariant u_mu from utilde primitives
    (reference: hlle_grhyd.hpp:80-130)."""
    ivy, ivz = _vel_idx(ivx)
    wv = {1: w[..., IVX, :, :, :], 2: w[..., IVY, :, :, :],
          3: w[..., IVZ, :, :, :]}
    q = None
    for i in (1, 2, 3):
        for j in (1, 2, 3):
            t = glower[i][j] * wv[i] * wv[j]
            q = t if q is None else q + t
    alpha = jnp.sqrt(-1.0 / gupper[0][0])
    gam = jnp.sqrt(1.0 + q)
    uu = {0: gam / alpha}
    for i in (1, 2, 3):
        uu[i] = wv[i] - alpha * gam * gupper[0][i]
    ul = {}
    for mu in (0, 1, 2, 3):
        s = None
        for nu in (0, 1, 2, 3):
            t = glower[mu][nu] * uu[nu]
            s = t if s is None else s + t
        ul[mu] = s
    return uu, ul


def _cons_flux_gr(w, eos, uu, ul, ivx):
    ivy, ivz = _vel_idx(ivx)
    rho = w[..., IDN, :, :, :]
    p = eos.pressure(w[..., IEN, :, :, :])
    gp = eos.gamma / (eos.gamma - 1.0)
    wgas = rho + gp * p
    qa = wgas * uu[0]
    # cons: (D, T^0_x, T^0_y, T^0_z, T^0_0 [+p term])
    cons = (rho * uu[0], qa * ul[ivx - IVX + 1], qa * ul[ivy - IVX + 1],
            qa * ul[ivz - IVX + 1], qa * ul[0] + p)
    qf = wgas * uu[ivx - IVX + 1]
    flux = (rho * uu[ivx - IVX + 1], qf * ul[ivx - IVX + 1] + p,
            qf * ul[ivy - IVX + 1], qf * ul[ivz - IVX + 1], qf * ul[0])
    return cons, flux, p


def _pack_gr(template, ivx, f):
    ivy, ivz = _vel_idx(ivx)
    flx = jnp.zeros_like(template)
    flx = flx.at[..., IDN, :, :, :].set(f[0])
    flx = flx.at[..., ivx, :, :, :].set(f[1])
    flx = flx.at[..., ivy, :, :, :].set(f[2])
    flx = flx.at[..., ivz, :, :, :].set(f[3])
    # we evolve tau = T^0_0 + D (reference: hlle_grhyd.hpp:204)
    flx = flx.at[..., IEN, :, :, :].set(f[4] + f[0])
    return flx


def llf_gr(wl, wr, eos: EOSData, ivx: int, glower, gupper):
    """(reference: src/hydro/rsolvers/llf_grhyd.hpp)."""
    uul, ull = _four_velocity(wl, glower, gupper, ivx)
    uur, ulr = _four_velocity(wr, glower, gupper, ivx)
    consl, fluxl, pl = _cons_flux_gr(wl, eos, uul, ull, ivx)
    consr, fluxr, pr = _cons_flux_gr(wr, eos, uur, ulr, ivx)
    ax = ivx - IVX + 1
    g00, g01, g11 = gupper[0][0], gupper[0][ax], gupper[ax][ax]
    lp_l, lm_l = gr_sound_speeds(eos, wl[..., IDN, :, :, :], pl,
                                 uul[0], uul[ax], g00, g01, g11)
    lp_r, lm_r = gr_sound_speeds(eos, wr[..., IDN, :, :, :], pr,
                                 uur[0], uur[ax], g00, g01, g11)
    lam = jnp.maximum(jnp.maximum(lp_l, lp_r),
                      -jnp.minimum(lm_l, lm_r))
    out = tuple(0.5 * (fl + fr - lam * (cr - cl))
                for fl, fr, cl, cr in zip(fluxl, fluxr, consl, consr))
    return _pack_gr(wl, ivx, out)


def hlle_gr(wl, wr, eos: EOSData, ivx: int, glower, gupper):
    """(reference: src/hydro/rsolvers/hlle_grhyd.hpp:25-205)."""
    uul, ull = _four_velocity(wl, glower, gupper, ivx)
    uur, ulr = _four_velocity(wr, glower, gupper, ivx)
    consl, fluxl, pl = _cons_flux_gr(wl, eos, uul, ull, ivx)
    consr, fluxr, pr = _cons_flux_gr(wr, eos, uur, ulr, ivx)
    ax = ivx - IVX + 1
    g00, g01, g11 = gupper[0][0], gupper[0][ax], gupper[ax][ax]
    lp_l, lm_l = gr_sound_speeds(eos, wl[..., IDN, :, :, :], pl,
                                 uul[0], uul[ax], g00, g01, g11)
    lp_r, lm_r = gr_sound_speeds(eos, wr[..., IDN, :, :, :], pr,
                                 uur[0], uur[ax], g00, g01, g11)
    lam_l = jnp.minimum(lm_l, lm_r)
    lam_r = jnp.maximum(lp_l, lp_r)
    qa = lam_r * lam_l
    qb = 1.0 / (lam_r - lam_l + 1.0e-300)
    out = []
    for fl, fr, cl, cr in zip(fluxl, fluxr, consl, consr):
        hll = (lam_r * fl - lam_l * fr + qa * (cr - cl)) * qb
        out.append(jnp.where(lam_l >= 0.0, fl,
                             jnp.where(lam_r <= 0.0, fr, hll)))
    return _pack_gr(wl, ivx, tuple(out))


GR_HYDRO_RSOLVER_FNS = {"llf": llf_gr, "hlle": hlle_gr}
