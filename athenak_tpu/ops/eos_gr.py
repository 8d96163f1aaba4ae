"""GR ideal-gas EOS on a stationary spacetime: c2p and p2c.

Parity target: the reference GR hydro EOS
(reference: src/eos/ideal_grhyd.cpp:50-260, ideal_c2p_hyd.hpp:251-333):
the GR c2p transforms (D, T^0_i, T^0_0+D) into boosted SR variables
(valid because sqrt(-g)=1 in CKS), reuses the SR Galeazzi root find, then
applies the Lorentz-factor ceiling and horizon excision.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..indices import IDN, IEN, IM1, IM2, IM3, IVX, IVY, IVZ
from .eos import EOSData
from . import eos_sr


def _transform_to_sr(u, glower, gupper):
    """(reference: TransformToSRHyd, ideal_c2p_hyd.hpp:251-299)."""
    d = u[..., IDN, :, :, :]
    mx = u[..., IM1, :, :, :]
    my = u[..., IM2, :, :, :]
    mz = u[..., IM3, :, :, :]
    e = u[..., IEN, :, :, :]

    alpha = jnp.sqrt(-1.0 / gupper[0][0])
    d_sr = d * alpha
    e_sr = (gupper[0][0] * (e - d) + gupper[0][1] * mx
            + gupper[0][2] * my + gupper[0][3] * mz)
    e_sr = e_sr * (-1.0 / gupper[0][0]) - d_sr

    m1l, m2l, m3l = mx * alpha, my * alpha, mz * alpha
    g00 = gupper[0][0]

    def gamma_ij(i, j):
        return gupper[i][j] - gupper[0][i] * gupper[0][j] / g00

    mx_sr = gamma_ij(1, 1) * m1l + gamma_ij(1, 2) * m2l + gamma_ij(1, 3) * m3l
    my_sr = gamma_ij(2, 1) * m1l + gamma_ij(2, 2) * m2l + gamma_ij(2, 3) * m3l
    mz_sr = gamma_ij(3, 1) * m1l + gamma_ij(3, 2) * m2l + gamma_ij(3, 3) * m3l
    s2 = m1l * mx_sr + m2l * my_sr + m3l * mz_sr
    return d_sr, mx_sr, my_sr, mz_sr, e_sr, s2


def cons_to_prim_gr_hydro(u, eos: EOSData, glower, gupper,
                          excise_mask=None, dexcise=None, pexcise=None):
    """Vectorized GR hydro c2p (reference: ideal_grhyd.cpp:50-190)."""
    gm1 = eos.gamma - 1.0
    d_sr, mx_sr, my_sr, mz_sr, e_sr, s2 = _transform_to_sr(u, glower, gupper)

    # SR c2p core on the transformed state (Galeazzi et al.)
    dfloor_used = d_sr < eos.dfloor
    d_sr = jnp.maximum(d_sr, eos.dfloor)
    efloor0 = e_sr < eos.pfloor / gm1
    e_sr = jnp.maximum(e_sr, eos.pfloor / gm1)
    s2 = jnp.maximum(s2, 0.0)

    kmax = 2.0 * eos_sr._VMAX / (1.0 + eos_sr._VMAX ** 2)
    q = e_sr / d_sr
    r = jnp.sqrt(s2) / d_sr
    kk = jnp.minimum(kmax, r / (1.0 + q))
    zm = 0.5 * kk / jnp.sqrt(1.0 - 0.25 * kk * kk)
    zp = kk / jnp.sqrt(jnp.maximum(1.0 - kk * kk, 1.0e-30))
    f = lambda z: eos_sr._eq_c22(z, d_sr, q, r, eos)  # noqa: E731
    z, done = eos_sr._illinois(f, zm, zp, f(zm), f(zp))
    c2p_failure = ~done

    lor = jnp.sqrt(1.0 + z * z)
    dens = jnp.maximum(d_sr / lor, eos.dfloor)
    eps = lor * q - z * r + (z * z) / (1.0 + lor)
    epsmin = jnp.maximum(eos.pfloor / (dens * gm1),
                         eos.sfloor * dens ** gm1 / gm1)
    efloor_used = eps <= epsmin
    eps = jnp.maximum(eps, epsmin)
    h = 1.0 + eos.gamma * eps
    conv = 1.0 / h

    wd = jnp.where(c2p_failure, eos.dfloor, dens)
    we = jnp.where(c2p_failure, eos.pfloor / gm1, dens * eps)
    wvx = jnp.where(c2p_failure, 0.0, conv * (mx_sr / d_sr))
    wvy = jnp.where(c2p_failure, 0.0, conv * (my_sr / d_sr))
    wvz = jnp.where(c2p_failure, 0.0, conv * (mz_sr / d_sr))

    # velocity (Lorentz) ceiling (reference: ideal_grhyd.cpp:133-146)
    tmp = (glower[1][1] * wvx * wvx + glower[2][2] * wvy * wvy
           + glower[3][3] * wvz * wvz
           + 2.0 * (glower[1][2] * wvx * wvy + glower[1][3] * wvx * wvz
                    + glower[2][3] * wvy * wvz))
    lor_w = jnp.sqrt(1.0 + jnp.maximum(tmp, 0.0))
    vceil = lor_w > eos.gamma_max
    factor = jnp.sqrt((eos.gamma_max ** 2 - 1.0)
                      / jnp.maximum(lor_w ** 2 - 1.0, 1.0e-300))
    wvx = jnp.where(vceil, wvx * factor, wvx)
    wvy = jnp.where(vceil, wvy * factor, wvy)
    wvz = jnp.where(vceil, wvz * factor, wvz)

    # horizon excision (reference: ideal_grhyd.cpp:104-119)
    if excise_mask is not None:
        wd = jnp.where(excise_mask, dexcise, wd)
        we = jnp.where(excise_mask, pexcise / gm1, we)
        wvx = jnp.where(excise_mask, 0.0, wvx)
        wvy = jnp.where(excise_mask, 0.0, wvy)
        wvz = jnp.where(excise_mask, 0.0, wvz)

    w = u.at[..., IDN, :, :, :].set(wd)
    w = w.at[..., IVX, :, :, :].set(wvx)
    w = w.at[..., IVY, :, :, :].set(wvy)
    w = w.at[..., IVZ, :, :, :].set(wvz)
    w = w.at[..., IEN, :, :, :].set(we)

    nfluid = 5
    if u.shape[-4] > nfluid:
        s = u[..., nfluid:, :, :, :]
        w = w.at[..., nfluid:, :, :, :].set(s / d_sr[..., None, :, :, :])

    fixed = dfloor_used | efloor_used | efloor0 | vceil | c2p_failure
    if excise_mask is not None:
        fixed = fixed | excise_mask
    u_fail = prim_to_cons_gr_hydro(w, eos, glower, gupper)
    u_fixed = jnp.where(fixed[..., None, :, :, :], u_fail, u)

    counters = {
        "neos_dfloor": jnp.sum(dfloor_used),
        "neos_efloor": jnp.sum(efloor_used | efloor0),
        "neos_vceil": jnp.sum(vceil),
        "nc2p_fail": jnp.sum(c2p_failure),
    }
    return w, u_fixed, counters


def prim_to_cons_gr_hydro(w, eos: EOSData, glower, gupper):
    """(reference: SingleP2C_IdealGRHyd, ideal_c2p_hyd.hpp:305-333)."""
    gam = eos.gamma
    d = w[..., IDN, :, :, :]
    wvx = w[..., IVX, :, :, :]
    wvy = w[..., IVY, :, :, :]
    wvz = w[..., IVZ, :, :, :]
    e = w[..., IEN, :, :, :]

    q = (glower[1][1] * wvx * wvx + glower[2][2] * wvy * wvy
         + glower[3][3] * wvz * wvz
         + 2.0 * (glower[1][2] * wvx * wvy + glower[1][3] * wvx * wvz
                  + glower[2][3] * wvy * wvz))
    alpha = jnp.sqrt(-1.0 / gupper[0][0])
    gamma = jnp.sqrt(1.0 + q)
    u0 = gamma / alpha
    u1 = wvx - alpha * gamma * gupper[0][1]
    u2 = wvy - alpha * gamma * gupper[0][2]
    u3 = wvz - alpha * gamma * gupper[0][3]

    def lower(mu):
        return (glower[mu][0] * u0 + glower[mu][1] * u1
                + glower[mu][2] * u2 + glower[mu][3] * u3)

    u_0, u_1, u_2, u_3 = lower(0), lower(1), lower(2), lower(3)
    wgas_u0 = (d + gam * e) * u0

    D = d * u0
    u = w.at[..., IDN, :, :, :].set(D)
    u = u.at[..., IM1, :, :, :].set(wgas_u0 * u_1)
    u = u.at[..., IM2, :, :, :].set(wgas_u0 * u_2)
    u = u.at[..., IM3, :, :, :].set(wgas_u0 * u_3)
    u = u.at[..., IEN, :, :, :].set(wgas_u0 * u_0 + (gam - 1.0) * e + D)

    nfluid = 5
    if w.shape[-4] > nfluid:
        s = w[..., nfluid:, :, :, :]
        u = u.at[..., nfluid:, :, :, :].set(s * D[..., None, :, :, :])
    return u


# ------------------------------------------------------------------ GR MHD
def _transform_to_sr_mhd(u, bcc, glower, gupper):
    """(reference: TransformToSRMHD, ideal_c2p_mhd.hpp:320-379)."""
    d = u[..., IDN, :, :, :]
    mx = u[..., IM1, :, :, :]
    my = u[..., IM2, :, :, :]
    mz = u[..., IM3, :, :, :]
    e = u[..., IEN, :, :, :]
    bx = bcc[..., 0, :, :, :]
    by = bcc[..., 1, :, :, :]
    bz = bcc[..., 2, :, :, :]

    alpha = jnp.sqrt(-1.0 / gupper[0][0])
    d_sr = d * alpha
    e_sr = (gupper[0][0] * (e - d) + gupper[0][1] * mx
            + gupper[0][2] * my + gupper[0][3] * mz)
    e_sr = e_sr * (-1.0 / gupper[0][0]) - d_sr

    m1l, m2l, m3l = mx * alpha, my * alpha, mz * alpha
    g00 = gupper[0][0]

    def gamma_ij(i, j):
        return gupper[i][j] - gupper[0][i] * gupper[0][j] / g00

    mx_sr = gamma_ij(1, 1) * m1l + gamma_ij(1, 2) * m2l + gamma_ij(1, 3) * m3l
    my_sr = gamma_ij(2, 1) * m1l + gamma_ij(2, 2) * m2l + gamma_ij(2, 3) * m3l
    mz_sr = gamma_ij(3, 1) * m1l + gamma_ij(3, 2) * m2l + gamma_ij(3, 3) * m3l
    s2 = m1l * mx_sr + m2l * my_sr + m3l * mz_sr

    bx_sr, by_sr, bz_sr = alpha * bx, alpha * by, alpha * bz
    b2 = (glower[1][1] * bx_sr ** 2 + glower[2][2] * by_sr ** 2
          + glower[3][3] * bz_sr ** 2
          + 2.0 * (bx_sr * (glower[1][2] * by_sr + glower[1][3] * bz_sr)
                   + glower[2][3] * by_sr * bz_sr))
    rpar = (bx_sr * m1l + by_sr * m2l + bz_sr * m3l) / d_sr
    return d_sr, mx_sr, my_sr, mz_sr, e_sr, s2, bx_sr, by_sr, bz_sr, b2, rpar


def cons_to_prim_gr_mhd(u, bcc, eos: EOSData, glower, gupper,
                        excise_mask=None, dexcise=None, pexcise=None):
    """Vectorized GR MHD c2p: transform to boosted SR + Kastaun root find
    (reference: src/eos/ideal_grmhd.cpp; Kastaun et al. 2021)."""
    gm1 = eos.gamma - 1.0
    (d, mx, my, mz, tau, s2, bx, by, bz, b2_raw, rpar_raw) = \
        _transform_to_sr_mhd(u, bcc, glower, gupper)

    dfloor_eff = jnp.maximum(eos.dfloor, b2_raw / eos.sigma_max)
    dfloor_used = d < dfloor_eff
    d = jnp.maximum(d, dfloor_eff)
    efloor0 = tau < (eos.pfloor / gm1 + 0.5 * b2_raw)
    tau = jnp.maximum(tau, eos.pfloor / gm1 + 0.5 * b2_raw)
    s2 = jnp.maximum(s2, 0.0)

    q = tau / d
    r = jnp.sqrt(s2) / d
    isqrtd = 1.0 / jnp.sqrt(d)
    b2 = b2_raw / d
    rpar = rpar_raw * isqrtd

    zm = jnp.zeros_like(d)
    zp = jnp.ones_like(d)
    f49 = lambda z: eos_sr._eq49(z, b2, rpar, r)  # noqa: E731
    mu_up, done1 = eos_sr._illinois(f49, zm, zp, f49(zm), f49(zp))
    f44 = lambda z: eos_sr._eq44(z, b2, rpar, r, q, d, eos)  # noqa: E731
    zm2 = jnp.zeros_like(d)
    mu, done2 = eos_sr._illinois(f44, zm2, mu_up, f44(zm2), f44(mu_up))
    c2p_failure = ~(done1 & done2)

    x = 1.0 / (1.0 + mu * b2)
    rbar = x * x * r * r + mu * x * (1.0 + x) * rpar * rpar
    qbar = q - 0.5 * b2 - 0.5 * (mu * mu * (b2 * rbar - rpar * rpar))
    z2 = mu * mu * rbar / jnp.abs(1.0 - mu * mu * rbar)
    lor = jnp.sqrt(1.0 + z2)

    dens = jnp.maximum(d / lor, dfloor_eff)
    eps = lor * (qbar - mu * rbar) + z2 / (lor + 1.0)
    epsmin = jnp.maximum(eos.pfloor / (dens * gm1),
                         eos.sfloor * dens ** gm1 / gm1)
    efloor_used = eps <= epsmin
    eps = jnp.maximum(eps, epsmin)
    h = 1.0 + eos.gamma * eps
    conv = lor / (h * lor + b2)

    bxn, byn, bzn = bx * isqrtd, by * isqrtd, bz * isqrtd
    wd = jnp.where(c2p_failure, dfloor_eff, dens)
    we = jnp.where(c2p_failure, eos.pfloor / gm1, dens * eps)
    wvx = jnp.where(c2p_failure, 0.0,
                    conv * (mx / d + bxn * rpar / (h * lor)))
    wvy = jnp.where(c2p_failure, 0.0,
                    conv * (my / d + byn * rpar / (h * lor)))
    wvz = jnp.where(c2p_failure, 0.0,
                    conv * (mz / d + bzn * rpar / (h * lor)))

    # Lorentz ceiling
    tmp = (glower[1][1] * wvx * wvx + glower[2][2] * wvy * wvy
           + glower[3][3] * wvz * wvz
           + 2.0 * (glower[1][2] * wvx * wvy + glower[1][3] * wvx * wvz
                    + glower[2][3] * wvy * wvz))
    lor_w = jnp.sqrt(1.0 + jnp.maximum(tmp, 0.0))
    vceil = lor_w > eos.gamma_max
    factor = jnp.sqrt((eos.gamma_max ** 2 - 1.0)
                      / jnp.maximum(lor_w ** 2 - 1.0, 1.0e-300))
    wvx = jnp.where(vceil, wvx * factor, wvx)
    wvy = jnp.where(vceil, wvy * factor, wvy)
    wvz = jnp.where(vceil, wvz * factor, wvz)

    if excise_mask is not None:
        wd = jnp.where(excise_mask, dexcise, wd)
        we = jnp.where(excise_mask, pexcise / gm1, we)
        wvx = jnp.where(excise_mask, 0.0, wvx)
        wvy = jnp.where(excise_mask, 0.0, wvy)
        wvz = jnp.where(excise_mask, 0.0, wvz)

    w = u.at[..., IDN, :, :, :].set(wd)
    w = w.at[..., IVX, :, :, :].set(wvx)
    w = w.at[..., IVY, :, :, :].set(wvy)
    w = w.at[..., IVZ, :, :, :].set(wvz)
    w = w.at[..., IEN, :, :, :].set(we)

    nfluid = 5
    if u.shape[-4] > nfluid:
        s = u[..., nfluid:, :, :, :]
        w = w.at[..., nfluid:, :, :, :].set(s / d[..., None, :, :, :])

    fixed = dfloor_used | efloor0 | efloor_used | vceil | c2p_failure
    if excise_mask is not None:
        fixed = fixed | excise_mask
    u_fail = prim_to_cons_gr_mhd(w, bcc, eos, glower, gupper)
    u_fixed = jnp.where(fixed[..., None, :, :, :], u_fail, u)

    counters = {
        "neos_dfloor": jnp.sum(dfloor_used),
        "neos_efloor": jnp.sum(efloor_used | efloor0),
        "neos_vceil": jnp.sum(vceil),
        "nc2p_fail": jnp.sum(c2p_failure),
    }
    return w, u_fixed, counters


def prim_to_cons_gr_mhd(w, bcc, eos: EOSData, glower, gupper):
    """(reference: SingleP2C_IdealGRMHD, ideal_c2p_mhd.hpp:386-426)."""
    gam = eos.gamma
    d = w[..., IDN, :, :, :]
    wvx = w[..., IVX, :, :, :]
    wvy = w[..., IVY, :, :, :]
    wvz = w[..., IVZ, :, :, :]
    e = w[..., IEN, :, :, :]
    bx = bcc[..., 0, :, :, :]
    by = bcc[..., 1, :, :, :]
    bz = bcc[..., 2, :, :, :]

    q = (glower[1][1] * wvx * wvx + glower[2][2] * wvy * wvy
         + glower[3][3] * wvz * wvz
         + 2.0 * (glower[1][2] * wvx * wvy + glower[1][3] * wvx * wvz
                  + glower[2][3] * wvy * wvz))
    alpha = jnp.sqrt(-1.0 / gupper[0][0])
    gamma = jnp.sqrt(1.0 + q)
    u0 = gamma / alpha
    u1 = wvx - alpha * gamma * gupper[0][1]
    u2 = wvy - alpha * gamma * gupper[0][2]
    u3 = wvz - alpha * gamma * gupper[0][3]

    def lower(v0, v1, v2, v3, mu):
        return (glower[mu][0] * v0 + glower[mu][1] * v1
                + glower[mu][2] * v2 + glower[mu][3] * v3)

    u_0 = lower(u0, u1, u2, u3, 0)
    u_1 = lower(u0, u1, u2, u3, 1)
    u_2 = lower(u0, u1, u2, u3, 2)
    u_3 = lower(u0, u1, u2, u3, 3)

    b0 = u_1 * bx + u_2 * by + u_3 * bz
    b1 = (bx + b0 * u1) / u0
    b2_ = (by + b0 * u2) / u0
    b3 = (bz + b0 * u3) / u0
    b_0 = lower(b0, b1, b2_, b3, 0)
    b_1 = lower(b0, b1, b2_, b3, 1)
    b_2 = lower(b0, b1, b2_, b3, 2)
    b_3 = lower(b0, b1, b2_, b3, 3)
    b_sq = b0 * b_0 + b1 * b_1 + b2_ * b_2 + b3 * b_3

    wtot = d + gam * e + b_sq
    ptot = (gam - 1.0) * e + 0.5 * b_sq
    D = d * u0
    u = w.at[..., IDN, :, :, :].set(D)
    u = u.at[..., IM1, :, :, :].set(wtot * u0 * u_1 - b0 * b_1)
    u = u.at[..., IM2, :, :, :].set(wtot * u0 * u_2 - b0 * b_2)
    u = u.at[..., IM3, :, :, :].set(wtot * u0 * u_3 - b0 * b_3)
    u = u.at[..., IEN, :, :, :].set(wtot * u0 * u_0 - b0 * b_0 + ptot + D)

    nfluid = 5
    if w.shape[-4] > nfluid:
        s = w[..., nfluid:, :, :, :]
        u = u.at[..., nfluid:, :, :, :].set(s * D[..., None, :, :, :])
    return u
