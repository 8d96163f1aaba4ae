"""Riemann solvers for Newtonian hydrodynamics: LLF, HLLE, HLLC, Roe.

Numerically equivalent to the reference per-face inline solvers
(reference: src/hydro/rsolvers/{llf,hlle,hllc,roe}_hyd.hpp), vectorized over
whole face arrays.  L/R input states are primitives with IEN = internal
energy density; solvers return conserved-variable fluxes.

Channel layout: arrays are [..., nvar, nz, ny, nx]; ``ivx`` in {1,2,3}
selects the face-normal direction, and the transverse velocity slots are
cyclic permutations exactly as in the reference templates.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..indices import IDN, IEN, IVX
from .eos import EOSData

_TINY = 1.0e-20


def _vel_idx(ivx: int) -> Tuple[int, int]:
    ivy = IVX + ((ivx - IVX) + 1) % 3
    ivz = IVX + ((ivx - IVX) + 2) % 3
    return ivy, ivz


def _unpack(w, eos: EOSData, ivx: int):
    """Return (d, vx, vy, vz, p) channel views with direction mapping."""
    ivy, ivz = _vel_idx(ivx)
    d = w[..., IDN, :, :, :]
    vx = w[..., ivx, :, :, :]
    vy = w[..., ivy, :, :, :]
    vz = w[..., ivz, :, :, :]
    p = eos.pressure(w[..., IEN, :, :, :]) if eos.is_ideal else None
    return d, vx, vy, vz, p


def _pack_flux(template, eos: EOSData, ivx: int, fd, fmx, fmy, fmz, fe):
    """Single-stack channel assembly (one fusable concatenate instead of
    a chain of scatter updates)."""
    ivy, ivz = _vel_idx(ivx)
    mom = {ivx: fmx, ivy: fmy, ivz: fmz}
    chans = [fd, mom[1], mom[2], mom[3]]
    if eos.is_ideal:
        chans.append(fe)
    nvar = template.shape[-4]
    while len(chans) < nvar:
        chans.append(jnp.zeros_like(fd))  # scalar slots filled by caller
    return jnp.stack(chans, axis=-4)


# --------------------------------------------------------------------- LLF
def llf(wl, wr, eos: EOSData, ivx: int):
    """Local Lax-Friedrichs (reference SingleStateLLF_Hyd,
    src/hydro/rsolvers/llf_hyd_singlestate.hpp:28-78)."""
    dl, vxl, vyl, vzl, pl = _unpack(wl, eos, ivx)
    dr, vxr, vyr, vzr, pr = _unpack(wr, eos, ivx)

    qa = dl * vxl
    qb = dr * vxr
    fsum_d = qa + qb
    fsum_mx = qa * vxl + qb * vxr
    fsum_my = qa * vyl + qb * vyr
    fsum_mz = qa * vzl + qb * vzr

    if eos.is_ideal:
        el = wl[..., IEN, :, :, :] + 0.5 * dl * (vxl ** 2 + vyl ** 2 + vzl ** 2)
        er = wr[..., IEN, :, :, :] + 0.5 * dr * (vxr ** 2 + vyr ** 2 + vzr ** 2)
        fsum_mx = fsum_mx + (pl + pr)
        fsum_e = (el + pl) * vxl + (er + pr) * vxr
        cl = eos.hydro_sound_speed(dl, pl)
        cr = eos.hydro_sound_speed(dr, pr)
    else:
        fsum_mx = fsum_mx + eos.iso_cs ** 2 * (dl + dr)
        fsum_e = None
        cl = cr = eos.iso_cs

    a = jnp.maximum(jnp.abs(vxl) + cl, jnp.abs(vxr) + cr)

    fd = 0.5 * (fsum_d - a * (dr - dl))
    fmx = 0.5 * (fsum_mx - a * (dr * vxr - dl * vxl))
    fmy = 0.5 * (fsum_my - a * (dr * vyr - dl * vyl))
    fmz = 0.5 * (fsum_mz - a * (dr * vzr - dl * vzl))
    fe = 0.5 * (fsum_e - a * (er - el)) if eos.is_ideal else None
    return _pack_flux(wl, eos, ivx, fd, fmx, fmy, fmz, fe)


# -------------------------------------------------------------------- HLLE
def hlle(wl, wr, eos: EOSData, ivx: int):
    """HLLE with Roe-averaged wave-speed estimates
    (reference: src/hydro/rsolvers/hlle_hyd.hpp)."""
    dl, vxl, vyl, vzl, pl = _unpack(wl, eos, ivx)
    dr, vxr, vyr, vzr, pr = _unpack(wr, eos, ivx)

    sqrtdl = jnp.sqrt(dl)
    sqrtdr = jnp.sqrt(dr)
    isdlpdr = 1.0 / (sqrtdl + sqrtdr)
    vx_roe = (sqrtdl * vxl + sqrtdr * vxr) * isdlpdr
    vy_roe = (sqrtdl * vyl + sqrtdr * vyr) * isdlpdr
    vz_roe = (sqrtdl * vzl + sqrtdr * vzr) * isdlpdr

    if eos.is_ideal:
        gm1 = eos.gamma - 1.0
        el = pl / gm1 + 0.5 * dl * (vxl ** 2 + vyl ** 2 + vzl ** 2)
        er = pr / gm1 + 0.5 * dr * (vxr ** 2 + vyr ** 2 + vzr ** 2)
        hroe = ((el + pl) / sqrtdl + (er + pr) / sqrtdr) * isdlpdr
        cl = eos.hydro_sound_speed(dl, pl)
        cr = eos.hydro_sound_speed(dr, pr)
        a2 = hroe - 0.5 * (vx_roe ** 2 + vy_roe ** 2 + vz_roe ** 2)
        a = jnp.sqrt(gm1 * jnp.maximum(a2, 0.0))
    else:
        cl = cr = a = eos.iso_cs

    al = jnp.minimum(vx_roe - a, vxl - cl)
    ar = jnp.maximum(vx_roe + a, vxr + cr)
    bp = jnp.where(ar > 0.0, ar, _TINY)
    bm = jnp.where(al < 0.0, al, -_TINY)

    qa = vxl - bm
    qb = vxr - bp
    fl_d = dl * qa
    fr_d = dr * qb
    fl_mx = dl * vxl * qa
    fr_mx = dr * vxr * qb
    fl_my = dl * vyl * qa
    fr_my = dr * vyr * qb
    fl_mz = dl * vzl * qa
    fr_mz = dr * vzr * qb
    if eos.is_ideal:
        fl_mx = fl_mx + pl
        fr_mx = fr_mx + pr
        fl_e = el * qa + pl * vxl
        fr_e = er * qb + pr * vxr
    else:
        fl_mx = fl_mx + eos.iso_cs ** 2 * dl
        fr_mx = fr_mx + eos.iso_cs ** 2 * dr

    qa = jnp.where(bp != bm, 0.5 * (bp + bm) / (bp - bm), 0.0)

    fd = 0.5 * (fl_d + fr_d) + qa * (fl_d - fr_d)
    fmx = 0.5 * (fl_mx + fr_mx) + qa * (fl_mx - fr_mx)
    fmy = 0.5 * (fl_my + fr_my) + qa * (fl_my - fr_my)
    fmz = 0.5 * (fl_mz + fr_mz) + qa * (fl_mz - fr_mz)
    fe = 0.5 * (fl_e + fr_e) + qa * (fl_e - fr_e) if eos.is_ideal else None
    return _pack_flux(wl, eos, ivx, fd, fmx, fmy, fmz, fe)


# -------------------------------------------------------------------- HLLC
def hllc(wl, wr, eos: EOSData, ivx: int):
    """HLLC with PVRS wave-speed estimates (Toro 10.5.2)
    (reference: src/hydro/rsolvers/hllc_hyd.hpp). Ideal gas only."""
    if not eos.is_ideal:
        raise ValueError("HLLC requires an ideal-gas EOS")
    dl, vxl, vyl, vzl, pl = _unpack(wl, eos, ivx)
    dr, vxr, vyr, vzr, pr = _unpack(wr, eos, ivx)

    gm1 = eos.gamma - 1.0
    igm1 = 1.0 / gm1
    alpha = (eos.gamma + 1.0) / (2.0 * eos.gamma)

    cl = eos.hydro_sound_speed(dl, pl)
    cr = eos.hydro_sound_speed(dr, pr)
    el = pl * igm1 + 0.5 * dl * (vxl ** 2 + vyl ** 2 + vzl ** 2)
    er = pr * igm1 + 0.5 * dr * (vxr ** 2 + vyr ** 2 + vzr ** 2)

    # PVRS middle-state pressure estimate
    cbar = 0.25 * (dl + dr) * (cl + cr)
    pmid = 0.5 * (pl + pr + (vxl - vxr) * cbar)
    ql = jnp.where(pmid <= pl, 1.0,
                   jnp.sqrt(1.0 + alpha * (pmid / pl - 1.0)))
    qr = jnp.where(pmid <= pr, 1.0,
                   jnp.sqrt(1.0 + alpha * (pmid / pr - 1.0)))

    # extremal wave speeds
    al = vxl - cl * ql
    ar = vxr + cr * qr
    bp = jnp.where(ar > 0.0, ar, _TINY)
    bm = jnp.where(al < 0.0, al, -_TINY)

    # contact speed & pressure
    vxl_m = vxl - al
    vxr_m = vxr - ar
    tl = pl + vxl_m * dl * vxl
    tr = pr + vxr_m * dr * vxr
    ml = dl * vxl_m
    mr = -(dr * vxr_m)
    am = (tl - tr) / (ml + mr)
    cp = jnp.maximum((ml * tr + mr * tl) / (ml + mr), 0.0)

    # L/R fluxes along bm/bp
    qa = dl * (vxl - bm)
    qb = dr * (vxr - bp)
    fl_d, fr_d = qa, qb
    fl_mx = qa * vxl + pl
    fr_mx = qb * vxr + pr
    fl_my = qa * vyl
    fr_my = qb * vyr
    fl_mz = qa * vzl
    fr_mz = qb * vzr
    fl_e = el * (vxl - bm) + pl * vxl
    fr_e = er * (vxr - bp) + pr * vxr

    # flux weights by contact position
    pos = am >= 0.0
    wl_c = jnp.where(pos, am / (am - bm), 0.0)
    wr_c = jnp.where(pos, 0.0, -am / (bp - am))
    wc = jnp.where(pos, -bm / (am - bm), bp / (bp - am))

    fd = wl_c * fl_d + wr_c * fr_d
    fmx = wl_c * fl_mx + wr_c * fr_mx + wc * cp
    fmy = wl_c * fl_my + wr_c * fr_my
    fmz = wl_c * fl_mz + wr_c * fr_mz
    fe = wl_c * fl_e + wr_c * fr_e + wc * cp * am
    return _pack_flux(wl, eos, ivx, fd, fmx, fmy, fmz, fe)


# --------------------------------------------------------------------- Roe
def roe(wl, wr, eos: EOSData, ivx: int):
    """Roe's linearized solver with LLF fallback on negative intermediate
    density (reference: src/hydro/rsolvers/roe_hyd.hpp)."""
    dl, vxl, vyl, vzl, pl = _unpack(wl, eos, ivx)
    dr, vxr, vyr, vzr, pr = _unpack(wr, eos, ivx)

    sqrtdl = jnp.sqrt(dl)
    sqrtdr = jnp.sqrt(dr)
    isdlpdr = 1.0 / (sqrtdl + sqrtdr)
    v1 = (sqrtdl * vxl + sqrtdr * vxr) * isdlpdr
    v2 = (sqrtdl * vyl + sqrtdr * vyr) * isdlpdr
    v3 = (sqrtdl * vzl + sqrtdr * vzr) * isdlpdr

    mxl = dl * vxl
    mxr = dr * vxr
    fl_d, fr_d = mxl, mxr
    fl_mx = mxl * vxl
    fr_mx = mxr * vxr
    fl_my = mxl * vyl
    fr_my = mxr * vyr
    fl_mz = mxl * vzl
    fr_mz = mxr * vzr

    du0 = dr - dl
    du1 = dr * vxr - dl * vxl
    du2 = dr * vyr - dl * vyl
    du3 = dr * vzr - dl * vzl

    if eos.is_ideal:
        gm1 = eos.gamma - 1.0
        el = pl / gm1 + 0.5 * dl * (vxl ** 2 + vyl ** 2 + vzl ** 2)
        er = pr / gm1 + 0.5 * dr * (vxr ** 2 + vyr ** 2 + vzr ** 2)
        h = ((el + pl) / sqrtdl + (er + pr) / sqrtdr) * isdlpdr
        fl_mx = fl_mx + pl
        fr_mx = fr_mx + pr
        fl_e = (el + pl) * vxl
        fr_e = (er + pr) * vxr
        du4 = er - el

        vsq = v1 * v1 + v2 * v2 + v3 * v3
        q = h - 0.5 * vsq
        cs_sq = jnp.where(q < 0.0, jnp.finfo(jnp.float32).tiny, gm1 * q)
        cs = jnp.sqrt(cs_sq)

        ev0 = v1 - cs
        ev4 = v1 + cs

        na = 0.5 / cs_sq
        a0 = na * (du0 * (0.5 * gm1 * vsq + v1 * cs)
                   - du1 * (gm1 * v1 + cs) - du2 * gm1 * v2
                   - du3 * gm1 * v3 + du4 * gm1)
        a1 = du0 * (-v2) + du2
        a2 = du0 * (-v3) + du3
        qa = gm1 / cs_sq
        a3 = (du0 * (1.0 - na * gm1 * vsq) + du1 * qa * v1 + du2 * qa * v2
              + du3 * qa * v3 - du4 * qa)
        a4 = na * (du0 * (0.5 * gm1 * vsq - v1 * cs)
                   - du1 * (gm1 * v1 - cs) - du2 * gm1 * v2
                   - du3 * gm1 * v3 + du4 * gm1)

        c0 = -0.5 * jnp.abs(ev0) * a0
        c1 = -0.5 * jnp.abs(v1) * a1
        c2 = -0.5 * jnp.abs(v1) * a2
        c3 = -0.5 * jnp.abs(v1) * a3
        c4 = -0.5 * jnp.abs(ev4) * a4

        llf_flag = (dl + a0 < 0.0) | (dl + a0 + a3 < 0.0)

        fd = 0.5 * (fl_d + fr_d) + c0 + c3 + c4
        fmx = 0.5 * (fl_mx + fr_mx) + c0 * (v1 - cs) + c3 * v1 + c4 * (v1 + cs)
        fmy = 0.5 * (fl_my + fr_my) + c0 * v2 + c1 + c3 * v2 + c4 * v2
        fmz = 0.5 * (fl_mz + fr_mz) + c0 * v3 + c2 + c3 * v3 + c4 * v3
        fe = (0.5 * (fl_e + fr_e) + c0 * (h - v1 * cs) + c1 * v2 + c2 * v3
              + c3 * 0.5 * vsq + c4 * (h + v1 * cs))

        # upwind flux when fully supersonic
        fd = jnp.where(ev0 >= 0.0, fl_d, jnp.where(ev4 <= 0.0, fr_d, fd))
        fmx = jnp.where(ev0 >= 0.0, fl_mx, jnp.where(ev4 <= 0.0, fr_mx, fmx))
        fmy = jnp.where(ev0 >= 0.0, fl_my, jnp.where(ev4 <= 0.0, fr_my, fmy))
        fmz = jnp.where(ev0 >= 0.0, fl_mz, jnp.where(ev4 <= 0.0, fr_mz, fmz))
        fe = jnp.where(ev0 >= 0.0, fl_e, jnp.where(ev4 <= 0.0, fr_e, fe))

        # LLF fallback
        cl_s = eos.hydro_sound_speed(dl, pl)
        cr_s = eos.hydro_sound_speed(dr, pr)
        a = 0.5 * jnp.maximum(jnp.abs(vxl) + cl_s, jnp.abs(vxr) + cr_s)
        fd = jnp.where(llf_flag, 0.5 * (fl_d + fr_d) - a * du0, fd)
        fmx = jnp.where(llf_flag, 0.5 * (fl_mx + fr_mx) - a * du1, fmx)
        fmy = jnp.where(llf_flag, 0.5 * (fl_my + fr_my) - a * du2, fmy)
        fmz = jnp.where(llf_flag, 0.5 * (fl_mz + fr_mz) - a * du3, fmz)
        fe = jnp.where(llf_flag, 0.5 * (fl_e + fr_e) - a * du4, fe)
    else:
        iso_cs = eos.iso_cs
        fl_mx = fl_mx + iso_cs ** 2 * dl
        fr_mx = fr_mx + iso_cs ** 2 * dr
        ev0 = v1 - iso_cs
        ev3 = v1 + iso_cs
        a0 = du0 * (0.5 + 0.5 * v1 / iso_cs) - du1 * 0.5 / iso_cs
        a1 = du0 * (-v2) + du2
        a2 = du0 * (-v3) + du3
        a3 = du0 * (0.5 - 0.5 * v1 / iso_cs) + du1 * 0.5 / iso_cs

        c0 = -0.5 * jnp.abs(ev0) * a0
        c1 = -0.5 * jnp.abs(v1) * a1
        c2 = -0.5 * jnp.abs(v1) * a2
        c3 = -0.5 * jnp.abs(ev3) * a3

        llf_flag = (dl + a0 < 0.0) | (dl + a0 + a3 < 0.0)

        fd = 0.5 * (fl_d + fr_d) + c0 + c3
        fmx = (0.5 * (fl_mx + fr_mx) + c0 * (v1 - iso_cs)
               + c3 * (v1 + iso_cs))
        fmy = 0.5 * (fl_my + fr_my) + c0 * v2 + c1 + c3 * v2
        fmz = 0.5 * (fl_mz + fr_mz) + c0 * v3 + c2 + c3 * v3
        fe = None

        fd = jnp.where(ev0 >= 0.0, fl_d, jnp.where(ev3 <= 0.0, fr_d, fd))
        fmx = jnp.where(ev0 >= 0.0, fl_mx, jnp.where(ev3 <= 0.0, fr_mx, fmx))
        fmy = jnp.where(ev0 >= 0.0, fl_my, jnp.where(ev3 <= 0.0, fr_my, fmy))
        fmz = jnp.where(ev0 >= 0.0, fl_mz, jnp.where(ev3 <= 0.0, fr_mz, fmz))

        a = 0.5 * jnp.maximum(jnp.abs(vxl) + iso_cs, jnp.abs(vxr) + iso_cs)
        fd = jnp.where(llf_flag, 0.5 * (fl_d + fr_d) - a * du0, fd)
        fmx = jnp.where(llf_flag, 0.5 * (fl_mx + fr_mx) - a * du1, fmx)
        fmy = jnp.where(llf_flag, 0.5 * (fl_my + fr_my) - a * du2, fmy)
        fmz = jnp.where(llf_flag, 0.5 * (fl_mz + fr_mz) - a * du3, fmz)

    return _pack_flux(wl, eos, ivx, fd, fmx, fmy, fmz, fe)


# ------------------------------------------------------------------ advect
def advect(wl, wr, eos: EOSData, ivx: int):
    """Pure advection (kinematic problems): upwind density/scalar flux with
    zero momentum/energy flux (reference: src/hydro/rsolvers/advect_hyd.hpp)."""
    dl = wl[..., IDN, :, :, :]
    dr = wr[..., IDN, :, :, :]
    vxl = wl[..., ivx, :, :, :]
    vxr = wr[..., ivx, :, :, :]
    fd = jnp.where(vxl >= 0.0, dl * vxl, dr * vxr)
    flx = jnp.zeros_like(wl)
    flx = flx.at[..., IDN, :, :, :].set(fd)
    # passive scalars upwinded with the density flux
    nvar = wl.shape[-4]
    nfluid = 5 if eos.is_ideal else 4
    if nvar > nfluid:
        sl = wl[..., nfluid:, :, :, :]
        sr = wr[..., nfluid:, :, :, :]
        fs = jnp.where(fd[..., None, :, :, :] >= 0.0,
                       fd[..., None, :, :, :] * sl,
                       fd[..., None, :, :, :] * sr)
        flx = flx.at[..., nfluid:, :, :, :].set(fs)
    return flx


HYDRO_RSOLVER_FNS = {
    "llf": llf,
    "hlle": hlle,
    "hllc": hllc,
    "roe": roe,
    "advect": advect,
}
