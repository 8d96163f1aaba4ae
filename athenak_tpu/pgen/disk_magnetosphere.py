"""Magnetized star–disk interaction: Keplerian disk + stellar dipole
magnetosphere, with optional embedded planets.

Parity target: reference src/pgen/fluids/disk-magnetosphere.cpp
(Cartesian branch) — the largest fluid problem generator:

  * Keplerian accretion disk with power-law surface density
    rho = rho0 (r/r0)^dslope and temperature p/rho = p0_over_r0
    (r/rfix)^pslope, vertical hydrostatic structure
    exp[GM/c_s^2 (1/sqrt(r^2+z^2) - 1/r)] (DenProfileCyl:725-765);
  * a magnetospheric cavity inside rmagsph: the disk is suppressed by
    exp[-((rc-rmagsph)/smoothtr)^2] and replaced by a hydrostatic
    stellar atmosphere integrated outward from denstar with rigid
    rotation origid inside rrigid (the reference's dr=rs/100 midpoint
    march, DenProfileCyl:741-757);
  * stellar dipole field B = curl A, A = mm b0 (-y, x, 0)/rc^3 with
    b0 = sqrt(2 p0_over_r0 rho0 / beta) (A1/A2:822-848, b0:308);
  * source terms: smoothed stellar gravity -GM r/rc^3 *
    (rc-smoothin)^2/((rc-smoothin)^2+smoothtr^2), interior state reset
    inside rfix, radius-dependent density floor rho_floor0 (rc/r0)^slope
    + magnetospheric floor, beta-cooling toward the initial temperature
    profile on tcool local orbits, and circular-orbit planets with
    softened gravity and sin^2 mass insertion over insert_time orbits
    (StarSourceTerms:1253-1316, Cooling:1518-1542, orbit:1497-1514);
  * "steady" user boundaries: ghost zones pinned to the initial state
    (DiskInnerX1..DiskOuterX3:880-1240);
  * per-planet history output: back-reaction force integrals with the
    Hill-sphere mask, torque, and the orbit elements
    (PlanetForce + the 14 enrolled outputs:346-380).

TPU-native: all profiles are host-numpy tables baked as XLA constants;
the interior hydrostatic march vectorizes over all cavity cells at once
(every cell integrates the same global rint grid with a mask); the
time-dependent planet source is a closed-form function of the traced
time carried in state["t"], so one compiled cycle serves the entire
orbit — no per-step host recomputation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IM1, IM2, IM3, IVX, IVY, IVZ


def _params(pin, phys):
    is_ideal = phys.eos.is_ideal
    p = dict(
        gm0=pin.get_or_add_real("problem", "GM", 0.0),
        r0=pin.get_or_add_real("problem", "r0", 1.0),
        rho0=pin.get_real("problem", "rho0"),
        dslope=pin.get_or_add_real("problem", "dslope", 0.0),
        tcool=pin.get_or_add_real("problem", "tcool", 0.0),
        rho_floor0=pin.get_real("problem", "rho_floor0"),
        slope_rho_floor=pin.get_or_add_real("problem",
                                            "slope_rho_floor", 0.0),
        rs=pin.get_or_add_real("problem", "rsmooth", 0.0),
        rfix=pin.get_or_add_real("problem", "rfix", 0.1),
        smoothin=pin.get_or_add_real("problem", "smoothin", 0.0),
        smoothtr=pin.get_or_add_real("problem", "smoothtr", 0.0),
        rrigid=pin.get_or_add_real("problem", "rrigid", 0.0),
        origid=pin.get_or_add_real("problem", "origid", 0.0),
        rmagsph=pin.get_or_add_real("problem", "rmagsph", 0.0),
        denstar=pin.get_or_add_real("problem", "denstar", 0.0),
        ratmagfloor=pin.get_or_add_real("problem", "ratmagfloor", 1.0e6),
        ratmagfslope=pin.get_or_add_real("problem", "ratmagfslope", 5.5),
        insert_time=pin.get_or_add_real("problem", "insert_time", 5.0),
    )
    if is_ideal:
        p["p0_over_r0"] = pin.get_or_add_real("problem", "p0_over_r0",
                                              0.0025)
        p["pslope"] = pin.get_or_add_real("problem", "pslope", 0.0)
        p["gamma"] = phys.eos.gamma
    else:
        p["p0_over_r0"] = phys.eos.iso_cs ** 2
        p["pslope"] = 0.0
        p["gamma"] = phys.eos.gamma
    if getattr(phys, "is_mhd", False):
        p["beta"] = pin.get_real("problem", "beta")
        p["mm"] = pin.get_or_add_real("problem", "mm", 0.0)
        p["b0"] = math.sqrt(2.0 * p["p0_over_r0"] * p["rho0"]
                            / p["beta"])
    else:
        p["beta"] = 1.0
        p["mm"] = 0.0
        p["b0"] = 0.0
    p["dfloor"] = pin.get_or_add_real(
        "mhd" if getattr(phys, "is_mhd", False) else "hydro",
        "dfloor", 1024 * float(np.finfo(np.float32).tiny))
    return p


def _pover_r(rad, p):
    r = np.maximum(rad, p["rfix"])
    return p["p0_over_r0"] * (r / p["r0"]) ** p["pslope"]


def _rho_floor(rc, p):
    fl = np.where(rc > p["rs"],
                  p["rho_floor0"] * (rc / p["r0"])
                  ** p["slope_rho_floor"], 0.0)
    if p["mm"] != 0.0:
        fl = fl + np.where(
            rc > p["rs"],
            4.0 * p["rho0"] * p["mm"] ** 2 / p["beta"]
            / p["ratmagfloor"] * (p["r0"] / rc) ** p["ratmagfslope"],
            0.0)
    return np.maximum(fl, p["dfloor"])


def _den_profile(rad, z, p):
    """DenProfileCyl (disk-magnetosphere.cpp:725-765), vectorized over
    a cell batch; rad/z arbitrary-shape arrays."""
    r = np.maximum(rad, p["rs"])
    p_over_r = _pover_r(r, p)
    denmid = p["rho0"] * (r / p["r0"]) ** p["dslope"]
    den = denmid * np.exp(p["gm0"] / p_over_r
                          * (1.0 / np.sqrt(r * r + z * z) - 1.0 / r))

    rc = np.sqrt(rad * rad + z * z)
    if p["rmagsph"] > 0.0:
        sinsq = rad * rad / np.maximum(rc * rc, 1e-300)
        den = np.where(rc < p["rmagsph"],
                       den * np.exp(-((rc - p["rmagsph"])
                                      / p["smoothtr"]) ** 2), den)
        # hydrostatic stellar atmosphere: midpoint march in rint with
        # the same dr=rs/100 as the reference, vectorized over cells
        por_s = float(np.asarray(_pover_r(np.asarray(p["rs"]), p)))
        dr = p["rs"] / 100.0
        pre = np.full(rc.shape, p["denstar"] * por_s)
        rint = 0.0
        while rint < p["rmagsph"]:
            act = rint < rc
            if rint < p["rs"]:
                dpre = dr * p["origid"] ** 2 * rint * sinsq * pre / por_s
            else:
                sm = (rint - p["smoothin"]) ** 2
                dpre = (-dr * p["gm0"] / rint ** 2
                        * sm / (sm + p["smoothtr"] ** 2) * pre / por_s
                        + dr * p["origid"] ** 2 * rint * sinsq
                        * pre / por_s)
            pre = np.where(act, pre + dpre, pre)
            rint += dr
        den = np.where(rc < p["rmagsph"], den + pre / por_s, den)
    return np.maximum(den, _rho_floor(rc, p)), den


def rc_of(rad, z):
    return np.sqrt(rad * rad + z * z)


def _vel_profile(rad, z, X, Y, p):
    """VelProfileCyl (disk-magnetosphere.cpp:780-812), Cartesian."""
    r = np.maximum(rad, p["rs"])
    p_over_r = _pover_r(r, p)
    vel2 = ((p["dslope"] + p["pslope"]) * p_over_r / (p["gm0"] / r)
            + (1.0 + p["pslope"])
            - p["pslope"] * r / np.sqrt(r * r + z * z))
    vel = np.sqrt(p["gm0"] / r) * np.sqrt(np.maximum(vel2, 0.0))
    rc = np.sqrt(rad * rad + z * z)
    if p["rmagsph"] > 0.0:
        vel = np.where(rc < p["rmagsph"],
                       vel * np.exp(-((rc - p["rmagsph"])
                                      / p["smoothtr"]) ** 2), vel)
    if p["rrigid"] > 0.0:
        vel = np.where(rc <= p["rrigid"], vel + p["origid"] * rad, vel)
    phi = np.arctan2(Y, X)
    return -vel * np.sin(phi), vel * np.cos(phi), np.zeros_like(vel)


def _dipole_A(x, y, z, p):
    """(A1, A2): stellar dipole vector potential, Cartesian
    (disk-magnetosphere.cpp:822-848)."""
    rc = np.maximum(np.sqrt(x * x + y * y + z * z), p["rs"] / 2.0)
    coef = p["mm"] * p["b0"] / rc ** 3
    return -coef * y, coef * x


class _Planets:
    """Circular-orbit planetary system (PlanetarySystem,
    disk-magnetosphere.cpp:94-140, orbit:1497-1514)."""

    def __init__(self, pin, gm0, insert_time) -> None:
        self.np_ = pin.get_or_add_integer("planets", "np", 0) \
            if pin.does_block_exist("planets") else 0
        self.gm0 = gm0
        self.insert_time = insert_time
        self.rsoft2 = pin.get_or_add_real("planets", "rsoft2", 0.0016) \
            if self.np_ else 0.0
        self.massset, self.x0, self.y0, self.z0 = [], [], [], []
        for ip in range(self.np_):
            self.massset.append(pin.get_or_add_real(
                "planets", f"mass{ip}", 1.0e-2))
            self.x0.append(pin.get_or_add_real("planets", f"x{ip}", 1.0))
            self.y0.append(pin.get_or_add_real("planets", f"y{ip}", 0.0))
            self.z0.append(pin.get_or_add_real("planets", f"z{ip}", 0.0))

    def state_at(self, t):
        """Traced (mass, xp, yp, zp) lists at time t (orbit())."""
        out = []
        for ip in range(self.np_):
            ms = self.massset[ip]
            ramp = jnp.sin(t / self.insert_time / 4.0) ** 2
            mass = jnp.where(t < self.insert_time * 2.0 * math.pi,
                             ms * ramp, ms)
            dis = math.sqrt(self.x0[ip] ** 2 + self.y0[ip] ** 2)
            ome = math.sqrt((self.gm0 + ms) / dis ** 3)
            ang = ome * t
            out.append((mass, dis * jnp.cos(ang), dis * jnp.sin(ang),
                        self.z0[ip]))
        return out


def init(pin, mesh, phys):
    p = _params(pin, phys)
    is_mhd = getattr(phys, "is_mhd", False)
    is_ideal = phys.eos.is_ideal
    gm1 = p["gamma"] - 1.0
    psys = _Planets(pin, p["gm0"], p["insert_time"])

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()} \
        if is_mhd else None

    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        x1f, x2f, x3f = mesh.face_edges(gid)
        X3, X2, X1 = np.meshgrid(x3v, x2v, x1v, indexing="ij")
        rad = np.sqrt(X1 ** 2 + X2 ** 2)
        den, den_raw = _den_profile(rad, X3, p)
        v1, v2, v3 = _vel_profile(rad, X3, X1, X2, p)
        # floor-dominated cells carry no orbital flow: the raw profile
        # underflowed there (polar funnel / far corners), and seeding
        # the floor gas with full Keplerian shear across the axis is a
        # 2-cell vortex sheet at beta ~ 1e-4 (the reference leans on
        # its floors in the same regions; zeroing is the robust start)
        quiet = den_raw < _rho_floor(rc_of(rad, X3), p)
        v1 = np.where(quiet, 0.0, v1)
        v2 = np.where(quiet, 0.0, v2)
        v3 = np.where(quiet, 0.0, v3)
        w[gid, IDN] = den
        w[gid, IVX] = v1
        w[gid, IVY] = v2
        w[gid, IVZ] = v3
        if is_ideal:
            w[gid, IEN] = _pover_r(rad, p) * den / gm1

        if is_mhd and p["mm"] != 0.0:
            # B = curl A on faces from edge-centered A (SetBfield)
            dx1 = x1v[1] - x1v[0]
            dx2 = x2v[1] - x2v[0]
            dx3 = x3v[1] - x3v[0] if mbi.nx3 > 1 else 1.0
            E3, E2, E1 = np.meshgrid(x3f, x2f, x1v, indexing="ij")
            a1 = _dipole_A(E1, E2, E3, p)[0]   # A1 at x1-cell, x2/x3-face
            E3, E2, E1 = np.meshgrid(x3f, x2v, x1f, indexing="ij")
            a2 = _dipole_A(E1, E2, E3, p)[1]   # A2 at x2-cell, x1/x3-face
            # A3 = 0 in Cartesian
            b1 = np.zeros((mbi.ncells3, mbi.ncells2, mbi.ncells1 + 1))
            b2 = np.zeros((mbi.ncells3, mbi.ncells2 + 1, mbi.ncells1))
            b3 = np.zeros((mbi.ncells3 + 1, mbi.ncells2, mbi.ncells1))
            if mbi.nx3 > 1:
                b1[:] = -(a2[1:, :, :] - a2[:-1, :, :]) / dx3
                b2[:] = (a1[1:, :, :] - a1[:-1, :, :]) / dx3
                b3[:] = ((a2[:, :, 1:] - a2[:, :, :-1]) / dx1
                         - (a1[:, 1:, :] - a1[:, :-1, :]) / dx2)
            else:
                b3[0] = ((a2[0, :, 1:] - a2[0, :, :-1]) / dx1
                         - (a1[0, 1:, :] - a1[0, :-1, :]) / dx2)
                b3[1] = b3[0]
            bfc["x1f"][gid] = b1
            bfc["x2f"][gid] = b2
            bfc["x3f"][gid] = b3

    # ---- initial-state tables for the source terms / BCs (host) ----
    den0 = w[:, IDN].copy()
    mom0 = np.stack([w[:, IVX] * den0, w[:, IVY] * den0,
                     w[:, IVZ] * den0], axis=1)
    por0 = np.zeros_like(den0)
    rc_tab = np.zeros_like(den0)
    xc_t = np.zeros_like(den0)
    yc_t = np.zeros_like(den0)
    zc_t = np.zeros_like(den0)
    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        X3, X2, X1 = np.meshgrid(x3v, x2v, x1v, indexing="ij")
        rad = np.sqrt(X1 ** 2 + X2 ** 2)
        por0[gid] = _pover_r(rad, p)
        rc_tab[gid] = np.sqrt(X1 ** 2 + X2 ** 2 + X3 ** 2)
        xc_t[gid], yc_t[gid], zc_t[gid] = X1, X2, X3
    floor_tab = _rho_floor(rc_tab, p)
    sm2 = (rc_tab - p["smoothin"]) ** 2
    fsm = np.where(rc_tab < p["smoothin"], 0.0,
                   sm2 / (sm2 + p["smoothtr"] ** 2))
    gcoe = -p["gm0"] / np.maximum(rc_tab, 1e-12) ** 3 * fsm
    fixmask = rc_tab < p["rfix"]
    e0 = por0 * den0 / gm1 if is_ideal else None

    from ..comm import local_blocks as _lb

    def srcterms(u, wprim, beta_dt, bcc=None, t=None):
        """AllSourceTerms (star + planets + cooling + floors + rfix)."""
        gx = jnp.asarray(_lb(gcoe * xc_t, pad_edge=True))
        gy = jnp.asarray(_lb(gcoe * yc_t, pad_edge=True))
        gz = jnp.asarray(_lb(gcoe * zc_t, pad_edge=True))
        den = u[:, IDN]
        s1 = beta_dt * den * gx
        s2 = beta_dt * den * gy
        s3 = beta_dt * den * gz
        u = u.at[:, IM1].add(s1)
        u = u.at[:, IM2].add(s2)
        u = u.at[:, IM3].add(s3)
        if is_ideal:
            u = u.at[:, IEN].add(s1 * wprim[:, IVX] + s2 * wprim[:, IVY]
                                 + s3 * wprim[:, IVZ])

        # planets: softened gravity at the traced orbit position
        if psys.np_ > 0 and t is not None:
            xc = jnp.asarray(_lb(xc_t, pad_edge=True))
            yc = jnp.asarray(_lb(yc_t, pad_edge=True))
            zc = jnp.asarray(_lb(zc_t, pad_edge=True))
            for mass, xp, yp, zp in psys.state_at(t):
                ddx, ddy, ddz = xc - xp, yc - yp, zc - zp
                dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                rsoft = math.sqrt(psys.rsoft2)
                coe = jnp.where(
                    dist >= rsoft, -mass / jnp.maximum(dist, 1e-12) ** 3,
                    mass / psys.rsoft2 / rsoft * (3.0 * dist / rsoft
                                                  - 4.0))
                f1 = beta_dt * den * coe * ddx
                f2 = beta_dt * den * coe * ddy
                f3 = beta_dt * den * coe * ddz
                u = u.at[:, IM1].add(f1)
                u = u.at[:, IM2].add(f2)
                u = u.at[:, IM3].add(f3)
                if is_ideal:
                    u = u.at[:, IEN].add(f1 * wprim[:, IVX]
                                         + f2 * wprim[:, IVY]
                                         + f3 * wprim[:, IVZ])

        # interior reset inside rfix (StarSourceTerms:1291-1310)
        fm = jnp.asarray(_lb(fixmask))
        d0 = jnp.asarray(_lb(den0, pad_edge=True))
        m0 = jnp.asarray(_lb(mom0, pad_edge=True))
        u = u.at[:, IDN].set(jnp.where(fm, d0, u[:, IDN]))
        for c, im in enumerate((IM1, IM2, IM3)):
            u = u.at[:, im].set(jnp.where(fm, m0[:, c], u[:, im]))
        if is_ideal:
            efix = jnp.asarray(_lb(e0, pad_edge=True)) \
                + 0.5 * jnp.sum(m0 * m0, axis=1) \
                / jnp.maximum(d0, 1e-300)
            if bcc is not None:
                efix = efix + 0.5 * jnp.sum(bcc * bcc, axis=1)
            u = u.at[:, IEN].set(jnp.where(fm, efix, u[:, IEN]))

        # beta cooling toward the initial temperature (Cooling)
        if is_ideal and p["tcool"] > 0.0:
            eint = u[:, IEN] - 0.5 * (u[:, IM1] ** 2 + u[:, IM2] ** 2
                                      + u[:, IM3] ** 2) / u[:, IDN]
            if bcc is not None:
                eint = eint - 0.5 * jnp.sum(bcc * bcc, axis=1)
            por = jnp.asarray(_lb(por0, pad_edge=True))
            rad_c = jnp.sqrt(jnp.asarray(_lb(xc_t, pad_edge=True)) ** 2
                             + jnp.asarray(_lb(yc_t,
                                               pad_edge=True)) ** 2)
            omk = jnp.sqrt(p["gm0"]
                           / jnp.maximum(rad_c, p["rfix"]) ** 3)
            dtr = jnp.maximum(p["tcool"] * 2.0 * math.pi / omk, beta_dt)
            dE = eint - por / gm1 * u[:, IDN]
            u = u.at[:, IEN].add(-dE * beta_dt / dtr)

        # radius-dependent density floor (rho_floor)
        fl = jnp.asarray(_lb(floor_tab, pad_edge=True))
        u = u.at[:, IDN].set(jnp.maximum(u[:, IDN], fl))
        return u

    srcterms.needs_bcc = is_mhd
    srcterms.needs_time = True
    phys.srcterms_func = srcterms

    from . import state_from_prims

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = w.astype(dtype)
    if is_mhd:
        state = state_from_prims(
            phys, wj, {k: v.astype(dtype) for k, v in bfc.items()})
    else:
        state = state_from_prims(phys, wj)

    # ---- "steady" user boundaries: ghosts pinned to initial values
    # (DiskInnerX1..DiskOuterX3) ----
    gmask = np.zeros((nmb, 1, mbi.ncells3, mbi.ncells2, mbi.ncells1),
                     dtype=bool)
    ng = mbi.ng
    for ax, a5, n in (("x1", 4, mbi.ncells1), ("x2", 3, mbi.ncells2),
                      ("x3", 2, mbi.ncells3)):
        for side in ("m", "p"):
            if mesh.mesh_bcs[("i" if side == "m" else "o") + ax] \
                    != "user":
                continue
            for gid in np.where(mesh.phys_bc_mask[f"{ax}{side}"])[0]:
                sl = [slice(None)] * 5
                sl[0] = gid
                sl[a5] = slice(0, ng) if side == "m" \
                    else slice(n - ng, n)
                gmask[tuple(sl)] = True
    u_init = np.asarray(state["u"])

    def steady_bc(u, bv):
        m = jnp.asarray(_lb(gmask))
        return jnp.where(m, jnp.asarray(_lb(u_init, pad_edge=True)), u)

    steady_bc.shard_safe = True
    phys.bvals.user_bc_func = steady_bc

    # ---- per-planet history: orbit elements + Hill-masked force
    # integrals (PlanetForce; the reference's 14 columns per planet).
    # Host-side like every history hook (outputs gather the state).
    if psys.np_ > 0:
        vol = float(mesh.mesh_size.dx1 * mesh.mesh_size.dx2
                    * mesh.mesh_size.dx3)
        act = (slice(None), slice(mbi.ks, mbi.ke + 1),
               slice(mbi.js, mbi.je + 1), slice(mbi.is_, mbi.ie + 1))

        def planet_hist(mesh_now, state):
            t = float(state["t"])
            u = np.asarray(state["u"], dtype=np.float64)
            xc, yc, zc = xc_t[act], yc_t[act], zc_t[act]
            rst = np.sqrt(xc * xc + yc * yc + zc * zc)
            labels, vals = [], []
            for ip in range(psys.np_):
                ms = psys.massset[ip]
                if t < psys.insert_time * 2.0 * math.pi:
                    mass = ms * math.sin(t / psys.insert_time / 4.0) ** 2
                else:
                    mass = ms
                dis = math.sqrt(psys.x0[ip] ** 2 + psys.y0[ip] ** 2)
                ome = math.sqrt((p["gm0"] + ms) / dis ** 3)
                xp = dis * math.cos(ome * t)
                yp = dis * math.sin(ome * t)
                zp = psys.z0[ip]
                ddx, ddy, ddz = xc - xp, yc - yp, zc - zp
                dist = np.sqrt(ddx ** 2 + ddy ** 2 + ddz ** 2)
                rsoft = math.sqrt(psys.rsoft2)
                coe = np.where(
                    dist >= rsoft,
                    -mass / np.maximum(dist, 1e-12) ** 3,
                    mass / psys.rsoft2 / rsoft
                    * (3.0 * dist / rsoft - 4.0))
                rpp = math.sqrt(xp * xp + yp * yp + zp * zp)
                rh = rpp * (mass / 3.0
                            / max(p["gm0"], 1e-12)) ** (1.0 / 3.0)
                dens = np.where((dist < rh) | (rst < 2.5 * p["rs"]),
                                0.0, u[:, IDN][act])
                fx = float((coe * ddx * vol * dens).sum())
                fy = float((coe * ddy * vol * dens).sum())
                fz = float((coe * ddz * vol * dens).sum())
                torque = xp * fy - yp * fx
                phip = math.atan2(yp, xp)
                fr = fx * math.cos(phip) + fy * math.sin(phip)
                ft = -fx * math.sin(phip) + fy * math.cos(phip)
                labels += [f"{nm}{ip}" for nm in
                           ("fr", "ft", "fp", "fxpp", "fypp", "fzpp",
                            "torque", "xpp", "ypp", "zpp", "rpp",
                            "tpp", "ppp", "mp")]
                vals += [fr, ft, fz, fx, fy, fz, torque, xp, yp, zp,
                         rpp,
                         math.acos(min(max(zp / rpp, -1.0), 1.0)),
                         phip, mass]
            return labels, vals

        phys.user_hist_func = planet_hist

    return state
