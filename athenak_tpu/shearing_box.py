"""Shearing box: local-frame source terms, orbital advection, and
shear-periodic radial boundaries.

Parity target: the reference ``ShearingBox``/``OrbitalAdvection`` modules
(reference: src/shearing_box/shearing_box.cpp:24-68,
shearing_box_srcterms.cpp:30-120, orbital_advection_cc.cpp:244-290,
shearing_box_cc.cpp:63-140, remap_fluxes.hpp:15-69).  Like the reference,
the evolved azimuthal velocity is the DEVIATION from the orbital shear
flow vy_orb = -q Omega0 x1:

  * source terms: dM1 += 2 Om M2 bdt; dM2 -= (2-q) Om M1 bdt;
    dE += q Om M1 M2/rho bdt (+ stratified vertical gravity)
  * orbital advection: once per cycle every x1-column is remapped in y by
    dy = -q Om x1 dt with a conservative PLM remap (integer part by a
    modular gather, fractional part by upwind PLM fluxes)
  * shear-periodic x1 BCs: ghost slabs from the opposite side are
    y-shifted by +/- yshear(t) = q Om Lx t with the same remap

TPU-native: per-column integer offsets become a static-shape
``take_along_axis`` gather with traced indices; the fractional remap is a
roll-stencil; everything lives inside the jitted cycle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .indices import IDN, IEN, IM1, IM2, IM3, IVX, IVY

_JA = 3  # y axis in [nmb, nvar, n3, n2, n1]


def _plm_remap(f, s, axis):
    """Conservative remap of f by a (traced, possibly per-element) shift
    ``s`` measured in cells along ``axis`` (periodic).  Positive s moves
    the profile toward +axis.  PLM with monotonized-central slopes
    (reference: remap_fluxes.hpp PLM branch)."""
    n = f.shape[axis]
    jo = jnp.floor(s).astype(jnp.int32)
    eps = s - jo  # in [0, 1)

    # integer shift: out_j = f_{j - jo} via modular gather
    jgrid = jnp.arange(n)
    shape = [1] * f.ndim
    shape[axis] = n
    jgrid = jgrid.reshape(shape)
    idx = jnp.mod(jgrid - jo, n)
    idx = jnp.broadcast_to(idx, f.shape)
    g = jnp.take_along_axis(f, idx, axis=axis)

    # fractional shift by eps in [0,1): upwind PLM flux through j-1/2
    # F_{j-1/2} = eps * (g_{j-1} + 0.5*(1-eps)*sigma_{j-1})
    gm = jnp.roll(g, 1, axis=axis)
    gp = jnp.roll(g, -1, axis=axis)
    dl = g - gm
    dr = gp - g
    sigma = jnp.where(dl * dr > 0.0,
                      2.0 * dl * dr / (dl + dr + 1.0e-300), 0.0)
    sig_m = jnp.roll(sigma, 1, axis=axis)
    flux = eps * (gm + 0.5 * (1.0 - eps) * sig_m)  # through j-1/2
    flux_p = jnp.roll(flux, -1, axis=axis)         # through j+1/2
    return g - (flux_p - flux)


class ShearingBox:
    def __init__(self, pin, mesh, nvar: int) -> None:
        self.mesh = mesh
        self.qshear = pin.get_real("shearing_box", "qshear")
        self.omega0 = pin.get_real("shearing_box", "omega0")
        self.is_stratified = pin.get_or_add_boolean(
            "shearing_box", "stratified", False)
        ms = mesh.mesh_size
        self.lx = ms.x1max - ms.x1min
        self.ly = ms.x2max - ms.x2min
        mbi = mesh.mb_indcs
        if mbi.nx2 == 1:
            raise NotImplementedError(
                "2D r-z shearing box not wired yet (needs x3-handedness)")

        # x1 cell centers per block, broadcastable [nmb, 1, 1, 1, n1]
        nmb = mesh.nmb_total
        xc = np.empty((nmb, 1, 1, 1, mbi.ncells1))
        zc = np.empty((nmb, 1, mbi.ncells3, 1, 1))
        for gid in range(nmb):
            x1v, _, x3v = mesh.cell_centers(gid)
            xc[gid, 0, 0, 0, :] = x1v
            zc[gid, 0, :, 0, 0] = x3v
        self.xc = xc
        self.zc = zc
        self.dy = ms.dx2

    # ------------------------------------------------------------------
    def src_terms(self, u, w, beta_dt, is_ideal: bool, three_d: bool):
        """(reference: shearing_box_srcterms.cpp:30-83)."""
        om = self.omega0
        q = self.qshear
        den = w[:, IDN]
        mom1 = den * w[:, IVX]
        mom2 = den * w[:, IVY]
        u = u.at[:, IM1].add(2.0 * beta_dt * om * mom2)
        u = u.at[:, IM2].add(-(2.0 - q) * beta_dt * om * mom1)
        if self.is_stratified:
            u = u.at[:, IM3].add(
                -beta_dt * om * om * den * self.zc[:, 0])
        if is_ideal:
            u = u.at[:, IEN].add(
                beta_dt * q * om * mom1 * mom2 / den)
        return u

    # ------------------------------------------------------------------
    def orbital_advect(self, u, dt):
        """Advect every x1-column by the orbital shear displacement
        dy = -q Om x1 dt (reference: orbital_advection_cc.cpp:240-290).
        Operates on active y cells with periodic wrap; ghosts are refilled
        by the caller."""
        mbi = self.mesh.mb_indcs
        js, je = mbi.js, mbi.je
        ua = u[:, :, :, js:je + 1, :]
        shift_cells = (-(self.qshear * self.omega0)
                       * jnp.asarray(self.xc) * dt) / self.dy
        ua = _plm_remap(ua, shift_cells, axis=_JA)
        return u.at[:, :, :, js:je + 1, :].set(ua)

    # ------------------------------------------------------------------
    def remap_ghosts(self, u, t):
        """y-shift the shear-periodic x1 ghost slabs by +/- yshear(t)
        (reference: shearing_box_cc.cpp:63-140).  The plain periodic
        gather has already filled the slabs; this corrects them."""
        mesh = self.mesh
        mbi = mesh.mb_indcs
        ng = mbi.ng
        n1 = mbi.ncells1
        js, je = mbi.js, mbi.je
        yshear = self.qshear * self.omega0 * self.lx * t
        s = yshear / self.dy  # shift in cells

        # inner-x1 ghosts: f(x<x1min, y) = f(x+Lx, y - yshear)
        #   -> shift gathered slab toward +y by s
        maskm = mesh.phys_bc_mask["x1m"]
        maskp = mesh.phys_bc_mask["x1p"]
        if maskm.any():
            slab = u[:, :, :, js:je + 1, 0:ng]
            shifted = _plm_remap(slab, s, axis=_JA)
            mb = jnp.asarray(maskm).reshape(-1, 1, 1, 1, 1)
            u = u.at[:, :, :, js:je + 1, 0:ng].set(
                jnp.where(mb, shifted, slab))
        if maskp.any():
            slab = u[:, :, :, js:je + 1, n1 - ng:n1]
            shifted = _plm_remap(slab, -s, axis=_JA)
            mb = jnp.asarray(maskp).reshape(-1, 1, 1, 1, 1)
            u = u.at[:, :, :, js:je + 1, n1 - ng:n1].set(
                jnp.where(mb, shifted, slab))
        return u
