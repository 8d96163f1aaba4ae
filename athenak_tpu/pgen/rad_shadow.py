"""Radiation shadow test (reference: src/pgen/radiation/rad_shadow.cpp
+ inputs/radiation/shadow.athinput).

A collimated beam (two inward angles of the nlevel=2 geodesic grid)
enters at inner-x1 across an optically thick elliptical cloud,
rho = 1 + 9/(1+exp(10(x/0.1)^2+(y/0.06)^2-1)), casting a sharp shadow
behind it.  The hydro inflow state rides bvals.inflow_state; the
intensity inflow is a user BC on the i0 ghosts (the reference's i_in
per-angle inflow array).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX, IVY, IVZ


def init(pin, mesh, phys):
    rad = phys.rad
    if rad.grid.nlevel != 2:
        raise ValueError("shadow test requires the nlevel=2 geodesic "
                         "mesh (reference: rad_shadow.cpp:60)")
    ibeam = pin.get_or_add_real("problem", "i_beam", 100.0)
    # the reference hardcodes angles 2 and 5 of ITS angle ordering —
    # the two most +x-aligned directions of the nlevel=2 grid; select
    # by direction so the beam is grid-ordering independent
    nh = np.asarray(rad.grid.nh)
    beam_angles = tuple(np.argsort(-nh[:, 0])[:2])

    mbi = mesh.mb_indcs
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    w = np.zeros(phys.shape)
    for gid in range(mesh.nmb_total):
        x1v, x2v, _ = mesh.cell_centers(gid)
        X1 = x1v[None, None, :]
        X2 = x2v[None, :, None]
        w[gid, IDN] = 1.0 + 9.0 / (
            1.0 + np.exp(10.0 * ((X1 / 0.1) ** 2
                                 + (X2 / 0.06) ** 2 - 1.0)))
        w[gid, IEN] = 1.0 / (phys.eos.gamma - 1.0)  # T = 1 (gm1-scaled)
    w[:, IVX] = w[:, IVY] = w[:, IVZ] = 0.0

    i0 = jnp.zeros(rad.shape, dtype=dtype)

    # inner-x1 inflow as a user BC (the reference's per-physics
    # u_in / i_in inflow arrays): upstream gas for the hydro block,
    # the two beam angles for the intensity block (i0 carries
    # n^0 n_0 I; the reference stores -100 because n_0 = -1 flat)
    ng = mbi.ng
    gmask = np.zeros(rad.shape, dtype=bool)
    umask = np.zeros(phys.shape, dtype=bool)
    for gid in np.where(mesh.phys_bc_mask["x1m"])[0]:
        for n in beam_angles:
            gmask[gid, n, :, :, 0:ng] = True
        umask[gid, :, :, :, 0:ng] = True
    gmask_j = jnp.asarray(gmask)
    umask_j = jnp.asarray(umask)
    beam_i0 = jnp.asarray(rad.n0 * rad.n_0 * ibeam, dtype=dtype)
    uin = np.zeros(phys.nvar)
    uin[IDN] = 1.0
    uin[IEN] = 1.0 / (phys.eos.gamma - 1.0)
    uin_j = jnp.asarray(uin.reshape(1, -1, 1, 1, 1), dtype=dtype)

    def shadow_bc(q, bv):
        # applied to every filled array; dispatch on the channel count
        if q.ndim == 5 and q.shape[1] == rad.nangles:
            return jnp.where(gmask_j, beam_i0, q)
        if q.ndim == 5 and q.shape[1] == phys.nvar:
            return jnp.where(umask_j, uin_j, q)
        return q

    shadow_bc.shard_safe = False
    phys.bvals.user_bc_func = shadow_bc

    wj = jnp.asarray(w, dtype=dtype)
    u = phys.prim_to_cons(wj)
    return phys.make_state(u, wj, i0)
