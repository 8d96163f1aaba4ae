"""Hohlraum test: vacuum box irradiated from the inner-x1 wall.

Parity target: reference src/pgen/radiation/hohlraum.cpp and the
inputs/radiation/hohlraum_1d deck — intensities are zero initially; the
inner-x1 ghost zones hold I = i_beam for inward-propagating angles, and a
light front crosses the box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init(pin, mesh, phys):
    ibeam = pin.get_or_add_real("problem", "i_beam", 1.0)
    mbi = mesh.mb_indcs
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    i0 = jnp.zeros(phys.shape, dtype=dtype)

    # fixed boundary: ghosts at inner x1 hold I = i_beam for angles with
    # n_x > 0, stored in the evolved variable i0 = n^0 n_0 I
    ng = mbi.ng
    nx_pos = (phys.grid.nh[:, 0] > 0.0).reshape(1, -1, 1, 1, 1)
    gmask = np.zeros(phys.shape, dtype=bool)
    blocks = np.where(mesh.phys_bc_mask["x1m"])[0]
    for gid in blocks:
        gmask[gid, :, :, :, 0:ng] = True
    gmask = gmask & np.broadcast_to(nx_pos, phys.shape)
    gmask_j = jnp.asarray(gmask)
    beam_i0 = jnp.asarray(phys.n0 * phys.n_0 * ibeam, dtype=dtype)

    def hohlraum_bc(u, bv):
        return jnp.where(gmask_j, beam_i0, u)

    phys.bvals.user_bc_func = hohlraum_bc
    return phys.make_state(i0)
