"""Radiation-matter thermal relaxation (reference:
src/pgen/radiation/rad_relax.cpp + inputs/radiation/relax.athinput).

Uniform gas at temperature T0 with isotropic radiation field erad:
absorption opacity drives both to the common equilibrium
a T_eq^4 + rho T_eq/(gamma-1) = erad + rho T0/(gamma-1) (for the deck's
gamma=2 the reference comment "assumes gm1=1" applies).  With v1 != 0
the intensity is isotropic in the FLUID frame, boosted into the tetrad
frame with the (n^0_fluid)^-4 invariant-intensity factor
(rad_relax.cpp:80-112).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX


def init(pin, mesh, phys):
    erad = pin.get_real("problem", "erad")
    temp = pin.get_real("problem", "temp")
    v1 = pin.get_or_add_real("problem", "v1", 0.0)
    lf = 1.0 / math.sqrt(1.0 - v1 * v1)

    rad = phys.rad
    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    w = np.zeros(phys.shape)
    w[:, IDN] = 1.0
    w[:, IVX] = lf * v1
    # primitive IEN slot stores internal energy: e = p/(gm-1) = rho T/gm1
    gm1 = phys.eos.gamma - 1.0
    w[:, IEN] = temp / gm1

    # isotropic fluid-frame intensity, boosted per angle
    # (rad_relax.cpp:76-112): u_tet = (lf, lf v1, 0, 0) in Minkowski
    nh = np.asarray(rad.grid.nh)                       # [nang, 3]
    n0_f = lf * 1.0 - lf * v1 * nh[:, 0]               # u^a n_a (tetrad)
    ii_f = erad / (4.0 * math.pi)
    n0 = np.asarray(rad.n0)                            # scalar/broadcast
    n_0 = np.asarray(rad.n_0)
    i0 = (n0 * n_0 * ii_f / n0_f.reshape(1, -1, 1, 1, 1) ** 4
          * np.ones(phys.rad.shape))

    wj = jnp.asarray(w, dtype=dtype)
    u = phys.prim_to_cons(wj)
    return phys.make_state(u, wj, jnp.asarray(i0, dtype=dtype))
