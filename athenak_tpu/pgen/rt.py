"""Rayleigh-Taylor instability (requires <hydro_srcterms> const_accel).

Parity target: reference src/pgen/fluids/rt.cpp — heavy-over-light in
hydrostatic balance with a single-mode or random interface perturbation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVY


def init(pin, mesh, phys):
    amp = pin.get_or_add_real("problem", "amp", 0.01)
    drat = pin.get_or_add_real("problem", "drat", 2.0)
    grav = pin.get_real("hydro_srcterms", "const_accel_val")
    gm1 = phys.eos.gamma - 1.0
    ms = mesh.mesh_size

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    lx = ms.x1max - ms.x1min
    for gid in range(nmb):
        x1v, x2v, _ = mesh.cell_centers(gid)
        X = x1v[None, None, :]
        Y = x2v[None, :, None]
        den = np.where(Y > 0.0, drat, 1.0) + 0.0 * X
        pres = 2.5 + grav * np.where(Y > 0.0, drat * Y, Y) + 0.0 * X
        w[gid, IDN] = den
        w[gid, IEN] = pres / gm1
        w[gid, IVY] = (amp * (1.0 + np.cos(2.0 * math.pi * X / lx)) / 2.0
                       * (1.0 + np.cos(1.5 * math.pi * Y)) / 2.0)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)
    return phys.make_state(phys.prim_to_cons(wj), wj)
