"""Driven-turbulence problem: uniform medium, forcing supplies the energy.

(reference: src/pgen/fluids/turb.cpp — uniform d0/p0 state; all dynamics
come from the <turb_driving> Ornstein-Uhlenbeck forcing)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN


def init(pin, mesh, phys):
    d0 = pin.get_or_add_real("problem", "d0", 1.0)
    p0 = pin.get_or_add_real("problem", "p0", 1.0)
    gm1 = phys.eos.gamma - 1.0

    mbi = mesh.mb_indcs
    w = np.zeros((mesh.nmb_total, phys.nvar,
                  mbi.ncells3, mbi.ncells2, mbi.ncells1))
    w[:, IDN] = d0
    if phys.eos.is_ideal:
        w[:, IEN] = p0 / gm1
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)

    if getattr(phys, "is_mhd", False):
        b0 = pin.get_or_add_real("problem", "b0", 0.0)
        bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
        bfc["x1f"][:] = b0
        bfcj = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
        bcc = phys.compute_bcc(bfcj)
        u = phys.prim_to_cons(wj, bcc)
        return phys.make_state(u, wj, bfcj)
    u = phys.prim_to_cons(wj)
    return phys.make_state(u, wj)
