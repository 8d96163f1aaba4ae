"""Kelvin-Helmholtz instability (hydro or MHD).

Parity target: reference src/pgen/fluids/kh.cpp — ichoice 1 is the
Lecoanet et al. (2016) smooth double shear layer; ichoice 2 the classic
discontinuous layer with random/sinusoidal seeds.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX, IVY


def init(pin, mesh, phys):
    ich = pin.get_or_add_integer("problem", "ichoice", 1)
    amp = pin.get_or_add_real("problem", "amp", 0.01)
    sigma = pin.get_or_add_real("problem", "sigma", 0.2)
    vshear = pin.get_or_add_real("problem", "vshear", 1.0)
    drat = pin.get_or_add_real("problem", "drat", 1.0)
    gm1 = phys.eos.gamma - 1.0

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    for gid in range(nmb):
        x1v, x2v, _ = mesh.cell_centers(gid)
        X = x1v[None, None, :]
        Y = x2v[None, :, None]
        if ich == 1:
            # Lecoanet: smooth tanh layers at y = +/- 0.5
            prof = (np.tanh((Y + 0.5) / sigma)
                    - np.tanh((Y - 0.5) / sigma))
            w[gid, IDN] = 1.0 + 0.5 * (drat - 1.0) * prof
            w[gid, IVX] = vshear * (prof - 1.0)
            w[gid, IVY] = (amp * np.sin(2.0 * math.pi * X)
                           * (np.exp(-((Y + 0.5) / sigma) ** 2)
                              + np.exp(-((Y - 0.5) / sigma) ** 2)))
            w[gid, IEN] = 10.0 / gm1
        else:
            inner = np.abs(Y) < 0.25
            w[gid, IDN] = np.where(inner, drat, 1.0)
            w[gid, IVX] = np.where(inner, vshear, -vshear)
            w[gid, IVY] = amp * np.sin(2.0 * math.pi * X)
            w[gid, IEN] = 2.5 / gm1

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)
    if getattr(phys, "is_mhd", False):
        b0 = pin.get_or_add_real("problem", "b0", 0.0)
        bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
        bfc["x1f"][:] = b0
        bfcj = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
        bcc = phys.compute_bcc(bfcj)
        return phys.make_state(phys.prim_to_cons(wj, bcc), wj, bfcj)
    return phys.make_state(phys.prim_to_cons(wj), wj)
