"""Shu-Osher shock-entropy wave interaction.

Parity target: reference src/pgen/fluids/shu_osher.cpp — Mach-3 shock at
x = -0.8 running into a sinusoidal density field; the standard high-order
reconstruction stress test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX


def init(pin, mesh, phys):
    gm1 = phys.eos.gamma - 1.0
    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    for gid in range(nmb):
        x1v, _, _ = mesh.cell_centers(gid)
        X = x1v[None, None, :]
        left = X < -0.8
        w[gid, IDN] = np.where(left, 3.857143,
                               1.0 + 0.2 * np.sin(5.0 * X))
        w[gid, IVX] = np.where(left, 2.629369, 0.0)
        w[gid, IEN] = np.where(left, 10.33333, 1.0) / gm1

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)
    return phys.make_state(phys.prim_to_cons(wj), wj)
