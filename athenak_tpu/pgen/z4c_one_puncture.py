"""Single puncture (isotropic Schwarzschild) initial data for Z4c.

Parity target: reference src/pgen/z4c/z4c_one_puncture.cpp — Brill-
Lindquist conformal factor psi = 1 + m/(2r), conformally flat metric,
zero extrinsic curvature, precollapsed lapse alpha = psi^-2
(reference: GaugePreCollapsedLapse, z4c_gauge.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..z4c.z4c import (I_ALPHA, I_CHI, I_GXX, I_GYY, I_GZZ, NZ4C)


def init(pin, mesh, phys):
    m = pin.get_or_add_real("problem", "punc_ADM_mass", 1.0)
    c1 = pin.get_or_add_real("problem", "punc_center_x1", 0.0)
    c2 = pin.get_or_add_real("problem", "punc_center_x2", 0.0)
    c3 = pin.get_or_add_real("problem", "punc_center_x3", 0.0)

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    u = np.zeros((nmb, NZ4C, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        X1 = x1v[None, None, :] - c1
        X2 = x2v[None, :, None] - c2
        X3 = x3v[:, None, None] - c3
        r = np.sqrt(X1 ** 2 + X2 ** 2 + X3 ** 2)
        r = np.maximum(r, 1e-12)
        psi = 1.0 + m / (2.0 * r)
        psi4 = psi ** 4
        # chi = psi^chi_psi_power (default -4)
        u[gid, I_CHI] = psi ** phys.opt.chi_psi_power
        u[gid, I_GXX] = 1.0
        u[gid, I_GYY] = 1.0
        u[gid, I_GZZ] = 1.0
        # precollapsed lapse alpha = psi^-2
        u[gid, I_ALPHA] = psi ** (-2.0)

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return phys.make_state(jnp.asarray(u, dtype=dtype))
