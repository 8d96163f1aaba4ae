"""Relativistic radiation diffusion of a Gaussian pulse in moving gas.

Reference: src/pgen/radiation/rad_diffusion.cpp — a scattering-dominated
(kappa_s) Gaussian radiation-energy pulse advected at velocity v1; the
analytic comoving-frame solution fixes (er, fr) at coordinate t=0, and
the angular distribution comes from the Minerbo (M1) closure intensity

  I = E/(4 pi) (1 + 3 f n.fhat)                      f <= 1/3
  I = E/(9 pi) (n.fhat - 3 f + 2) / (1 - f)^2        f  > 1/3

boosted into the tetrad frame with the (n^0_fluid)^-4 invariant factor.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX


def init(pin, mesh, phys):
    rad = phys.rad
    v1 = pin.get_real("problem", "v1")
    nu = pin.get_real("problem", "nu")
    lf = 1.0 / math.sqrt(1.0 - v1 * v1)
    uu1 = lf * v1
    dd = 1.0 / (3.0 * rad.kappa_s)
    nusq = nu * nu
    tp0 = 6.0 * uu1

    mbi = mesh.mb_indcs
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    w = np.zeros(phys.shape)
    w[:, IDN] = 1.0
    w[:, IVX] = uu1
    w[:, IEN] = 1.0 / (phys.eos.gamma - 1.0)

    nh = np.asarray(rad.grid.nh)                 # [nang, 3]
    nang = nh.shape[0]
    uu0 = math.sqrt(1.0 + uu1 * uu1)
    # fluid 4-velocity in the (Minkowski) tetrad frame
    u_tet = (uu0, uu1, 0.0, 0.0)
    i0 = np.zeros(rad.shape)

    for gid in range(mesh.nmb_total):
        x1v, _, _ = mesh.cell_centers(gid)
        x = x1v[None, None, None, :]             # [1, 1, 1, n1]
        tp = lf * (0.0 - v1 * x)
        xp = lf * (x - v1 * 0.0)
        er = np.maximum(
            np.exp(-nusq * xp ** 2 / (4.0 * dd * nusq * (tp0 + tp) + 1.0))
            / np.sqrt(4.0 * dd * nusq * (tp0 + tp) + 1.0), 1.0e-20)
        tmp_n = (xp - v1 * dd - 2.0 * nusq * dd
                 * (2.0 * v1 * dd * (tp0 - v1 * xp)
                    + xp * (v1 * xp - 2.0 * tp0)))
        tmp_d = (1.0 + 4.0 * nusq * dd * (tp0 - v1 * xp)) ** 2
        fr = 2.0 * dd * nusq * tmp_n / tmp_d * er

        ff = np.abs(fr)
        f_f = ff / er
        f1 = np.where(ff > 0.0, fr / np.maximum(ff, 1e-300), 0.0)

        # per-angle fluid-frame direction (rad_diffusion.cpp:140-152)
        un_t = u_tet[1] * nh[:, 0]
        n0_f = (u_tet[0] * 1.0 - un_t).reshape(1, nang, 1, 1, 1)
        n1_f = (-u_tet[1] * 1.0 + u_tet[1] / (u_tet[0] + 1.0) * un_t
                + nh[:, 0]).reshape(1, nang, 1, 1, 1)

        fn_f = f1[None] * n1_f[0]
        thin = er[None] / (9.0 * math.pi) * (fn_f - 3.0 * f_f[None]
                                             + 2.0) \
            / np.maximum((1.0 - f_f[None]) ** 2, 1e-300)
        thick = er[None] / (4.0 * math.pi) * (1.0 + 3.0 * f_f[None]
                                              * fn_f)
        ii_f = np.where(f_f[None] <= 1.0 / 3.0, thick, thin)
        i0[gid] = (np.asarray(rad.n0)[gid] * np.asarray(rad.n_0)[gid]
                   * ii_f[0] / n0_f[0] ** 4)

    wj = jnp.asarray(w, dtype=dtype)
    u = phys.prim_to_cons(wj)
    return phys.make_state(u, wj, jnp.asarray(i0, dtype=dtype))
