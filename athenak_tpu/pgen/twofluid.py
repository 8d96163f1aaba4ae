"""Two-fluid (ion-neutral) uniform initial state with velocity offset.

(reference: src/pgen/fluids/twofluid.cpp — uniform two-fluid states for
coupling/C-shock tests; parameters d_i, d_n, p_i, p_n, v*_i, v*_n, b0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX, IVY, IVZ


def init(pin, mesh, phys):
    gm1 = phys.eos.gamma - 1.0
    mbi = mesh.mb_indcs
    shape = (mesh.nmb_total, phys.phydro.nvar,
             mbi.ncells3, mbi.ncells2, mbi.ncells1)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # optional sinusoidal vx perturbation: gives the uniform coupling
    # state spatial structure so multi-block/multi-device runs exercise
    # the halo exchange (amp = 0 reproduces the reference's uniform IC)
    amp = pin.get_or_add_real("problem", "amp", 0.0)
    x1min = pin.get_real("mesh", "x1min")
    x1max = pin.get_real("mesh", "x1max")

    def fluid(prefix, nvar):
        w = np.zeros((mesh.nmb_total, nvar,
                      mbi.ncells3, mbi.ncells2, mbi.ncells1))
        w[:, IDN] = pin.get_or_add_real("problem", f"d_{prefix}", 1.0)
        w[:, IVX] = pin.get_or_add_real("problem", f"vx_{prefix}", 0.0)
        w[:, IVY] = pin.get_or_add_real("problem", f"vy_{prefix}", 0.0)
        w[:, IVZ] = pin.get_or_add_real("problem", f"vz_{prefix}", 0.0)
        w[:, IEN] = pin.get_or_add_real("problem", f"p_{prefix}", 1.0) / gm1
        if amp != 0.0:
            for g in range(mesh.nmb_total):
                xv, _yv, _zv = mesh.cell_centers(g)
                ph = 2.0 * np.pi * (xv - x1min) / (x1max - x1min)
                w[g, IVX] += amp * np.sin(ph)[None, None, :]
        return jnp.asarray(w, dtype=dtype)

    wn = fluid("n", phys.phydro.nvar)
    wi = fluid("i", phys.pmhd.nvar)

    b0 = pin.get_or_add_real("problem", "b0", 0.0)
    bfc = {k: np.zeros(s) for k, s in phys.pmhd.fc_shapes.items()}
    bfc["x1f"][:] = b0
    bfcj = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
    bcc = phys.pmhd.compute_bcc(bfcj)

    un = phys.phydro.prim_to_cons(wn)
    ui = phys.pmhd.prim_to_cons(wi, bcc)
    return phys.make_state(un, wn, ui, wi, bfcj)
