"""2D r-z MRI (Hawley & Balbus 1992 "HB3").

Reference: src/pgen/fluids/mri2d.cpp + inputs/shearing_box/mri2d.athinput.
In the 2D r-z shearing box the grid plane is (x1, x2) = (R, z), the
toroidal direction maps to component 3, and the vertical seed field is
the x2 face field:

  ifield = 1 : B2 = binit sin(kx x1)  (zero net flux)
  ifield = 2 : B2 = binit             (net vertical flux)

with random pressure (ideal) / density (isothermal) perturbations
seeding the instability.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IM1, IM2, IM3


def init(pin, mesh, phys):
    if not getattr(phys, "is_mhd", False):
        raise ValueError("mri2d only works in mhd")
    if phys.psbox is None:
        raise ValueError("mri2d requires the <shearing_box> block")
    if mesh.mb_indcs.nx3 > 1:
        raise ValueError("mri2d is the 2D (nx3=1) r-z problem; "
                         "use mri3d in 3D")
    eos = phys.eos
    amp = pin.get_real("problem", "amp")
    beta = pin.get_real("problem", "beta")
    nwx = pin.get_or_add_integer("problem", "nwx", 1)
    ifield = pin.get_or_add_integer("problem", "ifield", 1)
    d0, p0 = 1.0, 1.0
    binit = math.sqrt(2.0 * p0 / beta)
    ms = mesh.mesh_size
    kx = 2.0 * math.pi / (ms.x1max - ms.x1min) * nwx

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    gm1 = eos.gamma - 1.0 if eos.is_ideal else 0.0
    u = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
    act = (slice(mbi.ks, mbi.ke + 1), slice(mbi.js, mbi.je + 1),
           slice(mbi.is_, mbi.ie + 1))
    rng = np.random.default_rng(13)

    for gid in range(nmb):
        x1v, _, _ = mesh.cell_centers(gid)
        bz = binit * np.sin(kx * x1v[None, None, mbi.is_:mbi.ie + 1]) \
            if ifield == 1 else binit + 0.0 * x1v[None, None,
                                                  mbi.is_:mbi.ie + 1]
        if ifield not in (1, 2):
            raise ValueError(f"mri2d ifield={ifield} not in (1,2)")
        # constant along x2, so the one-extra-face fill keeps div B = 0
        bfc["x2f"][gid][(act[0], slice(mbi.js, mbi.je + 2), act[2])] = bz

        shape = (mbi.ke + 1 - mbi.ks, mbi.je + 1 - mbi.js,
                 mbi.ie + 1 - mbi.is_)
        rval = 1.0 + amp * (rng.random(shape) - 0.5)
        rd = rval * d0 if not eos.is_ideal else d0 + 0.0 * rval
        u[gid, IDN][act] = rd
        for comp in (IM1, IM2, IM3):
            u[gid, comp][act] = 0.0
        if eos.is_ideal:
            rp = rval * p0
            u[gid, IEN][act] = rp / gm1 + 0.5 * bz ** 2

    dtype = jnp.zeros(0).dtype
    uj = jnp.asarray(u, dtype=dtype)
    bj = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
    bcc = phys.compute_bcc(bj)
    w, uj, _ = jax.jit(phys.cons_to_prim)(uj, bcc)
    return phys.make_state(uj, w, bj)
