"""Shock tube (Riemann problem) generator.

Parity target: reference src/pgen/tests/shock_tube.cpp — discontinuous L/R
states along a chosen direction at position xshock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX, IVY, IVZ


def init(pin, mesh, phys):
    shock_dir = pin.get_integer("problem", "shock_dir")
    xshock = pin.get_real("problem", "xshock")
    # dynamical-GR runs store pressure (not internal energy) in the IEN
    # primitive slot and use the primitive-solver EOS framework
    # (reference: shock_tube.cpp dyngr branch)
    is_dyngr = hasattr(phys, "ps")

    wl = [pin.get_real("problem", "dl"),
          pin.get_real("problem", "ul"),
          pin.get_real("problem", "vl"),
          pin.get_real("problem", "wl")]
    wr = [pin.get_real("problem", "dr"),
          pin.get_real("problem", "ur"),
          pin.get_real("problem", "vr"),
          pin.get_real("problem", "wr")]
    if is_dyngr:
        wl.append(pin.get_real("problem", "pl"))
        wr.append(pin.get_real("problem", "pr"))
    elif phys.eos.is_ideal:
        gm1 = phys.eos.gamma - 1.0
        wl.append(pin.get_real("problem", "pl") / gm1)
        wr.append(pin.get_real("problem", "pr") / gm1)

    # map shock-normal velocity into the correct slot
    if shock_dir == 1:
        perm = (IVX, IVY, IVZ)
    elif shock_dir == 2:
        perm = (IVY, IVZ, IVX)
    elif shock_dir == 3:
        perm = (IVZ, IVX, IVY)
    else:
        raise ValueError("problem/shock_dir must be 1, 2, or 3")

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1),
                 dtype=np.float64)
    a = slice(mbi.ks, mbi.ke + 1), slice(mbi.js, mbi.je + 1), \
        slice(mbi.is_, mbi.ie + 1)

    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        coords = (x1v, x2v, x3v)[shock_dir - 1]
        c = coords[(mbi.is_, mbi.js, mbi.ks)[shock_dir - 1]:
                   (mbi.ie, mbi.je, mbi.ke)[shock_dir - 1] + 1]
        if shock_dir == 1:
            mask = c.reshape(1, 1, -1) < xshock
        elif shock_dir == 2:
            mask = c.reshape(1, -1, 1) < xshock
        else:
            mask = c.reshape(-1, 1, 1) < xshock
        shape = (mbi.ke - mbi.ks + 1, mbi.je - mbi.js + 1,
                 mbi.ie - mbi.is_ + 1)
        mask = np.broadcast_to(mask, shape)

        w[gid, IDN][a] = np.where(mask, wl[0], wr[0])
        w[gid, perm[0]][a] = np.where(mask, wl[1], wr[1])
        w[gid, perm[1]][a] = np.where(mask, wl[2], wr[2])
        w[gid, perm[2]][a] = np.where(mask, wl[3], wr[3])
        if phys.eos.is_ideal:
            w[gid, IEN][a] = np.where(mask, wl[4], wr[4])

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)
    if getattr(phys, "is_mhd", False):
        # MHD shock tubes: uniform field from problem/bxl etc. (Brio-Wu)
        bxl = pin.get_or_add_real("problem", "bxl", 0.0)
        byl = pin.get_or_add_real("problem", "byl", 0.0)
        bzl = pin.get_or_add_real("problem", "bzl", 0.0)
        bxr = pin.get_or_add_real("problem", "bxr", bxl)
        byr = pin.get_or_add_real("problem", "byr", byl)
        bzr = pin.get_or_add_real("problem", "bzr", bzl)
        bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
        for gid in range(mesh.nmb_total):
            x1f, x2f, x3f = mesh.face_edges(gid)
            x1v, x2v, x3v = mesh.cell_centers(gid)
            coords_f = (x1f, x2v, x3v)  # x1f faces use face coords in x1
            if shock_dir != 1:
                raise NotImplementedError("MHD shock tube only along x1")
            bfc["x1f"][gid] = np.where(x1f.reshape(1, 1, -1) < xshock,
                                       bxl, bxr)
            bfc["x2f"][gid] = np.where(x1v.reshape(1, 1, -1) < xshock,
                                       byl, byr)
            bfc["x3f"][gid] = np.where(x1v.reshape(1, 1, -1) < xshock,
                                       bzl, bzr)
        bfc = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
        bcc = phys.compute_bcc(bfc)
        if is_dyngr:
            # fixed Minkowski ADM background (<mhd>+<adm> mode;
            # reference: inputs/dyn_grmhd/sod.athinput coord/minkowski)
            shp = (mesh.nmb_total, mbi.ncells3, mbi.ncells2, mbi.ncells1)
            one = np.ones(shp)
            zero = np.zeros(shp)
            phys.set_fixed_adm(
                [one, zero, zero, one, zero, one], one,
                [zero, zero, zero])
            adm = phys.adm_of({})
            n = wj[:, IDN] / phys.ps.mb
            T = phys.policy.temperature_from_p(
                jnp.maximum(n, phys.ps.n_atm), wj[:, IEN])
            u = phys.prim_to_cons_state(wj, T, bcc, adm)
            return phys.make_state(u, wj, bfc, T=T)
        u = phys.prim_to_cons(wj, bcc)
        return phys.make_state(u, wj, bfc)
    u = phys.prim_to_cons(wj)
    return phys.make_state(u, wj)
