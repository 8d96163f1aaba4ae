"""Orszag-Tang vortex (2D MHD).

Parity target: reference src/pgen/tests/orszag_tang.cpp — B from the vector
potential A3 = (B0/4pi)(cos(4pi x) - 2 cos(2pi y)), d0=25/36pi, v0=1,
p0=5/12pi.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX, IVY, IVZ


def init(pin, mesh, phys):
    if not getattr(phys, "is_mhd", False):
        raise ValueError("orszag_tang requires <mhd>")
    B0 = 1.0 / math.sqrt(4.0 * math.pi)
    d0 = 25.0 / (36.0 * math.pi)
    v0 = 1.0
    p0 = 5.0 / (12.0 * math.pi)
    gm1 = phys.eos.gamma - 1.0

    def A3(x1, x2):
        return (B0 / (4.0 * math.pi)) * (np.cos(4.0 * math.pi * x1)
                                         - 2.0 * np.cos(2.0 * math.pi * x2))

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
    act = (slice(mbi.ks, mbi.ke + 1), slice(mbi.js, mbi.je + 1),
           slice(mbi.is_, mbi.is_ + mbi.nx1))
    for gid in range(nmb):
        # per-block spacings (level-dependent under SMR)
        dx1 = mesh.mb_size["dx1"][gid]
        dx2 = mesh.mb_size["dx2"][gid]
        x1v, x2v, x3v = mesh.cell_centers(gid)
        x1f, x2f, x3f = mesh.face_edges(gid)
        X2, X1 = np.meshgrid(x2v[act[1]], x1v[act[2]], indexing="ij")
        w[gid, IDN][act] = d0
        w[gid, IVX][act] = v0 * np.sin(2.0 * math.pi * X2)[None]
        w[gid, IVY][act] = -v0 * np.sin(2.0 * math.pi * X1)[None]
        w[gid, IEN][act] = p0 / gm1

        # staggered curl of A3 (2D; x3f layers identical zero)
        A = A3(x1f.reshape(1, -1), x2f.reshape(-1, 1))  # [n2+1, n1+1]
        bfc["x1f"][gid, 0] = (A[1:, :] - A[:-1, :]) / dx2
        bfc["x2f"][gid, 0] = -(A[:, 1:] - A[:, :-1]) / dx1

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)
    bfcj = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
    bcc = phys.compute_bcc(bfcj)
    u = phys.prim_to_cons(wj, bcc)
    return phys.make_state(u, wj, bfcj)
