"""Radiation beam in (Cartesian Kerr-Schild) GR.

Parity target: reference src/pgen/tests/rad_beam.cpp +
src/srcterms/srcterms.cpp BeamSource — zero initial intensities, a
static beam injection term n^0 n_0 dii/dt over cells within the proper
width of the beam origin and angles within the spread of the (null)
beam direction, and zero-intensity user boundaries.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init(pin, mesh, phys):
    from ..gr.cks import metric
    from ..radiation.tetrad import tetrad

    rad = getattr(phys, "rad", phys)   # standalone or composed
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    blk = "rad_srcterms"
    dii_dt = pin.get_real(blk, "dii_dt")
    p1 = pin.get_real(blk, "pos_1")
    p2 = pin.get_real(blk, "pos_2")
    p3 = pin.get_real(blk, "pos_3")
    d1 = pin.get_real(blk, "dir_1")
    d2 = pin.get_real(blk, "dir_2")
    d3 = pin.get_real(blk, "dir_3")
    width = pin.get_real(blk, "width")
    spread = pin.get_real(blk, "spread")

    xv, yv, zv = rad._coords[:3]
    X = xv[:, None, None, :]
    Y = yv[:, None, :, None]
    Z = zv[:, :, None, None]
    shp = (xv.shape[0], zv.shape[1], yv.shape[1], xv.shape[1])
    X = np.broadcast_to(X, shp)
    Y = np.broadcast_to(Y, shp)
    Z = np.broadcast_to(Z, shp)
    gl, gu = metric(X, Y, Z, rad.spin, rad.minkowski)
    gl = [[np.asarray(gl[a][b]) for b in range(4)] for a in range(4)]
    e, _ = tetrad(X, Y, Z, rad.spin, rad.minkowski)

    dx1, dx2, dx3 = X - p1, Y - p2, Z - p3
    dx_sq = (gl[1][1] * dx1 * dx1 + 2 * gl[1][2] * dx1 * dx2
             + 2 * gl[1][3] * dx1 * dx3 + gl[2][2] * dx2 * dx2
             + 2 * gl[2][3] * dx2 * dx3 + gl[3][3] * dx3 * dx3)
    mu_min = math.cos(spread / 2.0 * math.pi / 180.0)

    # null time component of the beam direction
    ta = gl[0][0]
    tb = 2.0 * (gl[0][1] * d1 + gl[0][2] * d2 + gl[0][3] * d3)
    tc_ = (gl[1][1] * d1 * d1 + 2 * gl[1][2] * d1 * d2
           + 2 * gl[1][3] * d1 * d3 + gl[2][2] * d2 * d2
           + 2 * gl[2][3] * d2 * d3 + gl[3][3] * d3 * d3)
    d0 = (-tb - np.sqrt(tb * tb - 4.0 * ta * tc_)) / (2.0 * ta)

    dvec = [d0, d1, d2, d3]
    dc = [sum(gl[mu][nu] * dvec[nu] for nu in range(4))
          for mu in range(4)]
    # tetrad-frame covariant direction
    dt = [sum(np.asarray(e[a][mu]) * dc[mu] for mu in range(4))
          for a in range(4)]
    dtc = [dt[c] / (-dt[0]) for c in (1, 2, 3)]

    nh = rad.grid.nh  # [nangles, 3]
    mu_ang = (nh[:, 0].reshape(1, -1, 1, 1, 1) * dtc[0][:, None]
              + nh[:, 1].reshape(1, -1, 1, 1, 1) * dtc[1][:, None]
              + nh[:, 2].reshape(1, -1, 1, 1, 1) * dtc[2][:, None])
    in_beam = (dx_sq[:, None] < (width / 2.0) ** 2) & (mu_ang > mu_min)
    beam = np.where(in_beam,
                    np.asarray(rad.n0) * np.asarray(rad.n_0) * dii_dt,
                    0.0)
    # keep the beam table a host (numpy) constant so the shard cycle
    # can hand each device its own rows (radiation._lb)
    rad.beam_dii0 = np.asarray(beam, dtype=dtype)

    # zero-intensity user boundaries (reference: ZeroIntensity)
    mbi = mesh.mb_indcs
    ng = mbi.ng
    gmask = np.zeros(rad.shape, dtype=bool)
    for ax, n in (("x1", mbi.ncells1), ("x2", mbi.ncells2),
                  ("x3", mbi.ncells3)):
        for side in ("m", "p"):
            key = f"{ax}{side}"
            if mesh.mesh_bcs[("i" if side == "m" else "o") + ax] != "user":
                continue
            blocks = np.where(mesh.phys_bc_mask[key])[0]
            sl = [slice(None)] * 5
            a5 = {"x1": 4, "x2": 3, "x3": 2}[ax]
            sl[a5] = slice(0, ng) if side == "m" else slice(n - ng, n)
            for gid in blocks:
                sli = list(sl)
                sli[0] = gid
                gmask[tuple(sli)] = True
    def zero_bc(u, bv):
        # per-block host mask localized for the shard cycle (identity on
        # one device); pad slots get an all-False mask (local_blocks
        # zero-pads), i.e. no physical BC — matching shard_comm.pad_state
        from ..comm import local_blocks
        return jnp.where(jnp.asarray(local_blocks(gmask)), 0.0, u)

    zero_bc.shard_safe = True
    phys.bvals.user_bc_func = zero_bc
    i0 = jnp.zeros(rad.shape, dtype=dtype)
    if rad is phys:
        return phys.make_state(i0)
    raise NotImplementedError("rad_beam with a coupled fluid not wired")
