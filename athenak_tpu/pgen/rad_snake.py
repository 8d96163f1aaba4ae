"""Radiation beam in snake coordinates (sinusoidally sheared Minkowski).

Parity target: reference src/pgen/radiation/rad_snake.cpp +
inputs/radiation/snake.athinput — the per-cell metric/tetrad override
test: flat spacetime in "snake" coordinates y' = y, x' = x + A sin(k y)
whose metric has off-diagonal g_{12} = -A k pi cos(k pi y) terms, with
either the Cartesian-aligned or the snake-aligned tetrad
(snake_tet flag), a beam source whose direction follows the snake, and
zero-intensity user boundaries.

The beam must propagate along the snaky characteristic; with the
tetrad override exercised through Radiation.set_geometry every derived
table (n^0, n_0, face n^d, angular speeds na) is rebuilt from the
user metric exactly like the reference's pgen overwrites tet_c /
tetcov_c / na (rad_snake.cpp:60-240).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _snake_terms(Y, mag, kym):
    ct = -mag * kym * math.pi * np.cos(kym * math.pi * Y)
    st = mag * (kym * math.pi) ** 2 * np.sin(kym * math.pi * Y)
    return ct, st


def snake_metric(X, Y, Z, mag, kym):
    """(glower, gupper) 4x4 nested lists of arrays
    (rad_snake.cpp:270-300)."""
    ct, _ = _snake_terms(Y, mag, kym)
    zero = np.zeros(np.broadcast(X, Y, Z).shape)
    one = 1.0 + zero
    g = [[zero] * 4 for _ in range(4)]
    gi = [[zero] * 4 for _ in range(4)]
    g = [[zero, zero, zero, zero],
         [zero, one, -ct + zero, zero],
         [zero, -ct + zero, 1.0 + ct * ct, zero],
         [zero, zero, zero, one]]
    g[0] = [-one, zero, zero, zero]
    gi = [[-one, zero, zero, zero],
          [zero, 1.0 + ct * ct, ct + zero, zero],
          [zero, ct + zero, one, zero],
          [zero, zero, zero, one]]
    return g, gi


def _snake_full(X, Y, Z, mag, kym, snake_tet):
    """(g, gi, e, ecov, omega): the complete snake geometry
    (ComputeSnakeMetricAndTetrad, rad_snake.cpp:270-370)."""
    ct, st = _snake_terms(Y, mag, kym)
    shp = np.broadcast(X, Y, Z).shape
    zero = np.zeros(shp)
    one = 1.0 + zero
    g, gi = snake_metric(X, Y, Z, mag, kym)

    # derivatives of the covariant metric dg[k][i][j] = d_k g_ij
    dg = [[[zero for _ in range(4)] for _ in range(4)] for _ in range(4)]
    dg[2][1][2] = -st + zero
    dg[2][2][1] = -st + zero
    dg[2][2][2] = 2.0 * ct * st

    # tetrad e[a][mu] + derivatives de[k][a][mu] = d_k e_(a)^mu
    de = [[[zero for _ in range(4)] for _ in range(4)] for _ in range(4)]
    if not snake_tet:
        # Cartesian-aligned tetrad (rad_snake.cpp:305-315)
        e = [[one, zero, zero, zero],
             [zero, one, zero, zero],
             [zero, ct + zero, one, zero],
             [zero, zero, zero, one]]
        de[2][2][1] = st + zero
    else:
        # snake-aligned tetrad (rad_snake.cpp:317-330)
        rt = np.sqrt(1.0 + ct * ct)
        e = [[one, zero, zero, zero],
             [zero, rt, ct / rt, zero],
             [zero, zero, 1.0 / rt, zero],
             [zero, zero, zero, one]]
        de[2][1][1] = ct * st / rt
        de[2][1][2] = st / rt ** 3
        de[2][2][2] = -ct * st / rt ** 3

    eta = np.diag([-1.0, 1.0, 1.0, 1.0])

    # covariant tetrad, raised-index inverse, Christoffels
    ecov = [[sum(g[j][k] * e[i][k] for k in range(4)) for j in range(4)]
            for i in range(4)]
    ei = [[sum(eta[i][k] * g[j][ll] * e[k][ll]
               for k in range(4) for ll in range(4))
           for j in range(4)] for i in range(4)]
    gamma = [[[sum(0.5 * gi[i][ll] * (dg[j][ll][k] + dg[k][ll][j]
                                      - dg[ll][j][k])
                   for ll in range(4))
               for k in range(4)] for j in range(4)] for i in range(4)]

    # Ricci rotation coefficients (rad_snake.cpp:352-367)
    omega = [[[zero for _ in range(4)] for _ in range(4)]
             for _ in range(4)]
    for i in range(4):
        for j in range(4):
            for k in range(4):
                v = zero
                for ll in range(4):
                    for m in range(4):
                        v = v + ei[i][ll] * e[k][m] * de[m][j][ll]
                        for n in range(4):
                            v = v + (ei[i][ll] * e[k][m]
                                     * gamma[ll][m][n] * e[j][n])
                omega[i][j][k] = v
    return g, gi, e, ecov, omega


def init(pin, mesh, phys):
    rad = getattr(phys, "rad", phys)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    mag = pin.get_real("problem", "snake_mag")
    kym = pin.get_real("problem", "snake_kym")
    snake_tet = pin.get_or_add_boolean("problem", "snake_tet", False)
    dii_dt = pin.get_or_add_real("radiation", "dii_dt", 1.0)
    pin.get_or_add_boolean("radiation", "beam_source", True)
    p1 = pin.get_real("problem", "pos_1")
    p2 = pin.get_real("problem", "pos_2")
    p3 = pin.get_real("problem", "pos_3")
    width = pin.get_real("problem", "width")
    spread = pin.get_real("problem", "spread")

    # install the snake geometry: every derived table rebuilds
    rad.set_geometry(
        lambda X, Y, Z: _snake_full(X, Y, Z, mag, kym, snake_tet)[2:4],
        lambda X, Y, Z: _snake_full(X, Y, Z, mag, kym, snake_tet)[4])

    # ---- beam mask in snake coordinates (rad_snake.cpp:192-265) ----
    xv, yv, zv = rad._coords[:3]
    X = np.broadcast_to(xv[:, None, None, :],
                        (xv.shape[0], zv.shape[1], yv.shape[1],
                         xv.shape[1]))
    Y = np.broadcast_to(yv[:, None, :, None], X.shape)
    Z = np.broadcast_to(zv[:, :, None, None], X.shape)
    gl, _gi, e, _ecov, _ = _snake_full(X, Y, Z, mag, kym, snake_tet)

    dx1, dx2, dx3 = X - p1, Y - p2, Z - p3
    dx_sq = (gl[1][1] * dx1 * dx1 + 2 * gl[1][2] * dx1 * dx2
             + 2 * gl[1][3] * dx1 * dx3 + gl[2][2] * dx2 * dx2
             + 2 * gl[2][3] * dx2 * dx3 + gl[3][3] * dx3 * dx3)
    mu_min = math.cos(spread / 2.0 * math.pi / 180.0)

    # beam direction follows the snake: d ~ (-A k pi cos(k pi y), 1, 0)
    dmag = np.sqrt(1.0 + (mag * kym * math.pi
                          * np.cos(kym * math.pi * Y)) ** 2)
    d1 = (-mag * kym * math.pi * np.cos(kym * math.pi * Y)) / dmag
    d2 = 1.0 / dmag
    d3 = np.zeros_like(d2)
    ta = gl[0][0]
    tb = 2.0 * (gl[0][1] * d1 + gl[0][2] * d2 + gl[0][3] * d3)
    tc_ = (gl[1][1] * d1 * d1 + 2 * gl[1][2] * d1 * d2
           + 2 * gl[1][3] * d1 * d3 + gl[2][2] * d2 * d2
           + 2 * gl[2][3] * d2 * d3 + gl[3][3] * d3 * d3)
    d0 = (-tb - np.sqrt(tb * tb - 4.0 * ta * tc_)) / (2.0 * ta)

    dc = [sum(gl[min(a, b)][max(a, b)] * dv
              for b, dv in enumerate((d0, d1, d2, d3)))
          for a in range(4)]
    # covariant direction in the tetrad frame
    dtc0 = sum(np.asarray(e[0][b]) * dc[b] for b in range(4))
    dtc = [sum(np.asarray(e[a][b]) * dc[b] for b in range(4)) / (-dtc0)
           for a in range(1, 4)]

    nh = rad.grid.nh  # [nangles, 3]
    mu_ang = (nh[:, 0].reshape(1, -1, 1, 1, 1) * dtc[0][:, None]
              + nh[:, 1].reshape(1, -1, 1, 1, 1) * dtc[1][:, None]
              + nh[:, 2].reshape(1, -1, 1, 1, 1) * dtc[2][:, None])
    in_beam = (dx_sq[:, None] < (width / 2.0) ** 2) & (mu_ang > mu_min)
    beam = np.where(in_beam,
                    np.asarray(rad.n0) * np.asarray(rad.n_0) * dii_dt,
                    0.0)
    rad.beam_dii0 = np.asarray(beam, dtype=dtype)

    # zero-intensity user boundaries on the outflow faces
    mbi = mesh.mb_indcs
    ng = mbi.ng
    gmask = np.zeros(rad.shape, dtype=bool)
    for ax, n in (("x1", mbi.ncells1), ("x2", mbi.ncells2)):
        for side in ("m", "p"):
            if mesh.mesh_bcs[("i" if side == "m" else "o") + ax] != \
                    "user":
                continue
            blocks = np.where(mesh.phys_bc_mask[f"{ax}{side}"])[0]
            sl = [slice(None)] * 5
            a5 = {"x1": 4, "x2": 3}[ax]
            sl[a5] = slice(0, ng) if side == "m" else slice(n - ng, n)
            for gid in blocks:
                sli = list(sl)
                sli[0] = gid
                gmask[tuple(sli)] = True

    def zero_bc(u, bv):
        from ..comm import local_blocks
        return jnp.where(jnp.asarray(local_blocks(gmask)), 0.0, u)

    zero_bc.shard_safe = True
    phys.bvals.user_bc_func = zero_bc
    i0 = jnp.zeros(rad.shape, dtype=dtype)
    return phys.make_state(i0)
