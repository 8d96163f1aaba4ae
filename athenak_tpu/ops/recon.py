"""Spatial reconstruction: DC, PLM, PPM4, PPMX, WENO-Z.

Numerically equivalent to the reference per-cell inline functions
(reference: src/reconstruct/{plm,ppm,wenoz}.hpp), re-expressed as vectorized
stencil ops over whole block arrays.  Uniform grids only (as the reference).

Face convention: for reconstruction along ``axis``, the returned arrays
``(wl, wr)`` hold the left/right states at *face i* (the lower face of cell
i): ``wl[..., i]`` comes from cell i-1's right edge, ``wr[..., i]`` from cell
i's left edge.  Entries in the first ``ng`` and last ``ng-1`` face slots are
garbage (stencil wraps around via roll) — callers only consume faces
``is .. ie+1``, which is exactly the range the reference writes
(reference: src/reconstruct/recon.hpp:23-135).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp


def _sh(q, s: int, axis: int):
    """q shifted so result[i] = q[i + s] (circular; edges are garbage)."""
    return jnp.roll(q, -s, axis=axis)


def dc(q, axis: int):
    """Donor-cell (piecewise constant)."""
    return _sh(q, -1, axis), q


def plm(q, axis: int):
    """Piecewise linear with van-Leer (harmonic-mean) limiter
    (reference: src/reconstruct/plm.hpp:20-37)."""
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    dql = q - qm1
    dqr = qp1 - q
    dq2 = dql * dqr
    denom = dql + dqr
    # 0/0 inside the untaken branch is discarded by where()
    dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(q), dq2 / denom)
    ql_cell = q + dqm       # right edge of cell i -> left state at face i+1
    qr_cell = q - dqm       # left edge of cell i  -> right state at face i
    return _sh(ql_cell, -1, axis), qr_cell


def _ppm_interfaces(q, axis: int):
    """4th-order interface interpolants a_{j,-}, a_{j,+} (CS eqn 16)."""
    qm2 = _sh(q, -2, axis)
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    qp2 = _sh(q, +2, axis)
    qlv = (7.0 * (q + qm1) - (qm2 + qp1)) / 12.0
    qrv = (7.0 * (q + qp1) - (qm1 + qp2)) / 12.0
    return qm2, qm1, qp1, qp2, qlv, qrv


def ppm4(q, axis: int):
    """Original PPM with Colella-Woodward limiters
    (reference: src/reconstruct/ppm.hpp PPM4)."""
    _, qm1, qp1, _, qlv, qrv = _ppm_interfaces(q, axis)

    # limit to neighboring cell-centered values (CS eqn 13)
    qlv = jnp.clip(qlv, jnp.minimum(q, qm1), jnp.maximum(q, qm1))
    qrv = jnp.clip(qrv, jnp.minimum(q, qp1), jnp.maximum(q, qp1))

    # monotonize (CS eqns 14, 15)
    qc = qrv - q
    qd = qlv - q
    flat = (qc * qd) >= 0.0
    qrv_m = jnp.where(jnp.abs(qc) >= 2.0 * jnp.abs(qd), q - 2.0 * qd, qrv)
    qlv_m = jnp.where(jnp.abs(qd) >= 2.0 * jnp.abs(qc), q - 2.0 * qc, qlv)
    qlv = jnp.where(flat, q, qlv_m)
    qrv = jnp.where(flat, q, qrv_m)

    return _sh(qrv, -1, axis), qlv


def _sign(x):
    return jnp.where(x < 0.0, -1.0, 1.0)


def _limit_d2(d2qc, d2ql, d2qr):
    """PH 3.36 second-derivative limiter."""
    lim_slope = jnp.minimum(jnp.abs(d2ql), jnp.abs(d2qr))
    same_pos = (d2qc > 0.0) & (d2ql > 0.0) & (d2qr > 0.0)
    same_neg = (d2qc < 0.0) & (d2ql < 0.0) & (d2qr < 0.0)
    lim = _sign(d2qc) * jnp.minimum(1.25 * lim_slope, jnp.abs(d2qc))
    return jnp.where(same_pos | same_neg, lim, 0.0)


def ppmx(q, axis: int):
    """PPM with Colella-Sekora extremum-preserving limiters
    (reference: src/reconstruct/ppm.hpp PPMX)."""
    qm2, qm1, qp1, qp2, qlv, qrv = _ppm_interfaces(q, axis)

    # ---- CS monotonicity limiters on qlv ----
    d2qc = 3.0 * ((qm1 + q) - 2.0 * qlv)
    d2ql = (qm2 + q) - 2.0 * qm1
    d2qr = (qm1 + qp1) - 2.0 * q
    d2qlim = _limit_d2(d2qc, d2ql, d2qr)
    qlv = jnp.where((qm1 - qlv) * (q - qlv) > 0.0,
                    0.5 * (q + qm1) - d2qlim / 6.0, qlv)

    # ---- same for qrv ----
    d2qc = 3.0 * ((q + qp1) - 2.0 * qrv)
    d2ql_r = d2qr
    d2qr_r = (q + qp2) - 2.0 * qp1
    d2qlim = _limit_d2(d2qc, d2ql_r, d2qr_r)
    qrv = jnp.where((q - qrv) * (qp1 - qrv) > 0.0,
                    0.5 * (q + qp1) - d2qlim / 6.0, qrv)

    # ---- extremum detection + smooth-extremum limiter (CS 20, PH 3.31) ----
    qa = (qrv - q) * (q - qlv)
    qb = (qm1 - q) * (q - qp1)
    at_extremum = (qa <= 0.0) | (qb <= 0.0)

    d2q = 6.0 * (qlv + qrv - 2.0 * q)
    d2qc_e = (qm1 + qp1) - 2.0 * q
    d2ql_e = (qm2 + q) - 2.0 * qm1
    d2qr_e = (q + qp2) - 2.0 * qp1
    lim_slope = jnp.minimum(jnp.abs(d2ql_e), jnp.abs(d2qr_e))
    lim_slope = jnp.minimum(jnp.abs(d2qc_e), lim_slope)
    same_pos = (d2qc_e > 0.0) & (d2ql_e > 0.0) & (d2qr_e > 0.0) & (d2q > 0.0)
    same_neg = (d2qc_e < 0.0) & (d2ql_e < 0.0) & (d2qr_e < 0.0) & (d2q < 0.0)
    d2qlim_e = jnp.where(same_pos | same_neg,
                         _sign(d2q) * jnp.minimum(1.25 * lim_slope,
                                                  jnp.abs(d2q)), 0.0)
    sensitive = jnp.abs(d2q) > 1.0e-12 * jnp.maximum(
        jnp.abs(qm1), jnp.maximum(jnp.abs(q), jnp.abs(qp1)))
    # 0/0 in the untaken branch discarded by where()
    rho = jnp.where(sensitive, d2qlim_e / jnp.where(d2q == 0.0, 1.0, d2q), 0.0)
    qlv_ext = q + (qlv - q) * rho
    qrv_ext = q + (qrv - q) * rho

    # ---- away from extrema: CW monotonization (CW 1.10, PH 3.32) ----
    qc = qrv - q
    qd = qlv - q
    qrv_mono = jnp.where(jnp.abs(qc) >= 2.0 * jnp.abs(qd), q - 2.0 * qd, qrv)
    qlv_mono = jnp.where(jnp.abs(qd) >= 2.0 * jnp.abs(qc), q - 2.0 * qc, qlv)

    qlv = jnp.where(at_extremum, qlv_ext, qlv_mono)
    qrv = jnp.where(at_extremum, qrv_ext, qrv_mono)

    return _sh(qrv, -1, axis), qlv


def wenoz(q, axis: int):
    """5th-order WENO-Z (reference: src/reconstruct/wenoz.hpp)."""
    qm2 = _sh(q, -2, axis)
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    qp2 = _sh(q, +2, axis)

    b0c, b1c = 13.0 / 12.0, 0.25
    beta0 = b0c * (qm2 + q - 2.0 * qm1) ** 2 + b1c * (qm2 + 3.0 * q - 4.0 * qm1) ** 2
    beta1 = b0c * (qm1 + qp1 - 2.0 * q) ** 2 + b1c * (qm1 - qp1) ** 2
    beta2 = b0c * (qp2 + q - 2.0 * qp1) ** 2 + b1c * (qp2 + 3.0 * q - 4.0 * qp1) ** 2

    eps = 1.0e-42
    tau5 = jnp.abs(beta0 - beta2)
    ind0 = (tau5 / (beta0 + eps)) ** 2
    ind1 = (tau5 / (beta1 + eps)) ** 2
    ind2 = (tau5 / (beta2 + eps)) ** 2

    # left state at face i+1 (from cell i's right edge)
    f0 = 2.0 * qm2 - 7.0 * qm1 + 11.0 * q
    f1 = -qm1 + 5.0 * q + 2.0 * qp1
    f2 = 2.0 * q + 5.0 * qp1 - qp2
    a0 = 0.1 * (1.0 + ind0)
    a1 = 0.6 * (1.0 + ind1)
    a2 = 0.3 * (1.0 + ind2)
    ql_cell = (f0 * a0 + f1 * a1 + f2 * a2) / (6.0 * (a0 + a1 + a2))

    # right state at face i (from cell i's left edge): mirrored stencil
    g0 = 2.0 * qp2 - 7.0 * qp1 + 11.0 * q
    g1 = -qp1 + 5.0 * q + 2.0 * qm1
    g2 = 2.0 * q + 5.0 * qm1 - qm2
    c0 = 0.1 * (1.0 + ind2)
    c2 = 0.3 * (1.0 + ind0)
    qr_cell = (g0 * c0 + g1 * a1 + g2 * c2) / (6.0 * (c0 + a1 + c2))

    return _sh(ql_cell, -1, axis), qr_cell


def teno(q, axis: int):
    """5th-order TENO (Fu et al. 2016/2019; reference:
    src/reconstruct/teno.hpp): WENO-Z smoothness indicators with a hard
    cut-off selector — candidate stencils are either fully on (weight
    from the optimal linear combination) or fully off."""
    qm2 = _sh(q, -2, axis)
    qm1 = _sh(q, -1, axis)
    qp1 = _sh(q, +1, axis)
    qp2 = _sh(q, +2, axis)

    b0c, b1c = 13.0 / 12.0, 0.25
    beta0 = b0c * (qm2 + q - 2.0 * qm1) ** 2 \
        + b1c * (qm2 + 3.0 * q - 4.0 * qm1) ** 2
    beta1 = b0c * (qm1 + qp1 - 2.0 * q) ** 2 + b1c * (qm1 - qp1) ** 2
    beta2 = b0c * (qp2 + q - 2.0 * qp1) ** 2 \
        + b1c * (qp2 + 3.0 * q - 4.0 * qp1) ** 2

    eps_t, c_t = 1.0e-40, 1.0e-6
    al0 = 1.0 / (beta0 + eps_t) ** 6
    al1 = 1.0 / (beta1 + eps_t) ** 6
    al2 = 1.0 / (beta2 + eps_t) ** 6
    asum = al0 + al1 + al2
    ind0 = jnp.where(al0 < c_t * asum, 0.0, 1.0)
    ind1 = jnp.where(al1 < c_t * asum, 0.0, 1.0)
    ind2 = jnp.where(al2 < c_t * asum, 0.0, 1.0)

    f0 = 2.0 * qm2 - 7.0 * qm1 + 11.0 * q
    f1 = -qm1 + 5.0 * q + 2.0 * qp1
    f2 = 2.0 * q + 5.0 * qp1 - qp2
    a0 = 0.1 * ind0
    a1 = 0.6 * ind1
    a2 = 0.3 * ind2
    ql_cell = (f0 * a0 + f1 * a1 + f2 * a2) / (6.0 * (a0 + a1 + a2))

    g0 = 2.0 * qp2 - 7.0 * qp1 + 11.0 * q
    g1 = -qp1 + 5.0 * q + 2.0 * qm1
    g2 = 2.0 * q + 5.0 * qm1 - qm2
    c0 = 0.1 * ind2
    c2 = 0.3 * ind0
    qr_cell = (g0 * c0 + g1 * a1 + g2 * c2) / (6.0 * (c0 + a1 + c2))

    return _sh(ql_cell, -1, axis), qr_cell


RECON_FNS = {"dc": dc, "plm": plm, "ppm4": ppm4, "ppmx": ppmx,
             "wenoz": wenoz, "teno": teno}

# methods whose L/R states must be floored on density/energy channels
# (reference: src/reconstruct/recon.hpp:78-110 applies floors for ppmx/wenoz/teno)
FLOORED_METHODS = ("ppmx", "wenoz", "teno")


def reconstruct(method: str, q, axis: int):
    return RECON_FNS[method](q, axis)
