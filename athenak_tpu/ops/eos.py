"""Equations of state: conserved <-> primitive conversions and wave speeds.

Newtonian ideal/isothermal gas for hydro and MHD, vectorized over whole
block arrays.  Semantics match the reference single-state inline functions
(reference: src/eos/ideal_c2p_hyd.hpp:22-83, src/eos/eos.hpp:27-190),
including the floor cascade (density -> energy -> temperature -> entropy)
and the correction of conserved energy when a floor fires.

Floor-hit counts are returned so callers can accumulate the reference's
EventCounters (reference: src/mesh/mesh.hpp:70-74).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from ..indices import IDN, IM1, IM2, IM3, IEN, IVX, IVY, IVZ


@dataclass(frozen=True)
class EOSData:
    """Static EOS parameters, captured by jitted kernels.

    Mirrors the reference ``EOS_Data`` POD (reference: src/eos/eos.hpp:27-40).
    """
    gamma: float = 5.0 / 3.0
    iso_cs: float = 1.0
    is_ideal: bool = True
    dfloor: float = float(jnp.finfo(jnp.float32).tiny)
    pfloor: float = float(jnp.finfo(jnp.float32).tiny)
    tfloor: float = float(jnp.finfo(jnp.float32).tiny)
    sfloor: float = float(jnp.finfo(jnp.float32).tiny)
    gamma_max: float = float(jnp.finfo(jnp.float32).max)
    sigma_max: float = float(jnp.finfo(jnp.float32).max)

    @classmethod
    def from_input(cls, pin, block: str) -> "EOSData":
        tiny = float(jnp.finfo(jnp.float32).tiny)
        eos_type = pin.get_string(block, "eos")
        if eos_type not in ("ideal", "isothermal"):
            raise ValueError(f"<{block}>/eos = '{eos_type}' not supported")
        return cls(
            gamma=pin.get_or_add_real(block, "gamma", 5.0 / 3.0),
            iso_cs=pin.get_or_add_real(block, "iso_sound_speed", 1.0),
            is_ideal=(eos_type == "ideal"),
            dfloor=pin.get_or_add_real(block, "dfloor", tiny),
            pfloor=pin.get_or_add_real(block, "pfloor", tiny),
            tfloor=pin.get_or_add_real(block, "tfloor", tiny),
            sfloor=pin.get_or_add_real(block, "sfloor", tiny),
            gamma_max=pin.get_or_add_real(block, "gamma_max",
                                          float(jnp.finfo(jnp.float32).max)),
            sigma_max=pin.get_or_add_real(block, "sigma_max",
                                          float(jnp.finfo(jnp.float32).max)),
        )

    def pressure(self, eint):
        """p = (gamma-1) e (reference IdealGasPressure)."""
        return (self.gamma - 1.0) * eint

    def hydro_sound_speed(self, d, p):
        return jnp.sqrt(self.gamma * p / d)

    def mhd_fast_speed(self, d, p, bx, by, bz):
        """Fast magnetosonic speed (reference IdealMHDFastSpeed)."""
        asq = self.gamma * p if self.is_ideal else (self.iso_cs ** 2) * d
        ct2 = by * by + bz * bz
        qsq = bx * bx + ct2 + asq
        tmp = bx * bx + ct2 - asq
        return jnp.sqrt(0.5 * (qsq + jnp.sqrt(tmp * tmp + 4.0 * asq * ct2)) / d)


# ---------------------------------------------------------------- hydro c2p
def cons_to_prim_hydro(u, eos: EOSData):
    """Vectorized Newtonian hydro c2p over [..., nvar, nz, ny, nx] arrays.

    Returns (w, u_fixed, counters) where u_fixed has floor corrections folded
    back into the conserved state (the reference mutates cons in place) and
    counters = dict of scalar floor-hit counts.
    """
    d = u[..., IDN, :, :, :]
    mx = u[..., IM1, :, :, :]
    my = u[..., IM2, :, :, :]
    mz = u[..., IM3, :, :, :]

    dfloor_used = d < eos.dfloor
    d = jnp.maximum(d, eos.dfloor)

    di = 1.0 / d
    vx, vy, vz = di * mx, di * my, di * mz

    counters = {"neos_dfloor": jnp.sum(dfloor_used)}

    if eos.is_ideal:
        gm1 = eos.gamma - 1.0
        efloor = eos.pfloor / gm1
        etot = u[..., IEN, :, :, :]
        e_k = 0.5 * di * (mx * mx + my * my + mz * mz)
        e = etot - e_k

        efloor_used = e < efloor
        e = jnp.maximum(e, efloor)

        tfloor_used = gm1 * e * di < eos.tfloor
        e = jnp.where(tfloor_used, d * eos.tfloor / gm1, e)

        spe_over_eps = gm1 / jnp.power(d, gm1)
        sfloor_used = spe_over_eps * e * di <= eos.sfloor
        e = jnp.where(sfloor_used, d * eos.sfloor / spe_over_eps, e)

        etot_fixed = jnp.where(efloor_used | tfloor_used | sfloor_used,
                               e + e_k, etot)
        w = u.at[..., IDN, :, :, :].set(d)
        w = w.at[..., IVX, :, :, :].set(vx)
        w = w.at[..., IVY, :, :, :].set(vy)
        w = w.at[..., IVZ, :, :, :].set(vz)
        w = w.at[..., IEN, :, :, :].set(e)
        u_fixed = u.at[..., IDN, :, :, :].set(d)
        u_fixed = u_fixed.at[..., IEN, :, :, :].set(etot_fixed)
        counters["neos_efloor"] = jnp.sum(efloor_used | sfloor_used)
        counters["neos_tfloor"] = jnp.sum(tfloor_used)
    else:
        w = u.at[..., IDN, :, :, :].set(d)
        w = w.at[..., IVX, :, :, :].set(vx)
        w = w.at[..., IVY, :, :, :].set(vy)
        w = w.at[..., IVZ, :, :, :].set(vz)
        u_fixed = u.at[..., IDN, :, :, :].set(d)

    # passive scalars (any channels beyond the fluid set): s/d, floored at 0
    nfluid = 5 if eos.is_ideal else 4
    nvar = u.shape[-4]
    if nvar > nfluid:
        s = jnp.maximum(u[..., nfluid:, :, :, :], 0.0)
        w = w.at[..., nfluid:, :, :, :].set(s * di[..., None, :, :, :])
        u_fixed = u_fixed.at[..., nfluid:, :, :, :].set(s)

    return w, u_fixed, counters


def cons_to_prim_mhd(u, bcc, eos: EOSData, sigma_max: float = None):
    """Vectorized Newtonian MHD c2p (reference SingleC2P_IdealMHD,
    src/eos/ideal_c2p_mhd.hpp:21-67).  ``bcc`` is [..., 3, nz, ny, nx]
    cell-centered field; primitives do not carry B."""
    d = u[..., IDN, :, :, :]
    mx = u[..., IM1, :, :, :]
    my = u[..., IM2, :, :, :]
    mz = u[..., IM3, :, :, :]
    bx = bcc[..., 0, :, :, :]
    by = bcc[..., 1, :, :, :]
    bz = bcc[..., 2, :, :, :]

    b2 = bx * bx + by * by + bz * bz
    dfloor = jnp.maximum(eos.dfloor, b2 / eos.sigma_max)
    dfloor_used = d < dfloor
    d = jnp.maximum(d, dfloor)

    di = 1.0 / d
    vx, vy, vz = di * mx, di * my, di * mz
    counters = {"neos_dfloor": jnp.sum(dfloor_used)}

    if eos.is_ideal:
        gm1 = eos.gamma - 1.0
        efloor = eos.pfloor / gm1
        etot = u[..., IEN, :, :, :]
        e_k = 0.5 * di * (mx * mx + my * my + mz * mz)
        e_m = 0.5 * b2
        e = etot - e_k - e_m

        efloor_used = e < efloor
        e = jnp.maximum(e, efloor)
        tfloor_used = gm1 * e * di < eos.tfloor
        e = jnp.where(tfloor_used, d * eos.tfloor / gm1, e)
        spe_over_eps = gm1 / jnp.power(d, gm1)
        sfloor_used = spe_over_eps * e * di <= eos.sfloor
        e = jnp.where(sfloor_used, d * eos.sfloor / spe_over_eps, e)

        etot_fixed = jnp.where(efloor_used | tfloor_used | sfloor_used,
                               e + e_k + e_m, etot)
        w = u.at[..., IDN, :, :, :].set(d)
        w = w.at[..., IVX, :, :, :].set(vx)
        w = w.at[..., IVY, :, :, :].set(vy)
        w = w.at[..., IVZ, :, :, :].set(vz)
        w = w.at[..., IEN, :, :, :].set(e)
        u_fixed = u.at[..., IDN, :, :, :].set(d)
        u_fixed = u_fixed.at[..., IEN, :, :, :].set(etot_fixed)
        counters["neos_efloor"] = jnp.sum(efloor_used | sfloor_used)
        counters["neos_tfloor"] = jnp.sum(tfloor_used)
    else:
        w = u.at[..., IDN, :, :, :].set(d)
        w = w.at[..., IVX, :, :, :].set(vx)
        w = w.at[..., IVY, :, :, :].set(vy)
        w = w.at[..., IVZ, :, :, :].set(vz)
        u_fixed = u.at[..., IDN, :, :, :].set(d)

    nfluid = 5 if eos.is_ideal else 4
    nvar = u.shape[-4]
    if nvar > nfluid:
        s = jnp.maximum(u[..., nfluid:, :, :, :], 0.0)
        w = w.at[..., nfluid:, :, :, :].set(s * di[..., None, :, :, :])
        u_fixed = u_fixed.at[..., nfluid:, :, :, :].set(s)

    return w, u_fixed, counters


def prim_to_cons_mhd(w, bcc, eos: EOSData):
    """Vectorized Newtonian MHD p2c (reference SingleP2C_IdealMHD)."""
    d = w[..., IDN, :, :, :]
    vx = w[..., IVX, :, :, :]
    vy = w[..., IVY, :, :, :]
    vz = w[..., IVZ, :, :, :]
    u = w.at[..., IM1, :, :, :].set(d * vx)
    u = u.at[..., IM2, :, :, :].set(d * vy)
    u = u.at[..., IM3, :, :, :].set(d * vz)
    if eos.is_ideal:
        e = w[..., IEN, :, :, :]
        b2 = (bcc[..., 0, :, :, :] ** 2 + bcc[..., 1, :, :, :] ** 2
              + bcc[..., 2, :, :, :] ** 2)
        u = u.at[..., IEN, :, :, :].set(
            e + 0.5 * (d * (vx * vx + vy * vy + vz * vz) + b2))
    nfluid = 5 if eos.is_ideal else 4
    nvar = w.shape[-4]
    if nvar > nfluid:
        u = u.at[..., nfluid:, :, :, :].set(
            w[..., nfluid:, :, :, :] * d[..., None, :, :, :])
    return u


def prim_to_cons_hydro(w, eos: EOSData):
    """Vectorized Newtonian hydro p2c (reference SingleP2C_IdealHyd)."""
    d = w[..., IDN, :, :, :]
    vx = w[..., IVX, :, :, :]
    vy = w[..., IVY, :, :, :]
    vz = w[..., IVZ, :, :, :]
    u = w.at[..., IM1, :, :, :].set(d * vx)
    u = u.at[..., IM2, :, :, :].set(d * vy)
    u = u.at[..., IM3, :, :, :].set(d * vz)
    if eos.is_ideal:
        e = w[..., IEN, :, :, :]
        u = u.at[..., IEN, :, :, :].set(
            e + 0.5 * d * (vx * vx + vy * vy + vz * vz))
    nfluid = 5 if eos.is_ideal else 4
    nvar = w.shape[-4]
    if nvar > nfluid:
        u = u.at[..., nfluid:, :, :, :].set(
            w[..., nfluid:, :, :, :] * d[..., None, :, :, :])
    return u
