"""Linear wave problem generator (hydro; MHD extension hooks in place).

Parity target: reference src/pgen/tests/linear_wave.cpp — eigensystems in
primitive variables (Athena 2008 ApJS 178, 137 appendix B), automatic
diagonal wavevector, tlim interpreted as number of wave periods, and the
end-of-run L1-error file.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IM1, IM2, IM3, IVX, IVY, IVZ
from . import errors as err_mod


def _hydro_eigensystem(d, v1, p, eos):
    """Eigenvalues + right eigenvectors (columns) in primitives
    (reference: linear_wave.cpp HydroEigensystemPrim)."""
    if eos.is_ideal:
        a = math.sqrt(eos.gamma * p / d)
        ev = np.array([v1 - a, v1, v1, v1, v1 + a])
        rem = np.zeros((5, 5))
        rem[:, 0] = [1.0, -a / d, 0.0, 0.0, a * a]
        rem[:, 1] = [1.0, 0.0, 0.0, 0.0, 0.0]
        rem[:, 2] = [0.0, 0.0, 1.0, 0.0, 0.0]
        rem[:, 3] = [0.0, 0.0, 0.0, 1.0, 0.0]
        rem[:, 4] = [1.0, a / d, 0.0, 0.0, a * a]
        return ev, rem
    cs = eos.iso_cs
    ev = np.array([v1 - cs, v1, v1, v1 + cs])
    rem = np.zeros((4, 4))
    rem[:, 0] = [1.0, -cs / d, 0.0, 0.0]
    rem[:, 1] = [0.0, 0.0, 1.0, 0.0]
    rem[:, 2] = [0.0, 0.0, 0.0, 1.0]
    rem[:, 3] = [1.0, cs / d, 0.0, 0.0]
    return ev, rem


def _wave_geometry(pin, mesh):
    """Wavevector direction + parallel wavelength (reference logic)."""
    along_x1 = pin.get_or_add_boolean("problem", "along_x1", False)
    along_x2 = pin.get_or_add_boolean("problem", "along_x2", False)
    along_x3 = pin.get_or_add_boolean("problem", "along_x3", False)

    ms = mesh.mesh_size
    x1size = ms.x1max - ms.x1min
    x2size = ms.x2max - ms.x2min
    x3size = ms.x3max - ms.x3min

    cos_a3, sin_a3, cos_a2, sin_a2 = 1.0, 0.0, 1.0, 0.0
    if mesh.multi_d and not along_x1:
        ang_3 = math.atan(x1size / x2size)
        sin_a3, cos_a3 = math.sin(ang_3), math.cos(ang_3)
    if mesh.three_d and not along_x1:
        ang_2 = math.atan(0.5 * (x1size * cos_a3 + x2size * sin_a3) / x3size)
        sin_a2, cos_a2 = math.sin(ang_2), math.cos(ang_2)
    if along_x2:
        cos_a3, sin_a3, cos_a2, sin_a2 = 0.0, 1.0, 1.0, 0.0
    if along_x3:
        cos_a3, sin_a3, cos_a2, sin_a2 = 0.0, 1.0, 0.0, 1.0

    lx = float(np.finfo(np.float32).max)
    if cos_a2 * cos_a3 > 0.0:
        lx = min(lx, x1size * cos_a2 * cos_a3)
    if cos_a2 * sin_a3 > 0.0:
        lx = min(lx, x2size * cos_a2 * sin_a3)
    if sin_a2 > 0.0:
        lx = min(lx, x3size * sin_a2)
    k_par = 2.0 * math.pi / lx
    return cos_a2, sin_a2, cos_a3, sin_a3, lx, k_par


def _build_w(pin, mesh, phys, rescale_tlim: bool):
    """Host-side primitive field for the hydro linear wave."""
    eos = phys.eos
    cos_a2, sin_a2, cos_a3, sin_a3, lx, k_par = _wave_geometry(pin, mesh)

    wave_flag = pin.get_integer("problem", "wave_flag")
    amp = pin.get_real("problem", "amp")
    d0 = pin.get_real("problem", "dens")
    p0 = pin.get_real("problem", "pgas")
    vx0 = pin.get_or_add_real("problem", "vx0", 0.0)

    ev, rem = _hydro_eigensystem(d0, vx0, p0, eos)

    if rescale_tlim:
        tlim = pin.get_real("time", "tlim")
        pin.set_real("time", "tlim", tlim * abs(lx / ev[wave_flag]))

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1),
                 dtype=np.float64)
    gm1 = eos.gamma - 1.0
    a = slice(mbi.ks, mbi.ke + 1), slice(mbi.js, mbi.je + 1), \
        slice(mbi.is_, mbi.ie + 1)

    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        x1 = x1v[mbi.is_:mbi.ie + 1]
        x2 = x2v[mbi.js:mbi.je + 1]
        x3 = x3v[mbi.ks:mbi.ke + 1]
        X3, X2, X1 = np.meshgrid(x3, x2, x1, indexing="ij")
        x = cos_a2 * (X1 * cos_a3 + X2 * sin_a3) + X3 * sin_a2
        sn = np.sin(k_par * x)

        rho = d0 + amp * sn * rem[0, wave_flag]
        vx = vx0 + amp * sn * rem[1, wave_flag]
        vy = amp * sn * rem[2, wave_flag]
        vz = amp * sn * rem[3, wave_flag]

        w[gid, IDN][a] = rho
        w[gid, IVX][a] = (vx * cos_a2 * cos_a3 - vy * sin_a3
                          - vz * sin_a2 * cos_a3)
        w[gid, IVY][a] = (vx * cos_a2 * sin_a3 + vy * cos_a3
                          - vz * sin_a2 * sin_a3)
        w[gid, IVZ][a] = vx * sin_a2 + vz * cos_a2
        if eos.is_ideal:
            egas = (p0 + amp * sn * rem[4, wave_flag]) / gm1
            w[gid, IEN][a] = egas
    return w


def init(pin, mesh, phys):
    """Set ICs; returns the physics state dict."""
    import jax
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if getattr(phys, "is_mhd", False):
        from .linear_wave_mhd import init_mhd
        return init_mhd(pin, mesh, phys, dtype)
    w_host = _build_w(pin, mesh, phys, rescale_tlim=True)
    w = jnp.asarray(w_host, dtype=dtype)
    u = phys.prim_to_cons(w)
    return phys.make_state(u, w)


def final(pin, mesh, phys, state):
    """Recompute the analytic solution (= ICs after integer periods) and
    write the L1-error file (reference: LinearWaveErrors)."""
    u = state["u"]
    if getattr(phys, "is_mhd", False):
        from .linear_wave_mhd import final_mhd
        return final_mhd(pin, mesh, phys, state)
    w_ref = jnp.asarray(_build_w(pin, mesh, phys, rescale_tlim=False),
                        dtype=u.dtype)
    u_ref = phys.prim_to_cons(w_ref)
    nvars = phys.nhydro
    l1, linf = err_mod.compute_errors(mesh, u, u_ref, nvars)
    header = ["d", "M1", "M2", "M3"] + (["E"] if phys.eos.is_ideal else [])
    err_mod.write_error_file(pin, mesh, l1, linf, header)
    return l1, linf
