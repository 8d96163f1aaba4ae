"""Diffusion decay tests: sinusoidal shear / field / entropy perturbations.

Behavioral parity with the reference diffusion regression suite
(reference: tst/test_suite/diffusion/ — viscous/resistive/conductive decay
of sinusoidal perturbations), with our own initial-condition generator:
a uniform medium plus one perturbed channel

    perturb = vy | by | temp      (problem/perturb)
    amp                           perturbation amplitude
    kx_mult                       wavenumber multiple of 2 pi / Lx

The analytic linear decay rates are nu k^2 (shear), eta k^2 (field), and
alpha (gamma-1)/gamma k^2 (entropy mode at constant pressure).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVY


def init(pin, mesh, phys):
    amp = pin.get_or_add_real("problem", "amp", 1.0e-6)
    kxm = pin.get_or_add_integer("problem", "kx_mult", 1)
    perturb = pin.get_string("problem", "perturb")
    d0 = pin.get_or_add_real("problem", "d0", 1.0)
    p0 = pin.get_or_add_real("problem", "p0", 1.0)
    gm1 = phys.eos.gamma - 1.0

    ms = mesh.mesh_size
    lx = ms.x1max - ms.x1min
    kx = 2.0 * math.pi * kxm / lx

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    w = np.zeros((nmb, phys.nvar, mbi.ncells3, mbi.ncells2, mbi.ncells1))
    w[:, IDN] = d0
    w[:, IEN] = p0 / gm1

    b0 = pin.get_or_add_real("problem", "b0", 0.0)
    for gid in range(nmb):
        x1v, _, _ = mesh.cell_centers(gid)
        sinx = np.sin(kx * x1v)[None, None, :]
        if perturb == "vy":
            w[gid, IVY] += amp * sinx
        elif perturb == "temp":
            # isobaric entropy mode: dT/T = amp sin, drho/rho = -dT/T
            w[gid, IDN] = d0 / (1.0 + amp * sinx)
        elif perturb == "by":
            pass  # set below via the face field
        elif perturb == "bz_pb":
            # Bz perturbation with compensating gas pressure (total
            # pressure balanced): stationary mode, decays by pure
            # (ambipolar/ohmic) diffusion with J perpendicular to B
            w[gid, IEN] = (p0 - b0 * amp * sinx) / gm1
        else:
            raise ValueError(f"problem/perturb={perturb} unknown")

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    wj = jnp.asarray(w, dtype=dtype)

    if getattr(phys, "is_mhd", False):
        bfc = {k: np.zeros(s) for k, s in phys.fc_shapes.items()}
        if perturb == "bz_pb":
            # uniform background along x3 + perturbed Bz(x1)
            for gid in range(nmb):
                x1v, _, _ = mesh.cell_centers(gid)
                bfc["x3f"][gid, :, :, :] = \
                    b0 + amp * np.sin(kx * x1v)[None, None, :]
        else:
            bfc["x1f"][:] = b0
            if perturb == "by":
                for gid in range(nmb):
                    # By face-centered in x2: sample at cell centers of x1
                    x1v, _, _ = mesh.cell_centers(gid)
                    bfc["x2f"][gid, :, :, :] += \
                        amp * np.sin(kx * x1v)[None, None, :]
        bfcj = {k: jnp.asarray(v, dtype=dtype) for k, v in bfc.items()}
        bcc = phys.compute_bcc(bfcj)
        u = phys.prim_to_cons(wj, bcc)
        return phys.make_state(u, wj, bfcj)

    u = phys.prim_to_cons(wj)
    return phys.make_state(u, wj)
