"""Pallas-fused reconstruction + Riemann flux kernels.

The XLA-compiled flux path fragments into dozens of HBM passes; this
kernel fuses PLM reconstruction and the HLLD solve for one direction into
a single VMEM-resident pass — the TPU-native replacement for the
reference's split recon/rsolver kernels with global wl3d/wr3d buffers
(reference: src/mhd/mhd_fluxes.cpp, SURVEY.md section 7 step 3).

Layout: the stencil runs along the LANE (last) axis; for x2/x3 the caller
transposes so the stencil lands on lanes (two cheap passes vs the fused
kernel's saving).  Ghost cells make the circular-roll wraparound harmless
exactly as in the jnp path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Parity testing hook: tests/test_pallas_parity.py flips this to run the
# kernels in Pallas interpret mode on CPU and compare against the
# general jnp path.
INTERPRET = False


def _pcall(*args, **kwargs):
    return pl.pallas_call(*args, interpret=INTERPRET, **kwargs)



from ..indices import IDN, IEN
from .eos import EOSData
from . import rsolvers_mhd


def _roll_l(q, s):
    """q shifted so result[..., i] = q[..., i+s] along the lane axis
    (pltpu.roll requires a non-negative shift; the explicit int32 keeps
    Mosaic happy when jax_enable_x64 would otherwise trace the shift as
    i64, which tpu.dynamic_rotate rejects)."""
    import numpy as _np
    return pltpu.roll(q, _np.int32((-s) % q.shape[-1]), axis=q.ndim - 1)


def _plm_lanes(q):
    """PLM left/right face states along lanes (matches ops.recon.plm)."""
    qm1 = _roll_l(q, -1)
    qp1 = _roll_l(q, +1)
    dql = q - qm1
    dqr = qp1 - q
    dq2 = dql * dqr
    dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(q), dq2 / (dql + dqr))
    ql_cell = q + dqm
    qr_cell = q - dqm
    return _roll_l(ql_cell, -1), qr_cell


def _make_kernel(eos: EOSData, ivx: int, dfloor, efloor):
    def kernel(w_ref, bcc_ref, bx_ref, flx_ref, ey_ref, ez_ref):
        w = w_ref[0, :, 0]      # [5, TJ, L]
        b = bcc_ref[0, :, 0]    # [3, TJ, L]
        bx = bx_ref[0, 0]       # [TJ, L]

        wl, wr = _plm_lanes(w)
        bl, br = _plm_lanes(b)

        # floors on density/energy as in MHD.fluxes (concatenate instead
        # of .at[] updates, which Mosaic does not lower on values)
        def floors(q):
            if eos.is_ideal:
                return jnp.concatenate(
                    [jnp.maximum(q[:1], dfloor), q[1:4],
                     jnp.maximum(q[4:5], efloor)], axis=0)
            return jnp.concatenate(
                [jnp.maximum(q[:1], dfloor), q[1:]], axis=0)

        wl = floors(wl)
        wr = floors(wr)

        # reuse the pointwise HLLD core on [5, 1, TJ, L] channel views
        f, ey, ez = rsolvers_mhd.hlld(
            wl[:, None], wr[:, None], bl[:, None], br[:, None],
            bx[None], eos, ivx)
        flx_ref[0, :, 0] = f[:, 0]
        ey_ref[0, 0] = ey[0]
        ez_ref[0, 0] = ez[0]
    return kernel


def fused_plm_hlld_lanes(w, bcc, bx, eos: EOSData, ivx: int,
                         tile_j: int = 32):
    """Fused PLM+HLLD with the stencil along the last axis.

    w [nmb,5,n3,n2,n1], bcc [nmb,3,n3,n2,n1], bx [nmb,n3,n2,n1];
    returns (flux [nmb,5,n3,n2,n1], ey, ez [nmb,n3,n2,n1])."""
    nmb, nv, n3, n2, n1 = w.shape
    if n2 % tile_j != 0:
        tile_j = n2  # degenerate fallback
    grid = (nmb, n3, n2 // tile_j)
    dfloor = eos.dfloor
    efloor = eos.pfloor / (eos.gamma - 1.0) if eos.is_ideal else 0.0

    in_specs = [
        pl.BlockSpec((1, nv, 1, tile_j, n1),
                     lambda m, k, j: (m, 0, k, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, 1, tile_j, n1),
                     lambda m, k, j: (m, 0, k, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile_j, n1),
                     lambda m, k, j: (m, k, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, nv, 1, tile_j, n1),
                     lambda m, k, j: (m, 0, k, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile_j, n1),
                     lambda m, k, j: (m, k, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile_j, n1),
                     lambda m, k, j: (m, k, j, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct(w.shape, w.dtype),
        jax.ShapeDtypeStruct(bx.shape, w.dtype),
        jax.ShapeDtypeStruct(bx.shape, w.dtype),
    )
    return _pcall(
        _make_kernel(eos, ivx, dfloor, efloor),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(w, bcc, bx)


def fused_flux_dir(w, bcc, bface, eos: EOSData, name: str, ivx: int):
    """Direction dispatcher: transpose so the stencil axis is lanes,
    run the fused kernel, transpose back."""
    if name == "x1":
        return fused_plm_hlld_lanes(w, bcc, bface, eos, ivx)
    if name == "x2":
        perm5 = (0, 1, 2, 4, 3)   # swap n2 <-> n1
        perm4 = (0, 1, 3, 2)
        f, ey, ez = fused_plm_hlld_lanes(
            jnp.transpose(w, perm5), jnp.transpose(bcc, perm5),
            jnp.transpose(bface, perm4), eos, ivx)
        return (jnp.transpose(f, perm5), jnp.transpose(ey, perm4),
                jnp.transpose(ez, perm4))
    # x3: swap n3 <-> n1
    perm5 = (0, 1, 4, 3, 2)
    perm4 = (0, 3, 2, 1)
    f, ey, ez = fused_plm_hlld_lanes(
        jnp.transpose(w, perm5), jnp.transpose(bcc, perm5),
        jnp.transpose(bface, perm4), eos, ivx)
    return (jnp.transpose(f, perm5), jnp.transpose(ey, perm4),
            jnp.transpose(ez, perm4))
