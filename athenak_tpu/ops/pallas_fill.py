"""Single-pass periodic ghost fills for single-block meshes.

The general fill path (bvals._sweep_axis / mhd.fill_ghosts_fc) rebuilds
the array once per axis via concatenation — three full read+write passes.
For the hot single-block periodic configuration (the reference's own
benchmark layout, one meshblock spanning the mesh) the whole fill is one
Pallas pass: the x3 wrap is expressed in the input index map (the output
plane's source plane), and the in-plane x1/x2 wraps as circular rolls +
iota masks inside the kernel (reference behavior: periodic BCs in
src/bvals/ are plain copies of the opposite interior strip).

Ordering matches the sequential x1->x2->x3 sweeps: the in-plane wraps
are applied to the source plane, which is exactly what the transitive
sweep fill produces at edges/corners.
"""

from __future__ import annotations

import numpy as _np

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



_NG = 2


def _roll(q, s: int, axis: int):
    return pltpu.roll(q, _np.int32((-s) % q.shape[axis]), axis=axis)


def _wrap_plane(q, nint2, nint1):
    """Apply periodic ghost wraps along the last two axes of a plane
    value: ghosts [0, ng) <- interior top, [n-ng, n) <- interior bottom.
    nintX is the interior extent (shift distance); X axis sizes are
    taken from q's shape."""
    for axis, nint in ((q.ndim - 2, nint2), (q.ndim - 1, nint1)):
        n = q.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.int32, q.shape, axis)
        lo = _roll(q, nint, axis)
        hi = _roll(q, -nint, axis)
        q = jnp.where(idx < _NG, lo,
                      jnp.where(idx >= n - _NG, hi, q))
    return q


def _src_map(n, nint):
    """Index-map wrap along the grid axis: ghost plane p sources the
    opposite interior plane."""
    def src(p):
        return jnp.where(p < _NG, p + nint,
                         jnp.where(p >= n - _NG, p - nint, p))
    return src


def periodic_fill_cc(u):
    """Fill all ghosts of [nmb, C, n3, n2, n1] for a fully-periodic
    single-block mesh in one read+write pass."""
    nmb, C, n3, n2, n1 = u.shape
    s3 = _src_map(n3, n3 - 2 * _NG)

    def kern(in_ref, out_ref):
        out_ref[0] = _wrap_plane(in_ref[0], n2 - 2 * _NG, n1 - 2 * _NG)

    return _pcall(
        kern, grid=(nmb, n3),
        in_specs=[pl.BlockSpec((1, C, 1, n2, n1),
                               lambda m, p: (m, 0, s3(p), 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, 1, n2, n1),
                               lambda m, p: (m, 0, p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
    )(u)


def periodic_fill_fc(bfc):
    """Face-field fill for a fully-periodic single-block mesh.

    Normal-axis wrap offsets differ from the CC case (the shared face is
    owned once): ghost faces [0, ng) <- [nx, nx+ng) and
    [ng+nx+1, n) <- [ng+1, 2ng+1), i.e. shifts of +-nx about the
    (nx+2ng+1)-extent face axis (mirrors mhd.fill_ghosts_fc's normal
    branch); transverse axes wrap like cell centers."""
    out = {}
    for comp, arr in bfc.items():
        nmb, n3, n2, n1 = arr.shape
        normal_ax = {"x1f": 3, "x2f": 2, "x3f": 1}[comp]
        nint = [None, n3 - 2 * _NG, n2 - 2 * _NG, n1 - 2 * _NG]
        nint[normal_ax] = arr.shape[normal_ax] - 2 * _NG - 1  # = nx

        if normal_ax == 1:
            s3 = _src_map(n3, nint[1])
        else:
            s3 = _src_map(n3, n3 - 2 * _NG)

        def kern(in_ref, out_ref, n2=n2, n1=n1, nint=nint):
            out_ref[0] = _wrap_plane(in_ref[0], nint[2], nint[3])

        out[comp] = _pcall(
            kern, grid=(nmb, n3),
            in_specs=[pl.BlockSpec((1, 1, n2, n1),
                                   lambda m, p, s3=s3: (m, s3(p), 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, n2, n1),
                                   lambda m, p: (m, p, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype),
        )(arr)
    return out
