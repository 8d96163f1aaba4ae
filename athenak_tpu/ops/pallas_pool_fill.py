"""Multi-block ghost fill as three Pallas sweep kernels.

The general ghost fill (bvals.fill_ghosts / mhd.fill_ghosts_fc) moves
donor slabs with whole-axis gathers and rebuilds each array with full
concatenates — ~15 XLA ops per array per fill, each a full pass over
HBM.  On same-level uniform periodic meshes every ghost cell is an
exact copy of a neighbor block's interior cell, so the whole fill is
pure data movement.  This module replaces the reference's
pack/send/recv/unpack buffer machinery (reference:
src/bvals/bvals_cc.cpp:42-289, bvals_fc.cpp) with block-to-block
pipelined copies.

TPU constraints that shape the design: in-kernel DMA cannot slice an
array whose lane extent is not a multiple of 128 (block interiors are
nx+2*ng wide, never aligned), and BlockSpec windows must be 8/128
divisible or full on the last two dims.  So the fill runs as three
sweeps in the same order as the sequential fill, each kernel fetching
donor blocks through scalar-prefetch index maps:

  x3 sweep: ghost z-slab copy — out blocks are ONLY the ghost slabs
    (z is a plain major dim, arbitrary offsets allowed), so traffic is
    the ghost volume itself.
  x2 sweep: full-window masked merge — self plus its two x2 face
    donors are read per z-window, donor interior rows rolled into
    ghost position on the sublane axis (full transverse extents, so
    x2x3 edges complete transitively from the donors' x3 ghosts).
  x1 sweep: same merge on the lane axis, completing every edge and
    corner transitively.  Reads touch only donor interiors (never
    written by the same sweep), so in-place aliasing is race-free.

The sweeps move exactly the cells the sequential fill moves, in the
same donor order — bit-exact by construction.

Gate (``supports_pool_fill``): same-level uniform mesh, nmb > 1, all
mesh faces periodic, ng == 2, f32, trace-time single-device (no
ShardComm).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

# Window working-set bound for the merge sweeps.  The scoped-vmem
# stack limit is 16MB by default and Pallas double-buffers each of the
# 4 resident refs (self + 2 donors + out), so the per-slab budget is
# sized for 8 live slabs with headroom.
_VMEM_BUDGET = 12 << 20


def neighbor27(mesh) -> np.ndarray:
    """[nmb, 27] donor-gid table over the (dz, dy, dx) direction cube,
    index 9*(dz+1) + 3*(dy+1) + (dx+1).  Diagonal donors are composed
    from the face-neighbor maps (exact on same-level periodic meshes)."""
    nmb = mesh.nmb_total
    step = {
        (+1, "x1"): np.asarray(mesh.nbr_gid["x1p"]),
        (-1, "x1"): np.asarray(mesh.nbr_gid["x1m"]),
        (+1, "x2"): np.asarray(mesh.nbr_gid["x2p"]),
        (-1, "x2"): np.asarray(mesh.nbr_gid["x2m"]),
        (+1, "x3"): np.asarray(mesh.nbr_gid["x3p"]),
        (-1, "x3"): np.asarray(mesh.nbr_gid["x3m"]),
    }
    out = np.empty((nmb, 27), dtype=np.int32)
    ident = np.arange(nmb)
    for dz, dy, dx in itertools.product((-1, 0, 1), repeat=3):
        g = ident
        for d, ax in ((dx, "x1"), (dy, "x2"), (dz, "x3")):
            if d != 0:
                g = step[(d, ax)][g]
        out[:, 9 * (dz + 1) + 3 * (dy + 1) + (dx + 1)] = g
    return out


def supports_pool_fill(mesh) -> bool:
    """Same-level uniform, multi-block, fully periodic, ng == 2 (the
    f32/TPU/trace-context parts of the gate live at the call sites)."""
    return (not getattr(mesh, "multilevel", False)
            and mesh.nmb_total > 1
            and mesh.mb_indcs.ng == 2
            and all(f == "periodic" for f in mesh.mesh_bcs.values()))


def _active_axes(mesh):
    active = set()
    if mesh.mb_indcs.nx1 > 1:
        active.add("x1")
    if mesh.mb_indcs.nx2 > 1:
        active.add("x2")
    if mesh.mb_indcs.nx3 > 1:
        active.add("x3")
    return active


def _ghost_cols(kind: str, ax: str, n: int, ng: int):
    """(hi_dst0, hi_src0, lo_dst0, lo_src0) start offsets of the ghost
    exchange along mesh axis `ax` with extent n.  On a face-centered
    array's normal axis the shared interface faces are owned
    identically by both blocks and are NOT exchanged (matching
    mhd.fill_ghosts_fc)."""
    if kind != "cc" and kind[:2] == ax:
        nxa = n - 2 * ng - 1
        return nxa + ng + 1, ng + 1, 0, nxa
    return n - ng, ng, 0, n - 2 * ng


def _nbr_idx(nbr27: np.ndarray, ax: str) -> np.ndarray:
    """[nmb, 2] (minus, plus) face-donor table for one axis."""
    off = {"x1": 1, "x2": 3, "x3": 9}[ax]
    return np.ascontiguousarray(
        np.stack([nbr27[:, 13 - off], nbr27[:, 13 + off]], axis=1))


def _x3_slab_copy(a, kind, idx, ng):
    """Ghost z-slab copy: out blocks are only the two ghost slabs, so
    HBM traffic is the ghost volume itself (z offsets are arbitrary on
    a plain major dim)."""
    n3 = a.shape[-3]
    hi_d, hi_s, lo_d, lo_s = _ghost_cols(kind, "x3", n3, ng)
    lead = a.shape[:-3]

    def kernel(idx_ref, src_ref, out_ref):
        out_ref[...] = src_ref[...]

    def blk(n):
        return tuple(pl.Element(1 if i == 0 else d)
                     for i, d in enumerate(lead)) + (
            pl.Element(n), pl.Element(a.shape[-2]),
            pl.Element(a.shape[-1]))

    zeros = (0,) * (len(lead) - 1)

    def in_map(m, side, idx_ref):
        g = idx_ref[m, side]
        return (g,) + zeros + (jnp.where(side == 0, lo_s, hi_s), 0, 0)

    def out_map(m, side, idx_ref):
        return (m,) + zeros + (jnp.where(side == 0, lo_d, hi_d), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(a.shape[0], 2),
        in_specs=[pl.BlockSpec(blk(ng), in_map,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk(ng), out_map,
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        input_output_aliases={1: 0},
        interpret=INTERPRET,
    )(jnp.asarray(idx), a)


def _merge_sweep(a, kind, idx, ng, ax):
    """Masked-merge sweep for the sublane (x2) or lane (x1) axis: per
    (block, z-window) grid step, load the window plus the matching
    windows of its two face donors, roll donor interiors into ghost
    position, and write the merge.  Donor reads touch only interior
    rows/columns (never written by this sweep), so the in-place
    aliasing is race-free regardless of grid order."""
    n3, n2, n1 = a.shape[-3:]
    lead = a.shape[:-3]
    n = n2 if ax == "x2" else n1
    axis_off = 2 if ax == "x2" else 1  # from the end
    hi_d, hi_s, lo_d, lo_s = _ghost_cols(kind, ax, n, ng)

    nch = int(np.prod(lead[1:])) if len(lead) > 1 else 1
    bytes_per_plane = 4 * nch * (-(-n2 // 8) * 8) * (-(-n1 // 128) * 128)
    kz = max(1, min(n3, _VMEM_BUDGET // (8 * bytes_per_plane)))
    nwin = -(-n3 // kz)

    def kernel(idx_ref, self_ref, dm_ref, dp_ref, out_ref):
        s = self_ref[...]
        axis = s.ndim - axis_off
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, axis)
        hi = pltpu.roll(dp_ref[...], hi_d - hi_s, axis=axis)
        lo = pltpu.roll(dm_ref[...], (lo_d - lo_s) % n, axis=axis)
        v = jnp.where((pos >= hi_d) & (pos < hi_d + ng), hi, s)
        v = jnp.where((pos >= lo_d) & (pos < lo_d + ng), lo, v)
        out_ref[...] = v

    def z0(s):
        return jnp.minimum(s * kz, n3 - kz)

    blk = tuple(pl.Element(1 if i == 0 else d)
                for i, d in enumerate(lead)) + (
        pl.Element(kz), pl.Element(n2), pl.Element(n1))
    zeros = (0,) * (len(lead) - 1)

    def spec(which):
        # which: 0 = self, 1 = minus donor, 2 = plus donor
        def imap(m, s, idx_ref):
            g = m if which == 0 else idx_ref[m, which - 1]
            return (g,) + zeros + (z0(s), 0, 0)
        return pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(a.shape[0], nwin),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=spec(0),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        interpret=INTERPRET,
    )(jnp.asarray(idx), a, a, a)


def pool_fill(arrs, kinds, nbr27: np.ndarray, mesh):
    """Fill the ghost shells of several arrays: x3 slab copy, then the
    x2 and x1 merge sweeps (sequential-fill donor order — bit-exact).

    arrs: list of arrays, each [nmb, ...ch..., n3, n2, n1] (cc) or
    [nmb, n3', n2', n1'] (fc); kinds: matching 'cc'/'x1f'/'x2f'/'x3f'.
    """
    ng = mesh.mb_indcs.ng
    active = _active_axes(mesh)
    out = list(arrs)
    if "x3" in active:
        idx = _nbr_idx(nbr27, "x3")
        out = [_x3_slab_copy(a, k, idx, ng) for a, k in zip(out, kinds)]
    if "x2" in active:
        idx = _nbr_idx(nbr27, "x2")
        out = [_merge_sweep(a, k, idx, ng, "x2")
               for a, k in zip(out, kinds)]
    if "x1" in active:
        idx = _nbr_idx(nbr27, "x1")
        out = [_merge_sweep(a, k, idx, ng, "x1")
               for a, k in zip(out, kinds)]
    return out


def pool_fill_cc(u, nbr27, mesh):
    return pool_fill([u], ["cc"], nbr27, mesh)[0]


def pool_fill_fc(bfc, nbr27, mesh):
    ks = ("x1f", "x2f", "x3f") if "x3f" in bfc else ("x1f", "x2f")
    out = pool_fill([bfc[k] for k in ks], list(ks), nbr27, mesh)
    return {**bfc, **dict(zip(ks, out))}
