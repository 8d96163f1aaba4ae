"""Block coalescing: run a uniform multi-block mesh as one superblock.

The reference batches MeshBlocks into a MeshBlockPack so one kernel
launch covers every block on a rank (reference:
src/mesh/meshblock_pack.hpp:44-97).  On TPU the analogous — and
stronger — transform is to *physically merge* the blocks: a uniform
mesh on one device is globally contiguous, so the `[nmb, ...]` block
pool can be repacked into a single `[1, ...]` superblock whose interior
is the whole domain.  Halo traffic between co-resident blocks
disappears entirely (interior cells are their own neighbors), the lane
dimension grows to full 128-lane tiles, and every Pallas fast path that
is gated on single-block meshes applies.

The transform is exact: the same finite-volume stencils run on the same
global cell values, so a coalesced run bit-matches the block-wise run
(verified in tests/test_coalesce.py).

Blocks remain the unit of distribution and refinement: coalescing
applies only to single-device, single-level, non-adaptive meshes with
no per-block user callbacks; everything else keeps the block pool.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Coalescer:
    """Pack/unpack between the block pool and the superblock mesh."""

    def __init__(self, pin, mesh, phys) -> None:
        from ..athinput import ParameterInput
        from ..bvals import BoundaryValues
        from ..main import make_physics
        from ..mesh import Mesh

        self.mesh = mesh
        pin2 = ParameterInput.from_string(pin.dump())
        ms = mesh.mesh_indcs
        pin2.set_value("meshblock", "nx1", ms.nx1)
        if ms.nx2 > 1:
            pin2.set_value("meshblock", "nx2", ms.nx2)
        if ms.nx3 > 1:
            pin2.set_value("meshblock", "nx3", ms.nx3)
        self.mesh2 = Mesh(pin2)
        bvals2 = BoundaryValues(self.mesh2)
        self.phys2 = make_physics(pin2, self.mesh2, bvals2)
        # block-independent pgen state carried over
        bvals2.inflow_state = dict(phys.bvals.inflow_state)

        mbi = mesh.mb_indcs
        self.ng = mbi.ng
        self.nx = (mbi.nx3, mbi.nx2, mbi.nx1)
        self.ncell = (mbi.ncells3, mbi.ncells2, mbi.ncells1)
        # collapsed dimensions carry no ghost zones
        self.ngs = tuple(self.ng if self.nx[d] > 1 else 0
                         for d in range(3))
        sup = self.mesh2.mb_indcs
        self.sup_ncell = (sup.ncells3, sup.ncells2, sup.ncells1)
        # per-block interior offsets within the superblock interior
        loc = mesh.lloc_eachmb
        self.offs = np.stack([loc[:, 2] * mbi.nx3,
                              loc[:, 1] * mbi.nx2,
                              loc[:, 0] * mbi.nx1], axis=1)

    # ------------------------------------------------------------------
    def _leaf_axes(self, shape):
        """Classify the trailing 3 dims of a [nmb, ..., c3, c2, c1] leaf:
        returns per-axis 'c' (cell), 'f' (face, +1 extent) or None if the
        leaf is not a block-pool field array."""
        if len(shape) < 4 or shape[0] != self.mesh.nmb_total:
            return None
        kinds = []
        for d in range(3):
            n = shape[-3 + d]
            if n == self.ncell[d]:
                kinds.append("c")
            elif n == self.ncell[d] + 1:
                kinds.append("f")
            else:
                return None
        return kinds

    def _pack_leaf(self, a):
        kinds = self._leaf_axes(a.shape)
        if kinds is None:
            return a
        ngs = self.ngs
        out_shape = (1,) + a.shape[1:-3] + tuple(
            self.sup_ncell[d] + (1 if kinds[d] == "f" else 0)
            for d in range(3))
        out = jnp.zeros(out_shape, a.dtype)
        for g in range(self.mesh.nmb_total):
            src = [g, ...] + [
                slice(ngs[d],
                      ngs[d] + self.nx[d] + (1 if kinds[d] == "f" else 0))
                for d in range(3)]
            o = self.offs[g]
            dst = [0, ...] + [
                slice(ngs[d] + int(o[d]),
                      ngs[d] + int(o[d]) + self.nx[d]
                      + (1 if kinds[d] == "f" else 0))
                for d in range(3)]
            out = out.at[tuple(dst)].set(a[tuple(src)])
        return out

    def _unpack_leaf(self, a):
        # superblock leaf -> block pool; ghost zones come for free from
        # the adjacent interior (or the superblock's own filled ghosts)
        kinds = None
        if a.ndim >= 4 and a.shape[0] == 1:
            kinds = []
            for d in range(3):
                n = a.shape[-3 + d]
                if n == self.sup_ncell[d]:
                    kinds.append("c")
                elif n == self.sup_ncell[d] + 1:
                    kinds.append("f")
                else:
                    kinds = None
                    break
        if kinds is None:
            return a
        blocks = []
        for g in range(self.mesh.nmb_total):
            o = self.offs[g]
            idx = [0, ...] + [
                slice(int(o[d]),
                      int(o[d]) + self.ncell[d]
                      + (1 if kinds[d] == "f" else 0))
                for d in range(3)]
            blocks.append(a[tuple(idx)])
        return jnp.stack(blocks, axis=0)

    # ------------------------------------------------------------------
    def pack(self, state):
        return jax.tree_util.tree_map(self._pack_leaf, state)

    def unpack(self, state):
        return jax.tree_util.tree_map(self._unpack_leaf, state)


def maybe_coalesce(pin, mesh, phys, dmesh=None) -> Optional[Coalescer]:
    """Build a Coalescer when the configuration allows exact merging."""
    if pin is None or dmesh is not None:
        return None
    if mesh.nmb_total <= 1:
        return None
    if getattr(mesh, "multilevel", False) or getattr(mesh, "adaptive",
                                                    False):
        return None
    if type(phys).__name__ not in ("Hydro", "MHD"):
        # Z4c/DynGRMHD/Radiation/IonNeutral carry per-block module
        # tables (wave-extraction spheres, tetrads, two-fluid pairing)
        # that the superblock repack does not rewrite
        return None
    if getattr(phys, "ppart", None) is not None:
        return None
    bv = getattr(phys, "bvals", None)
    if bv is None or bv.user_bc_func is not None:
        return None
    if getattr(phys, "srcterms_func", None) is not None:
        return None
    if getattr(phys, "user_refine_func", None) is not None:
        return None
    # shear-periodic BCs key block lookups off the original block grid
    if any(f == "shear_periodic" for f in mesh.mesh_bcs.values()):
        return None
    try:
        return Coalescer(pin, mesh, phys)
    except Exception:
        return None
