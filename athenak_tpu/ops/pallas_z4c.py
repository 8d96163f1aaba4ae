"""Fused Z4c stage megakernel: RHS + RK combine + algebraic constraints.

One Pallas pass per RK stage replaces the ~10^2 whole-field roll
stencils of the jnp Z4c RHS (reference: the single 591-line kernel
src/z4c/z4c_calcrhs.cpp + z4c_update.cpp + the AlgConstr projection
z4c.cpp:258-310).  Per stage the HBM traffic is one read of (u, u1)
and one write of u' — derivatives, Christoffels, Ricci, gauge, KO
dissipation and the det/trace projection all live in VMEM.

Structure mirrors ops/pallas_stage.py fused_mega_stage3d: grid over
(block, x3 plane windows); a window holds K + 2*ng cell planes of all
22 channels; transverse (x1/x2) stencils are in-register pltpu.roll on
the lane/sublane axes of the K centered planes, x3 stencils are static
plane slices of the full window.  The tensor physics itself is the
backend-agnostic z4c/rhs_core.py — the same code that runs the
whole-array jnp path, bound here to a [P, n2, n1] window backend.

Ghost planes/columns of the output are garbage (wrapped rolls) or
unwritten; the ghost fill that follows every stage overwrites them, so
interior parity with the jnp path is exact (same stencils, same
operation order).  Gate: uniform mesh, 3-D, f32-on-TPU (call site),
vacuum (tmunu handled by the jnp path until dyngr rides this kernel).
"""

from __future__ import annotations

import numpy as _np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..z4c import fd
from ..z4c.z4c import NZ4C, I_CHI, I_GXX, I_AXX, I_BETAX, sym_idx, \
    _sym_pairs, spatial_det, spatial_inv

INTERPRET = False

_VMEM_LIMIT = 100 << 20


def _lroll(q, s: int, axis: int):
    """result[..., i] = q[..., i+s] (circular), static shift."""
    if s == 0:
        return q
    return pltpu.roll(q, _np.int32((-s) % q.shape[axis]), axis=axis)


class _WindowOps:
    """rhs_core backend over [P, n2, n1] VMEM channel windows: P =
    K + 2*ng planes in, K center planes out."""

    _AX = {0: 2, 1: 1}  # direction -> array axis (lane / sublane)

    def __init__(self, ch, ng: int, K: int, idx, beta_ctr):
        self._ch = ch
        self._ng = ng
        self._K = K
        self._idx = idx
        self._beta = beta_ctr
        self._sbc = None  # set by fused_z4c_stage when Sommerfeld is on

    def center(self, f):
        return f[self._ng:self._ng + self._K]

    # -- stencil application ------------------------------------------
    def _trans(self, f_any, sten, d: int, scale):
        """Stencil along a transverse direction; f may be full-window
        (centered first) or already center-shaped."""
        fc = self.center(f_any) if f_any.shape[0] != self._K else f_any
        ax = self._AX[d]
        out = None
        for off, c in sten:
            t = (c * scale) * _lroll(fc, off, ax)
            out = t if out is None else out + t
        return out

    def _plane(self, f, sten, scale):
        """Stencil along x3 as static plane slices of the full window."""
        ng, K = self._ng, self._K
        out = None
        for off, c in sten:
            t = (c * scale) * f[ng + off:ng + off + K]
            out = t if out is None else out + t
        return out

    def _apply(self, f, sten, d: int, scale):
        if d == 2:
            return self._plane(f, sten, scale)
        return self._trans(f, sten, d, scale)

    def _trans_full(self, f, sten, d: int, scale):
        """Transverse stencil on the FULL window (all P planes) —
        the inner half of a mixed transverse+plane derivative."""
        ax = self._AX[d]
        out = None
        for off, c in sten:
            t = (c * scale) * _lroll(f, off, ax)
            out = t if out is None else out + t
        return out

    # -- rhs_core protocol --------------------------------------------
    def d1(self, f, d):
        ng = self._ng
        return self._apply(f, fd._D1[ng], d, self._idx[d])

    def d2(self, f, da, db):
        ng, idx = self._ng, self._idx
        if da == db:
            return self._apply(f, fd._D2[ng], da, idx[da] * idx[da])
        da, db = min(da, db), max(da, db)
        if db == 2:
            # inner transverse d1 on the full window, outer plane d1
            inner = self._trans_full(f, fd._D1[ng], da, idx[da])
            return self._plane(inner, fd._D1[ng], idx[2])
        # both transverse: nested rolls on the centered planes
        inner = self._trans(f, fd._D1[ng], da, idx[da])
        return self._trans(inner, fd._D1[ng], db, idx[db])

    def ladv(self, f):
        ng, idx = self._ng, self._idx
        out = None
        for d in range(3):
            dl = self._apply(f, fd._ADV_L[ng], d, idx[d])
            dr = self._apply(f, fd._ADV_R[ng], d, idx[d])
            b = self._beta[d]
            t = jnp.where(b < 0.0, b * dl, b * dr)
            out = t if out is None else out + t
        return out

    def ko(self, f):
        ng, idx = self._ng, self._idx
        out = None
        for d in range(3):
            t = self._apply(f, fd._DISS[ng], d, idx[d])
            out = t if out is None else out + t
        return out

    def d1_o2(self, f, d):
        return self._apply(f, fd._D1[2], d, self._idx[d])

    def sbc(self):
        return self._sbc


def supports_z4c_stage(z, mesh) -> bool:
    """Uniform 3-D meshes (single- or multi-block pools); the f32/TPU
    part of the gate lives at the call site."""
    mbi = mesh.mb_indcs
    return (not z.multilevel and mbi.nx2 > 1 and mbi.nx3 > 1)


def _pick_k(n3: int, n2: int, n1: int, ng: int) -> int:
    """Cell planes per window: bounded by the VMEM working set.
    Live set per plane ~ (2x double-buffered 22-ch in window + u1 +
    out + ~150 K-plane temporaries) x padded plane bytes."""
    import os
    kmax = int(os.environ.get("ATHENAK_Z4C_K_MAX", "8"))
    bpp = 4 * (-(-n2 // 8) * 8) * max(n1, 128)
    ni3 = n3 - 2 * ng
    best = 1
    for k in range(1, kmax + 1):
        if k > ni3:
            break
        use = bpp * (2 * NZ4C * (k + 2 * ng)   # u window, dbl-buffered
                     + 4 * NZ4C * k            # u1 + out, dbl-buffered
                     + 170 * k)                # live temporaries
        if use <= _VMEM_LIMIT:
            best = k
    return best


def fused_z4c_stage(u, u1, z, gam0, gam1, beta_dt, tmunu=None):
    """u' = AlgConstr(gam0*u + gam1*u1 + beta_dt*RHS(u)) in one pass.

    ``z``: the Z4c physics object (opt/diss/ng/idx/sbc geometry).
    Interior cells exactly match the jnp path followed by alg_constr
    (projection commutes with the ghost fill on uniform meshes).
    ``tmunu``: optional dict of 10 undensitized stress-energy channel
    fields [nmb, n3, n2, n1] (E, S_d x3, S_dd x6), windowed alongside u.
    """
    nmb, nch, n3, n2, n1 = u.shape
    ng = z.ng
    ni3 = n3 - 2 * ng
    K = _pick_k(n3, n2, n1, ng)
    nwin = -(-ni3 // K)
    idx = tuple(float(i) for i in z.idx)
    opt, diss = z.opt, z.diss
    dt = u.dtype

    have_sbc = z.sbc_mask is not None
    sbc_arr = z.sbc_channels() if have_sbc else None
    have_mat = tmunu is not None
    if have_mat:
        mat = jnp.stack([tmunu["E"], *tmunu["S_d"], *tmunu["S_dd"]],
                        axis=1).astype(dt)

    def z0(s):
        return ng + jnp.minimum(s * K, ni3 - K)

    def win(planes, off):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(nch), pl.Element(planes),
             pl.Element(n2), pl.Element(n1)),
            lambda m, s: (m, 0, z0(s) + off, 0, 0),
            memory_space=pltpu.VMEM)

    def win_c(chn):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(chn), pl.Element(K),
             pl.Element(n2), pl.Element(n1)),
            lambda m, s: (m, 0, z0(s), 0, 0),
            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec((1, 3), lambda *a: (0, 0),
                        memory_space=pltpu.SMEM)

    def kernel(*refs):
        from ..z4c.rhs_core import rhs_core
        if have_sbc and have_mat:
            sc_ref, u_ref, u1_ref, sbc_ref, mat_ref, out_ref = refs
        elif have_sbc:
            sc_ref, u_ref, u1_ref, sbc_ref, out_ref = refs
        elif have_mat:
            sc_ref, u_ref, u1_ref, mat_ref, out_ref = refs
        else:
            sc_ref, u_ref, u1_ref, out_ref = refs
        g0, g1, bdt = sc_ref[0, 0], sc_ref[0, 1], sc_ref[0, 2]
        uu = u_ref[0]                  # [22, P, n2, n1]
        ops = _WindowOps(lambda c: uu[c], ng, K, idx,
                         [uu[I_BETAX + a][ng:ng + K] for a in range(3)])
        if have_sbc:
            sw = sbc_ref[0]            # [5, K, n2, n1]
            ops._sbc = (sw[0] != 0.0, sw[1], (sw[2], sw[3], sw[4]))
        tm = None
        if have_mat:
            mw = mat_ref[0]            # [10, K, n2, n1]
            tm = {"E": mw[0], "S_d": [mw[1 + a] for a in range(3)],
                  "S_dd": [mw[4 + i] for i in range(6)]}
        rhs = rhs_core(lambda c: uu[c], ops, opt, diss, tmunu=tm)

        u1c = u1_ref[0]
        un = [g0 * uu[c][ng:ng + K] + g1 * u1c[c] + bdt * rhs[c]
              for c in range(NZ4C)]

        # algebraic constraints (reference: Z4c::AlgConstr,
        # z4c.cpp:258-310): det(conf g)=1, tr A=0, chi floor —
        # pointwise, so applying pre-fill matches alg_constr(post-fill)
        # on every interior cell
        g = [[un[I_GXX + sym_idx(a, b)] for b in range(3)]
             for a in range(3)]
        A = [[un[I_AXX + sym_idx(a, b)] for b in range(3)]
             for a in range(3)]
        detg = spatial_det(g)
        detg = jnp.where(detg > 0.0, detg, 1.0)
        # cbrt has no Mosaic lowering; detg > 0 so exp/log is safe
        oopsi4 = jnp.exp(jnp.log(detg) * (-1.0 / 3.0))
        gs = [[g[a][b] * oopsi4 for b in range(3)] for a in range(3)]
        gu = spatial_inv(gs, jnp.ones_like(detg))
        trA = sum(gu[a][b] * A[a][b]
                  for a in range(3) for b in range(3))
        for a, b in _sym_pairs():
            un[I_GXX + sym_idx(a, b)] = gs[a][b]
            un[I_AXX + sym_idx(a, b)] = (
                A[a][b] - (1.0 / 3.0) * gs[a][b] * trA)
        un[I_CHI] = jnp.maximum(un[I_CHI], opt.chi_min_floor)

        out_ref[0] = jnp.stack(un, axis=0)

    sc = jnp.stack([jnp.asarray(gam0, jnp.float32),
                    jnp.asarray(gam1, jnp.float32),
                    jnp.asarray(beta_dt, jnp.float32)]).reshape(1, 3)

    in_specs = [smem, win(K + 2 * ng, -ng), win_c(nch)]
    operands = [sc, u, u1]
    if have_sbc:
        in_specs.append(pl.BlockSpec(
            (pl.Element(1), pl.Element(5), pl.Element(K),
             pl.Element(n2), pl.Element(n1)),
            lambda m, s: (m, 0, z0(s), 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(sbc_arr)
    if have_mat:
        in_specs.append(pl.BlockSpec(
            (pl.Element(1), pl.Element(10), pl.Element(K),
             pl.Element(n2), pl.Element(n1)),
            lambda m, s: (m, 0, z0(s), 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(mat)

    return pl.pallas_call(
        kernel,
        grid=(nmb, nwin),
        in_specs=in_specs,
        out_specs=win_c(nch),
        out_shape=jax.ShapeDtypeStruct(u.shape, dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT + (28 << 20)),
        interpret=INTERPRET,
    )(*operands)
