"""Fully-fused MHD stage kernels: recon + HLLD + RK accumulation.

Replaces the split pipeline (per-direction flux arrays -> rk_update) with
three Pallas kernels that accumulate the flux divergence directly into the
RK update, so full 5-channel flux arrays never round-trip HBM — only the
mass flux (corner-EMF upwinding selector) and the two face EMFs per
direction are materialized (reference: the split kernels this replaces,
src/mhd/mhd_fluxes.cpp:78-250, src/mhd/hydro_update.cpp analog
mhd_update.cpp).

TPU-native layout choices (see pallas_guide.md):
  * x1 kernel: stencil along the LANE axis (pltpu.roll on the minor dim).
  * x2 kernel: stencil along the SUBLANE axis — no transposes.
  * x3 kernel: sliding plane windows via pl.Element block dims (overlap 4
    planes), stencil expressed as static plane slices — no transposes.
  * The RK accumulator is input_output_aliased through kernels 2 and 3,
    so each kernel pays one read + one write of the 5-channel state.

Scope (gated by MHD.use_fused_stage): Newtonian ideal-gas PLM+HLLD, f32,
3-D, uniform mesh, no scalars/FOFC/srcterms — the headline benchmark
configuration.  Other configurations use the general paths.
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



from ..indices import IDN
from .eos import EOSData
from . import rsolvers_mhd
from . import rsolvers_srmhd


def _solver_for(phys):
    """In-kernel Riemann solver for the fused stage: the jnp solvers are
    elementwise over face arrays, so they trace into Pallas directly
    (reference solver set per regime: src/mhd/mhd_fluxes.cpp:39-70)."""
    if getattr(phys, "is_sr", False):
        return {"hlle": rsolvers_srmhd.hlle_srmhd,
                "llf": rsolvers_srmhd.llf_srmhd}[phys.rsolver]
    return rsolvers_mhd.hlld

TK = 4            # planes per grid step (x1/x2 tiles and x3 windows)
TK12 = 2          # planes per grid step for the x1/x2 roll kernels
_MAX_TILE = 2 * 128 * 128   # cap on TK*n2*n1 elements per tile (VMEM stack)


def _roll(q, s: int, axis: int):
    """q shifted so result[..., i] = q[..., i+s] along `axis` (circular).
    Non-negative int32 shift keeps Mosaic's dynamic_rotate happy."""
    return pltpu.roll(q, _np.int32((-s) % q.shape[axis]), axis=axis)


def _plm(q, axis: int):
    """PLM face states along `axis` via circular rolls (ghost cells make
    the wraparound harmless, exactly like the jnp path in ops/recon.py)."""
    qm1 = _roll(q, -1, axis)
    qp1 = _roll(q, +1, axis)
    dql = q - qm1
    dqr = qp1 - q
    dq2 = dql * dqr
    dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(q), dq2 / (dql + dqr))
    return _roll(q + dqm, -1, axis), q - dqm


def _floors(q, eos: EOSData, dfloor, efloor):
    if eos.is_ideal:
        return jnp.concatenate(
            [jnp.maximum(q[:1], dfloor), q[1:4],
             jnp.maximum(q[4:5], efloor)], axis=0)
    return jnp.concatenate([jnp.maximum(q[:1], dfloor), q[1:]], axis=0)


def _mk_roll_kernel(eos: EOSData, ivx: int, axis_off: int,
                    dfloor, efloor, solver=rsolvers_mhd.hlld):
    """x2 (axis_off=-2, sublanes) stage kernel: PLM+Riemann along the
    axis and -betadx * d(flux) accumulated into the aliased RK
    register."""

    def kernel(bd_ref, w_ref, bcc_ref, bx_ref, acc_ref,
               out_ref, fd_ref, ey_ref, ez_ref):
        betadx = bd_ref[0, 0]
        w = w_ref[0]          # [5, TK, n2, L]
        b = bcc_ref[0]        # [3, TK, n2, L]
        bx = bx_ref[0]        # [TK, n2, L]
        axis = w.ndim + axis_off

        wl, wr = _plm(w, axis)
        bl, br = _plm(b, axis)
        wl = _floors(wl, eos, dfloor, efloor)
        wr = _floors(wr, eos, dfloor, efloor)
        f, ey, ez = solver(wl, wr, bl, br, bx, eos, ivx)
        df = _roll(f, 1, axis) - f
        out_ref[0] = acc_ref[0] - betadx * df
        fd_ref[0] = f[IDN]
        ey_ref[0] = ey
        ez_ref[0] = ez

    return kernel


def _mk_x3_kernel(eos: EOSData, dfloor, efloor,
                  solver=rsolvers_mhd.hlld):
    """x3 stage kernel over sliding plane windows.

    Window holds cell planes [k0, k0+TK+4); computes faces
    [k0+2, k0+TK+3) and updates cells [k0+2, k0+TK+2)."""

    def kernel(bd_ref, w_ref, bcc_ref, bx_ref, acc_ref,
               out_ref, fd_ref, ey_ref, ez_ref):
        betadx = bd_ref[0, 0]
        w = w_ref[0]          # [5, TK+4, TJ, n1]
        b = bcc_ref[0]
        bx = bx_ref[0]        # [TK+1, TJ, n1]

        def plm_planes(q):
            dql = q[:, 1:TK + 3] - q[:, 0:TK + 2]   # cells 1..TK+2
            dqr = q[:, 2:TK + 4] - q[:, 1:TK + 3]
            dq2 = dql * dqr
            dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(dql),
                            dq2 / (dql + dqr))
            # faces rel 2..TK+2 inclusive (TK+1 faces)
            wl = q[:, 1:TK + 2] + dqm[:, 0:TK + 1]
            wr = q[:, 2:TK + 3] - dqm[:, 1:TK + 2]
            return wl, wr

        wl, wr = plm_planes(w)
        bl, br = plm_planes(b)
        wl = _floors(wl, eos, dfloor, efloor)
        wr = _floors(wr, eos, dfloor, efloor)
        from ..indices import IVZ
        f, ey, ez = solver(wl, wr, bl, br, bx, eos, IVZ)
        # update cells rel 2..TK+1 with faces rel offsets 0..TK
        out_ref[0] = acc_ref[0] - betadx * (f[:, 1:TK + 1] - f[:, 0:TK])
        fd_ref[0] = f[IDN]
        ey_ref[0] = ey
        ez_ref[0] = ez

    return kernel


def _x3_tile(n2: int, n1p: int) -> int:
    """Transverse tile for the x3 kernel (VMEM-bounded halving)."""
    tj = n2
    while tj > 8 and (TK + 1) * (-(-tj // 8) * 8) * n1p > 20480 \
            and tj % 2 == 0:
        tj //= 2
    return tj


def supports_fused_stage(phys, mesh) -> bool:
    mbi = mesh.mb_indcs
    # lane-padded extent, matching the kernel's own tile choice
    tj = _x3_tile(mbi.ncells2, -(-mbi.ncells1 // 128) * 128)
    ok_solver = ((not (phys.is_sr or phys.is_gr)
                  and phys.rsolver == "hlld")
                 or (phys.is_sr and not phys.is_gr
                     and phys.rsolver in ("hlle", "llf")))
    return (len(phys.dirs) == 3
            and phys.recon_method == "plm" and ok_solver
            and phys.nscalars == 0 and phys.eos.is_ideal
            and not phys.multilevel
            and not phys.use_fofc and phys.fofc_excise_mask is None
            and phys.srcterms is None and phys.pgrav is None
            and phys.pvisc is None and phys.presist is None
            and phys.pcond is None
            and (mbi.ncells3 - 4) % TK == 0
            and mbi.ncells3 % TK12 == 0
            # Mosaic: second-to-last block dims must be 8-divisible or
            # span the full axis (hit at e.g. 64^3 where the tile is 17)
            and (tj == mbi.ncells2 or tj % 8 == 0)
            and mbi.ng == 2)


def fused_stage3d(w, bcc, bfc, u0, u1, eos: EOSData,
                  gam0: float, gam1: float, beta_dt, dxs,
                  solver=rsolvers_mhd.hlld):
    """Fused recon+solve+RK accumulation for all three directions.

    Returns (u_new_pre_src, fden dict, emf dict).  ``u1`` must arrive
    pre-scaled by gam1 (caller does gam1*u1 once — or we fold it here).
    """
    nmb, nv, n3, n2, n1 = w.shape
    dt = w.dtype
    dfloor = eos.dfloor
    efloor = eos.pfloor / (eos.gamma - 1.0) if eos.is_ideal else 0.0

    def smem_spec():
        return pl.BlockSpec((1, 1), lambda *a: (0, 0),
                            memory_space=pltpu.SMEM)

    # keep the Mosaic stack (block buffers + HLLD live temporaries) under
    # the 16MB scoped-vmem limit: shrink the plane count per step until
    # the tile volume is bounded.  Volumes use LANE-PADDED extents (the
    # physical VMEM footprint tiles to (8,128) for f32).
    n1p = -(-n1 // 128) * 128
    n2p = -(-n2 // 8) * 8
    tk12 = TK12
    while tk12 > 1 and tk12 * n2p * n1p > _MAX_TILE:
        tk12 //= 2

    def blk(ch, tk=None):
        tk = tk12 if tk is None else tk
        if ch is None:
            return pl.BlockSpec((1, tk, n2, n1),
                                lambda m, k: (m, k, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, ch, tk, n2, n1),
                            lambda m, k: (m, 0, k, 0, 0),
                            memory_space=pltpu.VMEM)

    grid = (nmb, n3 // tk12)
    out_sds = (
        jax.ShapeDtypeStruct(w.shape, dt),                 # acc
        jax.ShapeDtypeStruct((nmb, n3, n2, n1), dt),       # fden
        jax.ShapeDtypeStruct((nmb, n3, n2, n1), dt),       # ey
        jax.ShapeDtypeStruct((nmb, n3, n2, n1), dt),       # ez
    )

    # ---- x1 (lanes): initializes the accumulator from u0/u1
    bd1 = jnp.asarray(beta_dt / dxs["x1"], dt).reshape(1, 1)
    in1 = [smem_spec(), blk(nv), blk(3), blk(None)]
    ops1 = [bd1, w, bcc, bfc["x1f"][..., :-1]]

    def mk_k1(read_u0: bool):
        def k1(*refs):
            if read_u0:
                bd_ref, w_ref, bcc_ref, bx_ref, u0_ref, u1_ref, \
                    out_ref, fd_ref, ey_ref, ez_ref = refs
            else:
                bd_ref, w_ref, bcc_ref, bx_ref, u1_ref, \
                    out_ref, fd_ref, ey_ref, ez_ref = refs
            betadx = bd_ref[0, 0]
            ww = w_ref[0]
            bb = bcc_ref[0]
            bx = bx_ref[0]
            axis = ww.ndim - 1
            wl, wr = _plm(ww, axis)
            bl, br = _plm(bb, axis)
            wl = _floors(wl, eos, dfloor, efloor)
            wr = _floors(wr, eos, dfloor, efloor)
            f, ey, ez = solver(wl, wr, bl, br, bx, eos, 1)
            df = _roll(f, 1, axis) - f
            reg = gam1 * u1_ref[0] if not read_u0 \
                else gam0 * u0_ref[0] + gam1 * u1_ref[0]
            out_ref[0] = reg - betadx * df
            fd_ref[0] = f[IDN]
            ey_ref[0] = ey
            ez_ref[0] = ez
        return k1

    if gam0 == 0.0:
        acc, fd1, ey1, ez1 = _pcall(
            mk_k1(False), grid=grid,
            in_specs=in1 + [blk(nv)],
            out_specs=(blk(nv), blk(None), blk(None), blk(None)),
            out_shape=out_sds,
        )(*ops1, u1)
    else:
        acc, fd1, ey1, ez1 = _pcall(
            mk_k1(True), grid=grid,
            in_specs=in1 + [blk(nv), blk(nv)],
            out_specs=(blk(nv), blk(None), blk(None), blk(None)),
            out_shape=out_sds,
        )(*ops1, u0, u1)

    # ---- x2 (sublanes): accumulator aliased through
    bd2 = jnp.asarray(beta_dt / dxs["x2"], dt).reshape(1, 1)
    k2 = _mk_roll_kernel(eos, 2, -2, dfloor, efloor, solver)
    acc, fd2, ey2, ez2 = _pcall(
        k2, grid=grid,
        in_specs=[smem_spec(), blk(nv), blk(3), blk(None), blk(nv)],
        out_specs=(blk(nv), blk(None), blk(None), blk(None)),
        out_shape=out_sds,
        input_output_aliases={4: 0},
    )(bd2, w, bcc, bfc["x2f"][..., :-1, :], acc)

    # ---- x3 (plane windows)
    TJ = _x3_tile(n2, n1p)
    bd3 = jnp.asarray(beta_dt / dxs["x3"], dt).reshape(1, 1)
    k3 = _mk_x3_kernel(eos, dfloor, efloor, solver)

    # when TJ spans the whole axis, drop the j grid axis: Mosaic cannot
    # prove 8 | j*TJ for non-multiple-of-8 TJ even though j is always 0
    full_tj = (TJ == n2)

    def e_blk(ch, tk, koff):
        if full_tj:
            def imap4(m, k):
                return (m, k * TK + koff, 0, 0)

            def imap5(m, k):
                return (m, 0, k * TK + koff, 0, 0)
        else:
            def imap4(m, k, j):
                return (m, k * TK + koff, j * TJ, 0)

            def imap5(m, k, j):
                return (m, 0, k * TK + koff, j * TJ, 0)
        if ch is None:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(tk), pl.Element(TJ),
                 pl.Element(n1)),
                imap4, memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(ch), pl.Element(tk),
             pl.Element(TJ), pl.Element(n1)),
            imap5, memory_space=pltpu.VMEM)

    grid3 = (nmb, (n3 - 4) // TK) if full_tj \
        else (nmb, (n3 - 4) // TK, n2 // TJ)
    acc, fd3, ey3, ez3 = _pcall(
        k3, grid=grid3,
        in_specs=[smem_spec(),
                  e_blk(nv, TK + 4, 0), e_blk(3, TK + 4, 0),
                  e_blk(None, TK + 1, 2), e_blk(nv, TK, 2)],
        out_specs=(e_blk(nv, TK, 2), e_blk(None, TK + 1, 2),
                   e_blk(None, TK + 1, 2), e_blk(None, TK + 1, 2)),
        out_shape=out_sds,
        input_output_aliases={4: 0},
    )(bd3, w, bcc, bfc["x3f"][:, :-1], acc)

    fden = {"x1": fd1, "x2": fd2, "x3": fd3}
    emf = {"e3x1": ey1, "e2x1": ez1,
           "e1x2": ey2, "e3x2": ez2,
           "e2x3": ey3, "e1x3": ez3}
    return acc, fden, emf


# ===================================================================
# Fused corner-EMF (Gardiner-Stone 2007) + constrained-transport update
# ===================================================================
def _ct_k(n3: int) -> int:
    """Cell planes per CT grid step: largest divisor of the interior
    depth among {8, 4, 2, 1} (bigger steps amortize the 2-plane window
    overlap; VMEM stays modest since the kernel is elementwise)."""
    for k in (8, 4, 2):
        if (n3 - 4) % k == 0:
            return k
    return 1


def supports_fused_ct(phys, mesh) -> bool:
    """Gate for fused_ct3d: the same single-level Newtonian 3-D f32
    envelope as the fused stage, plus no resistivity (corner_e would
    append resistive EMFs, mhd.py _add_resist)."""
    mbi = mesh.mb_indcs
    return (len(phys.dirs) == 3
            and not phys.is_gr
            and not phys.multilevel
            and phys.presist is None
            and mbi.ng == 2)


def _gs07(e_cc, cc_am, cc_bm, cc_mm, e_a, e_a_m, e_b, e_b_m,
          f_a, f_a_m, f_b, f_b_m):
    """Gardiner-Stone 07 corner EMF from 2 face pairs + 4 cell EMFs,
    upwinded by the mass fluxes (mirrors mhd.py corner_e gs07)."""
    l_b = jnp.where(f_a_m >= 0.0, e_b_m - cc_mm, e_b - cc_bm)
    r_b = jnp.where(f_a >= 0.0, e_b_m - cc_am, e_b - e_cc)
    l_a = jnp.where(f_b_m >= 0.0, e_a_m - cc_mm, e_a - cc_am)
    r_a = jnp.where(f_b >= 0.0, e_a_m - cc_bm, e_a - e_cc)
    return 0.25 * (l_b + r_b + l_a + r_a + e_b_m + e_b + e_a_m + e_a)


def fused_ct3d(w, bcc, fden, emf, bfc, bfc_old, gam0: float, gam1: float,
               beta_dt, dxs, is_sr: bool = False):
    """Corner EMFs + CT face update in one pass: no edge-centered EMF
    arrays round-trip HBM (reference: src/mhd/mhd_corner_e.cpp +
    src/mhd/mhd_ct.cpp, fused).

    Per grid step the kernel consumes a (KC+2)-plane x3 window of the
    cell-centered inputs (w, bcc, fden, face EMFs), forms corner EMFs on
    KC+1 planes, and writes KC planes of b1f/b2f plus KC+1 faces of b3f
    (the face shared by adjacent steps is computed identically by both,
    so the overlapping write is benign on the sequential TPU grid)."""
    nmb, nv, n3, n2, n1 = w.shape
    dt = w.dtype
    KC = _ct_k(n3)
    J, I = 0, 1  # axes of a 2-D (j, i) plane slab

    bd = jnp.stack([beta_dt / dxs["x1"], beta_dt / dxs["x2"],
                    beta_dt / dxs["x3"]]).astype(dt).reshape(1, 3)

    def cwin(ch):
        """(KC+2)-plane cell window starting at plane s*KC + 1."""
        if ch is None:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(KC + 2), pl.Element(n2),
                 pl.Element(n1)),
                lambda m, s: (m, s * KC + 1, 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(ch), pl.Element(KC + 2),
             pl.Element(n2), pl.Element(n1)),
            lambda m, s: (m, 0, s * KC + 1, 0, 0),
            memory_space=pltpu.VMEM)

    def owin(np_, off, nj=n2, ni=n1):
        """np_-plane output/face window starting at plane s*KC + off.
        Face-extended transverse axes (nj = n2+1 or ni = n1+1) must span
        the full axis (Mosaic tiling rule); the kernel stores partially
        and the stale extra face is ghost data refilled by the FC fill."""
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(np_), pl.Element(nj),
             pl.Element(ni)),
            lambda m, s: (m, s * KC + off, 0, 0),
            memory_space=pltpu.VMEM)

    def kern(bd_ref, w_ref, bcc_ref, fd1_ref, fd2_ref, fd3_ref,
             e3x1_ref, e2x1_ref, e1x2_ref, e3x2_ref, e2x3_ref, e1x3_ref,
             b1c_ref, b2c_ref, b3c_ref, b1o_ref, b2o_ref, b3o_ref,
             nb1_ref, nb2_ref, nb3_ref):
        bdx, bdy, bdz = bd_ref[0, 0], bd_ref[0, 1], bd_ref[0, 2]
        vx = w_ref[0, 1]
        vy = w_ref[0, 2]
        vz = w_ref[0, 3]
        if is_sr:
            # SR primitives store u^i = gamma v^i: the transport
            # velocity in E = -v x B is the 3-velocity (reference:
            # mhd_corner_e.cpp:136-143)
            ilor = jax.lax.rsqrt(1.0 + vx * vx + vy * vy + vz * vz)
            vx, vy, vz = vx * ilor, vy * ilor, vz * ilor
        bx = bcc_ref[0, 0]
        by = bcc_ref[0, 1]
        bz = bcc_ref[0, 2]
        e1cc = vz * by - vy * bz
        e2cc = vx * bz - vz * bx
        e3cc = vy * bx - vx * by
        fd1 = fd1_ref[0]
        fd2 = fd2_ref[0]
        fd3 = fd3_ref[0]

        e1 = [None] * (KC + 2)
        e2 = [None] * (KC + 2)
        e3 = [None] * (KC + 2)
        for t in range(1, KC + 2):
            # E3 along x3: faces e3x1/e3x2, corner in the (x1, x2) plane
            cc = e3cc[t]
            e3[t] = _gs07(
                cc, _roll(cc, -1, I), _roll(cc, -1, J),
                _roll(_roll(cc, -1, I), -1, J),
                e3x1_ref[0][t], _roll(e3x1_ref[0][t], -1, J),
                e3x2_ref[0][t], _roll(e3x2_ref[0][t], -1, I),
                fd1[t], _roll(fd1[t], -1, J),
                fd2[t], _roll(fd2[t], -1, I))
            # E1 along x1: faces e1x2/e1x3, corner in the (x2, x3) plane
            cc = e1cc[t]
            e1[t] = _gs07(
                cc, _roll(cc, -1, J), e1cc[t - 1],
                _roll(e1cc[t - 1], -1, J),
                e1x2_ref[0][t], e1x2_ref[0][t - 1],
                e1x3_ref[0][t], _roll(e1x3_ref[0][t], -1, J),
                fd2[t], fd2[t - 1],
                fd3[t], _roll(fd3[t], -1, J))
            # E2 along x2: faces e2x3/e2x1, corner in the (x3, x1) plane
            cc = e2cc[t]
            e2[t] = _gs07(
                cc, e2cc[t - 1], _roll(cc, -1, I),
                _roll(e2cc[t - 1], -1, I),
                e2x3_ref[0][t], _roll(e2x3_ref[0][t], -1, I),
                e2x1_ref[0][t], e2x1_ref[0][t - 1],
                fd3[t], _roll(fd3[t], -1, I),
                fd1[t], fd1[t - 1])

        # partial stores: the face-extended lane/sublane (index n1 / n2)
        # stays stale — it is ghost data, rewritten by fill_ghosts_fc
        for t in range(1, KC + 1):
            q = t - 1
            nb1_ref[0, q, :, :n1] = (
                gam0 * b1c_ref[0, q, :, :n1] + gam1 * b1o_ref[0, q, :, :n1]
                - bdy * (_roll(e3[t], 1, J) - e3[t])
                + bdz * (e2[t + 1] - e2[t]))
            nb2_ref[0, q, :n2, :] = (
                gam0 * b2c_ref[0, q, :n2, :] + gam1 * b2o_ref[0, q, :n2, :]
                + bdx * (_roll(e3[t], 1, I) - e3[t])
                - bdz * (e1[t + 1] - e1[t]))
        for t in range(1, KC + 2):
            q = t - 1
            nb3_ref[0, q] = (gam0 * b3c_ref[0, q] + gam1 * b3o_ref[0, q]
                             - bdx * (_roll(e2[t], 1, I) - e2[t])
                             + bdy * (_roll(e1[t], 1, J) - e1[t]))

    grid = (nmb, (n3 - 4) // KC)
    smem = pl.BlockSpec((1, 3), lambda *a: (0, 0),
                        memory_space=pltpu.SMEM)
    nb1, nb2, nb3 = _pcall(
        kern, grid=grid,
        in_specs=[smem,
                  cwin(nv), cwin(3),                      # w, bcc
                  cwin(None), cwin(None), cwin(None),     # fden x1/x2/x3
                  cwin(None), cwin(None),                 # e3x1, e2x1
                  cwin(None), cwin(None),                 # e1x2, e3x2
                  cwin(None), cwin(None),                 # e2x3, e1x3
                  owin(KC, 2, ni=n1 + 1), owin(KC, 2, nj=n2 + 1),
                  owin(KC + 1, 2),
                  owin(KC, 2, ni=n1 + 1), owin(KC, 2, nj=n2 + 1),
                  owin(KC + 1, 2)],
        out_specs=(owin(KC, 2, ni=n1 + 1), owin(KC, 2, nj=n2 + 1),
                   owin(KC + 1, 2)),
        out_shape=(jax.ShapeDtypeStruct(bfc["x1f"].shape, dt),
                   jax.ShapeDtypeStruct(bfc["x2f"].shape, dt),
                   jax.ShapeDtypeStruct(bfc["x3f"].shape, dt)),
        # b1/b2 windows are disjoint across steps, so aliasing is safe;
        # b3 face windows OVERLAP (stride KC, size KC+1) while gam0*b3c
        # reads the same faces — aliasing it would let step s+1 read the
        # face step s just wrote.  b3 gets a fresh buffer; its ghost
        # faces (never written) are healed by fill_ghosts_fc.
        input_output_aliases={12: 0, 13: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bd, w, bcc, fden["x1"], fden["x2"], fden["x3"],
      emf["e3x1"], emf["e2x1"], emf["e1x2"], emf["e3x2"],
      emf["e2x3"], emf["e1x3"],
      bfc["x1f"], bfc["x2f"], bfc["x3f"],
      bfc_old["x1f"], bfc_old["x2f"], bfc_old["x3f"])
    return {"x1f": nb1, "x2f": nb2, "x3f": nb3}


# ===================================================================
# Megakernel: recon + HLLD + RK accumulation + corner EMF + CT in ONE
# pallas pass — no flux, face-EMF, or edge-EMF arrays touch HBM.
# ===================================================================
def _mega_k(n3: int, v2: bool = False) -> int:
    """Cell planes per megakernel grid step: the kernel is VPU-bound,
    so pick the largest K (bounded by the HLLD live-set fitting VMEM)
    to minimize the (K+2)/K redundant x1/x2 flux compute at window
    seams.  K need not divide the interior depth: the last window's
    start is clamped (overlapping windows recompute identical values).
    ATHENAK_MEGA_K_MAX overrides the bound for VMEM tuning (default 6:
    K+2 > 8 planes of HLLD live-set blows the 128MB VMEM at 128^2
    planes, measured ~14MB/plane).  The v2 kernel additionally holds
    the in-window c2p/bcc live set on both the read and write side, so
    its default is one plane smaller (ATHENAK_MEGA_V2_K_MAX)."""
    import os
    if v2:
        kmax = int(os.environ.get("ATHENAK_MEGA_V2_K_MAX", "5"))
    else:
        kmax = int(os.environ.get("ATHENAK_MEGA_K_MAX", "6"))
    return max(1, min(kmax, n3 - 4))


def supports_mega_stage(phys, mesh) -> bool:
    """Gate for the single-pass stage megakernel: Newtonian ideal
    PLM+HLLD, 3-D, uniform mesh, no extra physics.  Unlike the split
    fused stage it has no transverse-tile shape constraints."""
    mbi = mesh.mb_indcs
    return (len(phys.dirs) == 3
            and phys.recon_method == "plm" and phys.rsolver == "hlld"
            and phys.nscalars == 0 and phys.eos.is_ideal
            and not (phys.is_sr or phys.is_gr)
            and not phys.multilevel
            and not phys.use_fofc and phys.fofc_excise_mask is None
            and phys.srcterms is None and phys.pgrav is None
            and phys.pvisc is None and phys.presist is None
            and phys.pcond is None
            and mbi.ng == 2)


def fused_mega_stage3d(w, bcc, bfc, u0, u1, bfc_old, eos: EOSData,
                       gam0: float, gam1: float, beta_dt, dxs):
    """One RK stage of 3-D Newtonian MHD in a single Pallas pass.

    Replaces fused_stage3d + fused_ct3d (reference task chain
    mhd_fluxes.cpp -> mhd_update.cpp -> mhd_corner_e.cpp -> mhd_ct.cpp)
    with one sweep over x3 plane windows: per step, PLM+HLLD in all
    three directions on a (K+4)-plane window, the flux-divergence RK
    update for K cell planes, GS07 corner EMFs on K+1 planes, and the
    CT curl update of all three face fields.  Per-stage HBM traffic is
    one read of (w, bcc, bfc, u0, u1, bfc_old) and one write of
    (u', bfc') — nothing else.

    Returns (u_new, bfc_new).  Ghost planes of every output are stale
    and must be refilled (fill_ghosts / fill_ghosts_fc) before use.
    """
    from ..indices import IVY, IVZ

    nmb, nv, n3, n2, n1 = w.shape
    dt = w.dtype
    K = _mega_k(n3)
    dfloor = eos.dfloor
    efloor = eos.pfloor / (eos.gamma - 1.0) if eos.is_ideal else 0.0
    J, I = 0, 1  # in-plane axes of a 2-D (j, i) slab

    bd = jnp.stack([beta_dt / dxs["x1"], beta_dt / dxs["x2"],
                    beta_dt / dxs["x3"]]).astype(dt).reshape(1, 3)

    # window start, clamped so the last window stays in range when K
    # does not divide the interior depth (overlapping windows recompute
    # identical values from identical inputs — benign on the sequential
    # grid; none of the outputs are input_output_aliased)
    def s0(s):
        return jnp.minimum(s * K, n3 - 4 - K)

    def win(ch, planes, off, nj=n2, ni=n1):
        if ch is None:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(planes), pl.Element(nj),
                 pl.Element(ni)),
                lambda m, s: (m, s0(s) + off, 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(ch), pl.Element(planes),
             pl.Element(nj), pl.Element(ni)),
            lambda m, s: (m, 0, s0(s) + off, 0, 0),
            memory_space=pltpu.VMEM)

    # RK stages with gam1 == 0 (e.g. VL2/RK2 stage 1) never read the
    # saved state: drop (u1, bfc_old) from the input set entirely —
    # 8 fewer field reads of HBM traffic on that stage
    skip_old = (float(gam1) == 0.0)

    def kern(*refs):
        (bd_ref, w_ref, bcc_ref, b1_ref, b2_ref, b3_ref,
         u0_ref) = refs[:7]
        if skip_old:
            u1_ref = b1o_ref = b2o_ref = b3o_ref = None
            acc_ref, nb1_ref, nb2_ref, nb3_ref = refs[7:]
        else:
            u1_ref, b1o_ref, b2o_ref, b3o_ref = refs[7:11]
            acc_ref, nb1_ref, nb2_ref, nb3_ref = refs[11:]
        bdx, bdy, bdz = bd_ref[0, 0], bd_ref[0, 1], bd_ref[0, 2]
        ww = w_ref[0]       # [5, K+4, n2, n1]  planes c0-2 .. c0+K+1
        bb = bcc_ref[0]     # [3, K+4, n2, n1]

        # ---- x1 / x2 fluxes+EMFs on local planes 1..K+2 (K+2 planes)
        wmid = ww[:, 1:K + 3]
        bmid = bb[:, 1:K + 3]

        wl, wr = _plm(wmid, 3)
        bl, br = _plm(bmid, 3)
        wl = _floors(wl, eos, dfloor, efloor)
        wr = _floors(wr, eos, dfloor, efloor)
        bx1 = b1_ref[0, :, :, :n1]
        f1, e3x1, e2x1 = rsolvers_mhd.hlld(wl, wr, bl, br, bx1, eos, 1)
        fd1 = f1[IDN]

        wl, wr = _plm(wmid, 2)
        bl, br = _plm(bmid, 2)
        wl = _floors(wl, eos, dfloor, efloor)
        wr = _floors(wr, eos, dfloor, efloor)
        bx2 = b2_ref[0, :, :n2, :]
        f2, e1x2, e3x2 = rsolvers_mhd.hlld(wl, wr, bl, br, bx2, eos, IVY)
        fd2 = f2[IDN]

        # ---- x3 fluxes+EMFs on faces local q = 0..K (face c0+q)
        dql = ww[:, 1:K + 3] - ww[:, 0:K + 2]
        dqr = ww[:, 2:K + 4] - ww[:, 1:K + 3]
        dq2 = dql * dqr
        dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(dql), dq2 / (dql + dqr))
        wl = _floors(ww[:, 1:K + 2] + dqm[:, 0:K + 1], eos, dfloor, efloor)
        wr = _floors(ww[:, 2:K + 3] - dqm[:, 1:K + 2], eos, dfloor, efloor)
        dql = bb[:, 1:K + 3] - bb[:, 0:K + 2]
        dqr = bb[:, 2:K + 4] - bb[:, 1:K + 3]
        dq2 = dql * dqr
        dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(dql), dq2 / (dql + dqr))
        bl = bb[:, 1:K + 2] + dqm[:, 0:K + 1]
        br = bb[:, 2:K + 3] - dqm[:, 1:K + 2]
        bx3 = b3_ref[0]     # [K+1, n2, n1] faces c0 .. c0+K
        f3, e2x3, e1x3 = rsolvers_mhd.hlld(wl, wr, bl, br, bx3, eos, IVZ)
        fd3 = f3[IDN]

        # ---- RK update of cell planes c0..c0+K-1 (x1/x2 local 1..K)
        df1 = _roll(f1, 1, 3) - f1
        df2 = _roll(f2, 1, 2) - f2
        u_old = 0.0 if skip_old else gam1 * u1_ref[0]
        acc_ref[0] = (gam0 * u0_ref[0] + u_old
                      - bdx * df1[:, 1:K + 1] - bdy * df2[:, 1:K + 1]
                      - bdz * (f3[:, 1:K + 1] - f3[:, 0:K]))

        # ---- corner EMFs on planes c0..c0+K (x1/x2 local a=1..K+1,
        # x3 face local q=a-1; cell window local t2=a+1)
        vx, vy, vz = ww[1], ww[2], ww[3]
        bxc, byc, bzc = bb[0], bb[1], bb[2]
        e1cc = vz * byc - vy * bzc
        e2cc = vx * bzc - vz * bxc
        e3cc = vy * bxc - vx * byc
        e1 = [None] * (K + 2)
        e2 = [None] * (K + 2)
        e3 = [None] * (K + 2)
        for a in range(1, K + 2):
            q = a - 1
            t2 = a + 1
            cc = e3cc[t2]
            e3[a] = _gs07(
                cc, _roll(cc, -1, I), _roll(cc, -1, J),
                _roll(_roll(cc, -1, I), -1, J),
                e3x1[a], _roll(e3x1[a], -1, J),
                e3x2[a], _roll(e3x2[a], -1, I),
                fd1[a], _roll(fd1[a], -1, J),
                fd2[a], _roll(fd2[a], -1, I))
            cc = e1cc[t2]
            e1[a] = _gs07(
                cc, _roll(cc, -1, J), e1cc[t2 - 1],
                _roll(e1cc[t2 - 1], -1, J),
                e1x2[a], e1x2[a - 1],
                e1x3[q], _roll(e1x3[q], -1, J),
                fd2[a], fd2[a - 1],
                fd3[q], _roll(fd3[q], -1, J))
            cc = e2cc[t2]
            e2[a] = _gs07(
                cc, e2cc[t2 - 1], _roll(cc, -1, I),
                _roll(e2cc[t2 - 1], -1, I),
                e2x3[q], _roll(e2x3[q], -1, I),
                e2x1[a], e2x1[a - 1],
                fd3[q], _roll(fd3[q], -1, I),
                fd1[a], fd1[a - 1])

        # ---- CT (see fused_ct3d for the overlap/aliasing rules)
        for a in range(1, K + 1):
            q = a - 1
            b1_old = 0.0 if skip_old else gam1 * b1o_ref[0, q, :, :n1]
            nb1_ref[0, q, :, :n1] = (
                gam0 * b1_ref[0, a, :, :n1] + b1_old
                - bdy * (_roll(e3[a], 1, J) - e3[a])
                + bdz * (e2[a + 1] - e2[a]))
            b2_old = 0.0 if skip_old else gam1 * b2o_ref[0, q, :n2, :]
            nb2_ref[0, q, :n2, :] = (
                gam0 * b2_ref[0, a, :n2, :] + b2_old
                + bdx * (_roll(e3[a], 1, I) - e3[a])
                - bdz * (e1[a + 1] - e1[a]))
        for a in range(1, K + 2):
            q = a - 1
            b3_old = 0.0 if skip_old else gam1 * b3o_ref[0, q]
            nb3_ref[0, q] = (gam0 * b3_ref[0, q] + b3_old
                             - bdx * (_roll(e2[a], 1, I) - e2[a])
                             + bdy * (_roll(e1[a], 1, J) - e1[a]))

    grid = (nmb, -(-(n3 - 4) // K))
    smem = pl.BlockSpec((1, 3), lambda *a: (0, 0),
                        memory_space=pltpu.SMEM)
    in_specs = [smem,
                win(nv, K + 4, 0), win(3, K + 4, 0),         # w, bcc
                win(None, K + 2, 1, ni=n1 + 1),              # b1f
                win(None, K + 2, 1, nj=n2 + 1),              # b2f
                win(None, K + 1, 2),                         # b3f
                win(nv, K, 2)]                               # u0
    args = [bd, w, bcc, bfc["x1f"], bfc["x2f"], bfc["x3f"], u0]
    if not skip_old:
        in_specs += [win(nv, K, 2),                          # u1
                     win(None, K, 2, ni=n1 + 1),             # b1 old
                     win(None, K, 2, nj=n2 + 1),             # b2 old
                     win(None, K + 1, 2)]                    # b3 old
        args += [u1, bfc_old["x1f"], bfc_old["x2f"], bfc_old["x3f"]]
    acc, nb1, nb2, nb3 = _pcall(
        kern, grid=grid,
        in_specs=in_specs,
        out_specs=(win(nv, K, 2),
                   win(None, K, 2, ni=n1 + 1),
                   win(None, K, 2, nj=n2 + 1),
                   win(None, K + 1, 2)),
        out_shape=(jax.ShapeDtypeStruct(u0.shape, dt),
                   jax.ShapeDtypeStruct(bfc["x1f"].shape, dt),
                   jax.ShapeDtypeStruct(bfc["x2f"].shape, dt),
                   jax.ShapeDtypeStruct(bfc["x3f"].shape, dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return acc, {"x1f": nb1, "x2f": nb2, "x3f": nb3}


# ===================================================================
# Megakernel v2: the whole stage INCLUDING c2p/bcc/floors/new-dt in one
# pass over (u, bfc) — the w and bcc arrays never exist in HBM.
# ===================================================================
def supports_mega_v2(phys, mesh) -> bool:
    """Gate for fused_mega_stage3d_v2: the mega envelope plus no
    module that reads state["w"]/state["bcc"] between stages (the v2
    state carries only u and bfc; primitives live in VMEM)."""
    return (supports_mega_stage(phys, mesh)
            and getattr(phys, "pturb", None) is None
            and getattr(phys, "ppart", None) is None
            and getattr(phys, "psbox", None) is None
            and getattr(phys, "srcterms_func", None) is None
            and phys.bvals.user_bc_func is None
            and not phys.bvals.prolong_prims)


def _c2p5(uu, bx, by, bz, eos: EOSData, efloor):
    """Newtonian ideal-MHD cons->prim with the full floor chain
    (mirrors fused_aux3d / eos.cons_to_prim): returns (w5-list, u5-list
    floored, dfloor_mask, e_or_s_mask, tfloor_mask)."""
    gm1 = eos.gamma - 1.0
    d, mx, my, mz, etot = uu[0], uu[1], uu[2], uu[3], uu[4]
    b2 = bx * bx + by * by + bz * bz
    dfl = jnp.maximum(eos.dfloor, b2 / eos.sigma_max)
    dfloor_used = d < dfl
    d = jnp.maximum(d, dfl)
    di = 1.0 / d
    vx, vy, vz = di * mx, di * my, di * mz
    e_k = 0.5 * di * (mx * mx + my * my + mz * mz)
    e_m = 0.5 * b2
    e = etot - e_k - e_m
    efloor_used = e < efloor
    e = jnp.maximum(e, efloor)
    tfloor_used = gm1 * e * di < eos.tfloor
    e = jnp.where(tfloor_used, d * eos.tfloor / gm1, e)
    spe = gm1 / jnp.power(d, gm1)
    sfloor_used = spe * e * di <= eos.sfloor
    e = jnp.where(sfloor_used, d * eos.sfloor / spe, e)
    etot_fixed = jnp.where(efloor_used | tfloor_used | sfloor_used,
                           e + e_k + e_m, etot)
    return ([d, vx, vy, vz, e], [d, mx, my, mz, etot_fixed],
            dfloor_used, efloor_used | sfloor_used, tfloor_used)


def fused_mega_stage3d_v2(u, bfc, u1, bfc_old, eos: EOSData,
                          gam0: float, gam1: float, beta_dt, dxs,
                          wrap: bool = False, want_dt: bool = True):
    """One full RK stage of 3-D Newtonian MHD from (u, bfc) alone.

    Extends fused_mega_stage3d (reference task chain mhd_fluxes.cpp ->
    mhd_update.cpp -> mhd_corner_e.cpp -> mhd_ct.cpp + ideal_c2p_mhd
    + mhd_newdt.cpp) by moving cons_to_prim, the face->cell bcc
    average, the floor chain, the floor event counters, and the new-dt
    maxima INTO the stage kernel: per stage the HBM traffic is one read
    of (u, bfc[, u1, bfc_old]) and one write of (u', bfc') — the w and
    bcc arrays never exist.

    ``u``/``bfc`` must arrive ghost-filled; outputs carry stale ghosts
    (``wrap=True`` wraps the in-plane ghosts of u' for single-block
    periodic meshes; x3 ghost planes are healed by the caller).

    Returns (u_new_floored, bfc_new, counters) where counters holds the
    floor counts of the UPDATED state and (want_dt) its "dtmin".
    """
    from .pallas_fill import _wrap_plane
    from ..indices import IVY, IVZ

    nmb, nv, n3, n2, n1 = u.shape
    dt = u.dtype
    K = _mega_k(n3, v2=True)
    dfloor = eos.dfloor
    gm1 = eos.gamma - 1.0
    gam = eos.gamma
    efloor = eos.pfloor / gm1 if eos.is_ideal else 0.0
    J, I = 0, 1

    bd = jnp.stack([beta_dt / dxs["x1"], beta_dt / dxs["x2"],
                    beta_dt / dxs["x3"]]).astype(dt).reshape(1, 3)

    def s0(s):
        return jnp.minimum(s * K, n3 - 4 - K)

    def win(ch, planes, off, nj=n2, ni=n1):
        if ch is None:
            return pl.BlockSpec(
                (pl.Element(1), pl.Element(planes), pl.Element(nj),
                 pl.Element(ni)),
                lambda m, s: (m, s0(s) + off, 0, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(ch), pl.Element(planes),
             pl.Element(nj), pl.Element(ni)),
            lambda m, s: (m, 0, s0(s) + off, 0, 0),
            memory_space=pltpu.VMEM)

    skip_old = (float(gam1) == 0.0)
    ncnt = 6 if want_dt else 3

    def kern(*refs):
        bd_ref, u_ref, b1_ref, b2_ref, b3_ref = refs[:5]
        if skip_old:
            u1_ref = b1o_ref = b2o_ref = b3o_ref = None
            acc_ref, nb1_ref, nb2_ref, nb3_ref, cnt_ref = refs[5:]
        else:
            u1_ref, b1o_ref, b2o_ref, b3o_ref = refs[5:9]
            acc_ref, nb1_ref, nb2_ref, nb3_ref, cnt_ref = refs[9:]
        m = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(jnp.logical_and(s == 0, m == 0))
        def _init():
            for c in range(ncnt):
                cnt_ref[0, c] = 0.0

        bdx, bdy, bdz = bd_ref[0, 0], bd_ref[0, 1], bd_ref[0, 2]

        # ---- in-kernel bcc + c2p on the (K+4)-plane window
        uu = u_ref[0]                 # [5, K+4, n2, n1]
        b1w = b1_ref[0]               # [K+4, n2, n1+1]
        b2w = b2_ref[0]               # [K+4, n2+1, n1]
        b3w = b3_ref[0]               # [K+5, n2, n1]
        if wrap:
            # READ-side periodic in-plane ghost wrap: single-block
            # periodic meshes never materialize in-plane ghosts in HBM
            # (the caller heals only the x3 ghost planes/faces with slab
            # copies).  _wrap_plane's roll distance is the interior
            # extent, which is the correct wrap for both cell axes and
            # (n+1)-extent face axes.
            uu = _wrap_plane(uu, n2 - 4, n1 - 4)
            b1w = _wrap_plane(b1w, n2 - 4, n1 - 4)
            b2w = _wrap_plane(b2w, n2 - 4, n1 - 4)
            b3w = _wrap_plane(b3w, n2 - 4, n1 - 4)
        bxw = 0.5 * (b1w[:, :, :n1] + b1w[:, :, 1:])
        byw = 0.5 * (b2w[:, :n2, :] + b2w[:, 1:, :])
        bzw = 0.5 * (b3w[0:K + 4] + b3w[1:K + 5])
        w5, u5, _, _, _ = _c2p5([uu[c] for c in range(5)],
                                bxw, byw, bzw, eos, efloor)
        ww = jnp.stack(w5)            # [5, K+4, n2, n1] primitives
        bb = jnp.stack([bxw, byw, bzw])

        # ---- x1 / x2 fluxes+EMFs on local planes 1..K+2
        wmid = ww[:, 1:K + 3]
        bmid = bb[:, 1:K + 3]

        wl, wr = _plm(wmid, 3)
        bl, br = _plm(bmid, 3)
        wl = _floors(wl, eos, dfloor, efloor)
        wr = _floors(wr, eos, dfloor, efloor)
        bx1 = b1w[1:K + 3, :, :n1]
        f1, e3x1, e2x1 = rsolvers_mhd.hlld(wl, wr, bl, br, bx1, eos, 1)
        fd1 = f1[IDN]

        wl, wr = _plm(wmid, 2)
        bl, br = _plm(bmid, 2)
        wl = _floors(wl, eos, dfloor, efloor)
        wr = _floors(wr, eos, dfloor, efloor)
        bx2 = b2w[1:K + 3, :n2, :]
        f2, e1x2, e3x2 = rsolvers_mhd.hlld(wl, wr, bl, br, bx2, eos, IVY)
        fd2 = f2[IDN]

        # ---- x3 fluxes+EMFs on faces local q = 0..K
        dql = ww[:, 1:K + 3] - ww[:, 0:K + 2]
        dqr = ww[:, 2:K + 4] - ww[:, 1:K + 3]
        dq2 = dql * dqr
        dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(dql), dq2 / (dql + dqr))
        wl = _floors(ww[:, 1:K + 2] + dqm[:, 0:K + 1], eos, dfloor, efloor)
        wr = _floors(ww[:, 2:K + 3] - dqm[:, 1:K + 2], eos, dfloor, efloor)
        dql = bb[:, 1:K + 3] - bb[:, 0:K + 2]
        dqr = bb[:, 2:K + 4] - bb[:, 1:K + 3]
        dq2 = dql * dqr
        dqm = jnp.where(dq2 <= 0.0, jnp.zeros_like(dql), dq2 / (dql + dqr))
        bl = bb[:, 1:K + 2] + dqm[:, 0:K + 1]
        br = bb[:, 2:K + 3] - dqm[:, 1:K + 2]
        bx3 = b3w[2:K + 3]
        f3, e2x3, e1x3 = rsolvers_mhd.hlld(wl, wr, bl, br, bx3, eos, IVZ)
        fd3 = f3[IDN]

        # ---- RK update of cell planes c0..c0+K-1 (u window local 2..K+1)
        df1 = _roll(f1, 1, 3) - f1
        df2 = _roll(f2, 1, 2) - f2
        u_old = 0.0 if skip_old else gam1 * u1_ref[0]
        u0_stack = jnp.stack([u5[c][2:K + 2] for c in range(5)])
        acc = (gam0 * u0_stack + u_old
               - bdx * df1[:, 1:K + 1] - bdy * df2[:, 1:K + 1]
               - bdz * (f3[:, 1:K + 1] - f3[:, 0:K]))

        # ---- corner EMFs on planes c0..c0+K
        vx, vy, vz = ww[1], ww[2], ww[3]
        bxc, byc, bzc = bb[0], bb[1], bb[2]
        e1cc = vz * byc - vy * bzc
        e2cc = vx * bzc - vz * bxc
        e3cc = vy * bxc - vx * byc
        e1 = [None] * (K + 2)
        e2 = [None] * (K + 2)
        e3 = [None] * (K + 2)
        for a in range(1, K + 2):
            q = a - 1
            t2 = a + 1
            cc = e3cc[t2]
            e3[a] = _gs07(
                cc, _roll(cc, -1, I), _roll(cc, -1, J),
                _roll(_roll(cc, -1, I), -1, J),
                e3x1[a], _roll(e3x1[a], -1, J),
                e3x2[a], _roll(e3x2[a], -1, I),
                fd1[a], _roll(fd1[a], -1, J),
                fd2[a], _roll(fd2[a], -1, I))
            cc = e1cc[t2]
            e1[a] = _gs07(
                cc, _roll(cc, -1, J), e1cc[t2 - 1],
                _roll(e1cc[t2 - 1], -1, J),
                e1x2[a], e1x2[a - 1],
                e1x3[q], _roll(e1x3[q], -1, J),
                fd2[a], fd2[a - 1],
                fd3[q], _roll(fd3[q], -1, J))
            cc = e2cc[t2]
            e2[a] = _gs07(
                cc, e2cc[t2 - 1], _roll(cc, -1, I),
                _roll(e2cc[t2 - 1], -1, I),
                e2x3[q], _roll(e2x3[q], -1, I),
                e2x1[a], e2x1[a - 1],
                fd3[q], _roll(fd3[q], -1, I),
                fd1[a], fd1[a - 1])

        # ---- CT: build new faces in-register (b1/b2 on K planes, b3 on
        # K+1), then store (b1/b2 windows are disjoint; b3 overlaps one
        # face whose value both steps compute identically)
        b1n = [None] * K
        b2n = [None] * K
        b3n = [None] * (K + 1)
        for a in range(1, K + 1):
            q = a - 1
            b1_old = 0.0 if skip_old else gam1 * b1o_ref[0, q, :, :n1]
            b1n[q] = (gam0 * b1w[a + 1, :, :n1] + b1_old
                      - bdy * (_roll(e3[a], 1, J) - e3[a])
                      + bdz * (e2[a + 1] - e2[a]))
            b2_old = 0.0 if skip_old else gam1 * b2o_ref[0, q, :n2, :]
            b2n[q] = (gam0 * b2w[a + 1, :n2, :] + b2_old
                      + bdx * (_roll(e3[a], 1, I) - e3[a])
                      - bdz * (e1[a + 1] - e1[a]))
        for a in range(1, K + 2):
            q = a - 1
            b3_old = 0.0 if skip_old else gam1 * b3o_ref[0, q]
            b3n[q] = (gam0 * b3w[q + 2] + b3_old
                      - bdx * (_roll(e2[a], 1, I) - e2[a])
                      + bdy * (_roll(e1[a], 1, J) - e1[a]))

        # ---- output-side bcc + c2p + floors + counters + new-dt maxima
        # (reference: ideal_c2p_mhd.hpp floors + mhd_newdt.cpp); the
        # lane/sublane rolls leave only ghost cells wrong (no face n1)
        b1s = jnp.stack(b1n)
        b2s = jnp.stack(b2n)
        nbx = 0.5 * (b1s + _roll(b1s, -1, 2))
        nby = 0.5 * (b2s + _roll(b2s, -1, 1))
        nbz = 0.5 * (jnp.stack(b3n[:K]) + jnp.stack(b3n[1:]))
        w5n, u5n, dfl_m, efl_m, tfl_m = _c2p5(
            [acc[c] for c in range(5)], nbx, nby, nbz, eos, efloor)
        acc = jnp.stack(u5n)

        # interior mask; exclude planes re-covered by the clamped last
        # window (kk < s*K + 2) so counters count each cell once
        shp = acc.shape[1:]
        kk = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + s0(s) + 2
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
        interior = ((kk >= s * K + 2) & (kk < n3 - 2) & (jj >= 2)
                    & (jj < n2 - 2) & (ii >= 2) & (ii < n1 - 2))

        def count(msk):
            return jnp.sum((msk & interior).astype(jnp.float32))

        cnt_ref[0, 0] += count(dfl_m)
        cnt_ref[0, 1] += count(efl_m)
        cnt_ref[0, 2] += count(tfl_m)

        if want_dt:
            d, vxn, vyn, vzn, e = w5n
            di = 1.0 / d
            asq = gam * gm1 * e * di

            def cfast(bn, bt1, bt2):
                ct2 = bt1 * bt1 + bt2 * bt2
                qsq = bn * bn + ct2 + asq * d
                tmp = bn * bn + ct2 - asq * d
                return jnp.sqrt(
                    0.5 * (qsq + jnp.sqrt(tmp * tmp
                                          + 4.0 * asq * d * ct2)) * di)

            for c, (vv, args) in enumerate((
                    (vxn, (nbx, nby, nbz)), (vyn, (nby, nbz, nbx)),
                    (vzn, (nbz, nbx, nby)))):
                dv = jnp.where(interior, jnp.abs(vv) + cfast(*args), 0.0)
                cnt_ref[0, 3 + c] = jnp.maximum(
                    cnt_ref[0, 3 + c], jnp.max(dv).astype(jnp.float32))

        acc_ref[0] = acc
        for q in range(K):
            nb1_ref[0, q, :, :n1] = b1n[q]
            nb2_ref[0, q, :n2, :] = b2n[q]
        for q in range(K + 1):
            nb3_ref[0, q] = b3n[q]

    grid = (nmb, -(-(n3 - 4) // K))
    smem = pl.BlockSpec((1, 3), lambda *a: (0, 0),
                        memory_space=pltpu.SMEM)
    in_specs = [smem,
                win(nv, K + 4, 0),                           # u
                win(None, K + 4, 0, ni=n1 + 1),              # b1f
                win(None, K + 4, 0, nj=n2 + 1),              # b2f
                win(None, K + 5, 0)]                         # b3f
    args = [bd, u, bfc["x1f"], bfc["x2f"], bfc["x3f"]]
    if not skip_old:
        in_specs += [win(nv, K, 2),                          # u1
                     win(None, K, 2, ni=n1 + 1),             # b1 old
                     win(None, K, 2, nj=n2 + 1),             # b2 old
                     win(None, K + 1, 2)]                    # b3 old
        args += [u1, bfc_old["x1f"], bfc_old["x2f"], bfc_old["x3f"]]
    acc, nb1, nb2, nb3, cnt = _pcall(
        kern, grid=grid,
        in_specs=in_specs,
        out_specs=(win(nv, K, 2),
                   win(None, K, 2, ni=n1 + 1),
                   win(None, K, 2, nj=n2 + 1),
                   win(None, K + 1, 2),
                   pl.BlockSpec((1, ncnt), lambda *a: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct(u.shape, dt),
                   jax.ShapeDtypeStruct(bfc["x1f"].shape, dt),
                   jax.ShapeDtypeStruct(bfc["x2f"].shape, dt),
                   jax.ShapeDtypeStruct(bfc["x3f"].shape, dt),
                   jax.ShapeDtypeStruct((1, ncnt), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)

    counters = {"neos_dfloor": cnt[0, 0].astype(jnp.int32),
                "neos_efloor": cnt[0, 1].astype(jnp.int32),
                "neos_tfloor": cnt[0, 2].astype(jnp.int32)}
    if want_dt:
        dtmin = jnp.asarray(dxs["x1"], jnp.float32) / cnt[0, 3]
        dtmin = jnp.minimum(
            dtmin, jnp.asarray(dxs["x2"], jnp.float32) / cnt[0, 4])
        dtmin = jnp.minimum(
            dtmin, jnp.asarray(dxs["x3"], jnp.float32) / cnt[0, 5])
        counters["dtmin"] = dtmin.astype(dt)
    return acc, {"x1f": nb1, "x2f": nb2, "x3f": nb3}, counters


# ===================================================================
# Post-stage aux kernel: bcc + cons_to_prim + periodic CC fill fused
# ===================================================================
def fused_aux3d(u, bfc, eos: EOSData, dxs=None, wrap: bool = True):
    """compute_bcc + Newtonian ideal-MHD c2p + the single-block periodic
    CC ghost fill of (u, w, bcc) in one bulk pass (reference chain:
    mhd.cpp bcc0 + ideal_c2p_mhd.hpp + the periodic BC copies).

    ``bfc`` must already be ghost-filled, which makes the face-averaged
    bcc valid at every cell including ghosts; in-plane (x1/x2) ghosts
    are wrapped in-register.  The four x3 ghost PLANES come out stale:
    w's are healed by one plane-axis concatenate (the only consumer of
    CC ghost planes on the fast path is the next stage's w window); u's
    ghost planes stay stale by design — the megakernel reads u0/u1 at
    interior planes only.  Floor counters are accumulated over interior
    cells.

    With ``dxs`` (dict of scalar cell sizes) the kernel additionally
    accumulates the per-direction interior maxima of |v_d| + c_fast,d
    (reference: mhd_newdt.cpp) so the new-dt pass needs no extra state
    read; counters then include "dtmin" = min_d dx_d / max_d.

    ``wrap``: apply the single-block periodic in-plane ghost wrap (and
    the x3 ghost-plane heal of w).  Pass False on multi-block pools,
    where ghosts are owned by the pool fill: inputs must arrive with
    ghosts already filled, and outputs carry exact ghost values wherever
    the inputs did (c2p/bcc are pointwise).

    Returns (u_fixed, w, bcc, counters)."""
    from .pallas_fill import _wrap_plane

    nmb, nv, n3, n2, n1 = u.shape
    dt = u.dtype
    gm1 = eos.gamma - 1.0
    gam = eos.gamma
    efloor = eos.pfloor / gm1
    want_dt = dxs is not None
    # plane-group size: bounded by scoped VMEM (13 output channels
    # x KP planes live, double-buffered; 16 overflows at 128^2 planes);
    # largest divisor of the depth within the budget
    cap = 8 if n2 * (-(-n1 // 128) * 128) >= 96 * 128 else 16
    KP = max(d for d in range(1, cap + 1) if n3 % d == 0)

    def kern(u_ref, b1_ref, b2_ref, b3_ref,
             u_out, w_out, bcc_out, cnt_ref):
        s = pl.program_id(1)

        @pl.when(jnp.logical_and(s == 0, pl.program_id(0) == 0))
        def _init():
            cnt_ref[0, 0] = 0.0
            cnt_ref[0, 1] = 0.0
            cnt_ref[0, 2] = 0.0
            if want_dt:
                cnt_ref[0, 3] = 0.0
                cnt_ref[0, 4] = 0.0
                cnt_ref[0, 5] = 0.0

        uu = u_ref[0]                       # [5, KP, n2, n1]
        bx = 0.5 * (b1_ref[0, :, :, :n1] + b1_ref[0, :, :, 1:])
        by = 0.5 * (b2_ref[0, :, :n2, :] + b2_ref[0, :, 1:, :])
        bz = 0.5 * (b3_ref[0, 0:KP] + b3_ref[0, 1:KP + 1])

        d, mx, my, mz, etot = uu[0], uu[1], uu[2], uu[3], uu[4]
        b2 = bx * bx + by * by + bz * bz
        dfl = jnp.maximum(eos.dfloor, b2 / eos.sigma_max)
        dfloor_used = d < dfl
        d = jnp.maximum(d, dfl)
        di = 1.0 / d
        vx, vy, vz = di * mx, di * my, di * mz
        e_k = 0.5 * di * (mx * mx + my * my + mz * mz)
        e_m = 0.5 * b2
        e = etot - e_k - e_m
        efloor_used = e < efloor
        e = jnp.maximum(e, efloor)
        tfloor_used = gm1 * e * di < eos.tfloor
        e = jnp.where(tfloor_used, d * eos.tfloor / gm1, e)
        spe = gm1 / jnp.power(d, gm1)
        sfloor_used = spe * e * di <= eos.sfloor
        e = jnp.where(sfloor_used, d * eos.sfloor / spe, e)
        etot_fixed = jnp.where(efloor_used | tfloor_used | sfloor_used,
                               e + e_k + e_m, etot)

        # interior mask (counters exclude ghosts; stale ghost planes
        # would otherwise contribute garbage counts)
        shp = d.shape
        kk = jax.lax.broadcasted_iota(jnp.int32, shp, 0) + s * KP
        jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
        interior = ((kk >= 2) & (kk < n3 - 2) & (jj >= 2)
                    & (jj < n2 - 2) & (ii >= 2) & (ii < n1 - 2))

        def count(m):
            return jnp.sum((m & interior).astype(jnp.float32))

        cnt_ref[0, 0] += count(dfloor_used)
        cnt_ref[0, 1] += count(efloor_used | sfloor_used)
        cnt_ref[0, 2] += count(tfloor_used)

        if want_dt:
            # per-direction max |v_d| + c_fast,d over interior cells
            # (reference: mhd_newdt.cpp + eos IdealMHDFastSpeed)
            asq = gam * gm1 * e * di

            def cfast(bn, bt1, bt2):
                ct2 = bt1 * bt1 + bt2 * bt2
                qsq = bn * bn + ct2 + asq * d
                tmp = bn * bn + ct2 - asq * d
                return jnp.sqrt(
                    0.5 * (qsq + jnp.sqrt(tmp * tmp
                                          + 4.0 * asq * d * ct2)) * di)

            for c, (vv, args) in enumerate((
                    (vx, (bx, by, bz)), (vy, (by, bz, bx)),
                    (vz, (bz, bx, by)))):
                dv = jnp.where(interior, jnp.abs(vv) + cfast(*args), 0.0)
                cnt_ref[0, 3 + c] = jnp.maximum(
                    cnt_ref[0, 3 + c], jnp.max(dv).astype(jnp.float32))

        ni2, ni1 = n2 - 4, n1 - 4
        uu_out = jnp.stack([d, mx, my, mz, etot_fixed])
        ww_out = jnp.stack([d, vx, vy, vz, e])
        bb_out = jnp.stack([bx, by, bz])
        if wrap:
            uu_out = _wrap_plane(uu_out, ni2, ni1)
            ww_out = _wrap_plane(ww_out, ni2, ni1)
            bb_out = _wrap_plane(bb_out, ni2, ni1)
        u_out[0] = uu_out
        w_out[0] = ww_out
        bcc_out[0] = bb_out

    def cwin(ch):
        return pl.BlockSpec(
            (1, ch, KP, n2, n1), lambda m, s: (m, 0, s, 0, 0),
            memory_space=pltpu.VMEM)

    def fwin(planes, nj=n2, ni=n1):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(planes), pl.Element(nj),
             pl.Element(ni)),
            lambda m, s: (m, s * KP, 0, 0),
            memory_space=pltpu.VMEM)

    ncnt = 6 if want_dt else 3
    u_fixed, w, bcc, cnt = _pcall(
        kern, grid=(nmb, n3 // KP),
        in_specs=[cwin(nv),
                  fwin(KP, ni=n1 + 1), fwin(KP, nj=n2 + 1),
                  fwin(KP + 1)],
        out_specs=(cwin(nv), cwin(nv), cwin(3),
                   pl.BlockSpec((1, ncnt), lambda *a: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct(u.shape, dt),
                   jax.ShapeDtypeStruct(u.shape, dt),
                   jax.ShapeDtypeStruct((nmb, 3, n3, n2, n1), dt),
                   jax.ShapeDtypeStruct((1, ncnt), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(u, bfc["x1f"], bfc["x2f"], bfc["x3f"])

    if wrap:
        # heal w's x3 ghost planes (periodic wrap) with one concatenate
        w = jnp.concatenate([w[:, :, n3 - 4:n3 - 2], w[:, :, 2:n3 - 2],
                             w[:, :, 2:4]], axis=2)

    counters = {"neos_dfloor": cnt[0, 0].astype(jnp.int32),
                "neos_efloor": cnt[0, 1].astype(jnp.int32),
                "neos_tfloor": cnt[0, 2].astype(jnp.int32)}
    if want_dt:
        dtmin = jnp.asarray(dxs["x1"], jnp.float32) / cnt[0, 3]
        dtmin = jnp.minimum(
            dtmin, jnp.asarray(dxs["x2"], jnp.float32) / cnt[0, 4])
        dtmin = jnp.minimum(
            dtmin, jnp.asarray(dxs["x3"], jnp.float32) / cnt[0, 5])
        counters["dtmin"] = dtmin.astype(dt)
    return u_fixed, w, bcc, counters
