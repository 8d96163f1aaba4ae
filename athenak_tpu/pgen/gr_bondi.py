"""GR Bondi accretion: stationary spherical accretion onto a black hole.

Parity target: reference src/pgen/tests/gr_bondi.cpp — sets the analytic
Hawley, Smarr & Wilson (1984) solution in Cartesian Kerr-Schild
coordinates, evolves, and reports the deviation from stationarity as the
L1 error.  Boundary ghost zones are held fixed at the analytic solution
(FixedBondiInflow, gr_bondi.cpp:526-699) via the user-BC hook.

Host-side initial data uses vectorized numpy bisection for the HSW eq. 76
temperature root.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IM1, IM2, IM3
from . import errors as err_mod

_TMIN, _TMAX = 1.0e-2, 1.0e1


def _temperature(r, n_adi, c1, c2):
    """Solve HSW eq. 76 for T(r) by bracketed bisection (vectorized).
    Uses the lesser root inside r_crit and the greater root outside,
    split at the local minimum of the residual (gr_bondi.cpp:370-447)."""
    r = np.asarray(r, dtype=np.float64)

    def resid(t):
        return ((1.0 + (n_adi + 1.0) * t) ** 2
                * (1.0 - 2.0 / r + c1 * c1
                   / (r ** 4 * t ** (2.0 * n_adi))) - c2)

    # ternary search for the residual minimum (unimodal between the two
    # roots of HSW 76); the minimizing T has negative residual
    t_lo = np.full_like(r, _TMIN)
    t_hi = np.full_like(r, _TMAX)
    for _ in range(120):
        m1 = t_lo + (t_hi - t_lo) / 3.0
        m2 = t_hi - (t_hi - t_lo) / 3.0
        take_left = resid(m1) < resid(m2)
        t_hi = np.where(take_left, m2, t_hi)
        t_lo = np.where(take_left, t_lo, m1)
    t_neg = 0.5 * (t_lo + t_hi)  # temperature where residual < 0

    # bisection on the chosen branch
    def bisect(tmin, tmax):
        rmin = resid(tmin)
        for _ in range(60):
            tm = 0.5 * (tmin + tmax)
            rm = resid(tm)
            same = np.sign(rm) == np.sign(rmin)
            tmin = np.where(same, tm, tmin)
            rmin = np.where(same, rm, rmin)
            tmax = np.where(same, tmax, tm)
        return 0.5 * (tmin + tmax)

    # r_crit from caller scope: residual min separates the two roots
    lesser = bisect(np.full_like(r, _TMIN), t_neg)
    greater = bisect(t_neg, np.full_like(r, _TMAX))
    return lesser, greater


def _analytic_prims(mesh, pin, gamma, spin, dexcise, pexcise):
    """Full-array analytic primitives (ghosts included)."""
    k_adi = pin.get_real("problem", "k_adi")
    r_crit = pin.get_real("problem", "r_crit")
    n_adi = 1.0 / (gamma - 1.0)

    u_crit_sq = 1.0 / (2.0 * r_crit)
    u_crit = -np.sqrt(u_crit_sq)
    t_crit = (n_adi / (n_adi + 1.0) * u_crit_sq
              / (1.0 - (n_adi + 3.0) * u_crit_sq))
    c1 = t_crit ** n_adi * u_crit * r_crit ** 2
    c2 = ((1.0 + (n_adi + 1.0) * t_crit) ** 2
          * (1.0 - 3.0 / (2.0 * r_crit)))

    mbi = mesh.mb_indcs
    nmb = mesh.nmb_total
    shape = (nmb, mbi.ncells3, mbi.ncells2, mbi.ncells1)
    x = np.empty(shape)
    y = np.empty(shape)
    z = np.empty(shape)
    for gid in range(nmb):
        x1v, x2v, x3v = mesh.cell_centers(gid)
        x[gid] = x1v[None, None, :]
        y[gid] = x2v[None, :, None]
        z[gid] = x3v[:, None, None]

    # Boyer-Lindquist radius (floored at 1, gr_bondi.cpp:314-325)
    rad2 = x * x + y * y + z * z
    a = spin
    r = np.maximum(np.sqrt((rad2 - a * a
                            + np.sqrt((rad2 - a * a) ** 2
                                      + 4 * a * a * z * z)) / 2.0), 1.0)

    lesser, greater = _temperature(r, n_adi, c1, c2)
    temp = np.where(r <= r_crit, lesser, greater)
    rho = (temp / k_adi) ** n_adi
    pgas = temp * rho
    ur = c1 / (r ** 2 * temp ** n_adi)  # BL radial 4-velocity (HSW 75)

    # transform u^r (BL) to CKS spatial 4-velocity (gr_bondi.cpp:337-355)
    delta = r * r - 2.0 * r + a * a
    u1 = ur * ((r * x + a * y) / (r * r + a * a) - y * a / delta)
    u2 = ur * ((r * y - a * x) / (r * r + a * a) + x * a / delta)
    u3 = ur * z / r

    # normal-observer utilde^i from u^i (gr_bondi.cpp:278-293)
    from ..gr.cks import metric as cks_metric
    gl, gu = cks_metric(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), a)
    gl = [[np.asarray(c) if hasattr(c, "shape") else c for c in row]
          for row in gl]
    gu = [[np.asarray(c) if hasattr(c, "shape") else c for c in row]
          for row in gu]
    tmp = (gl[1][1] * u1 * u1 + 2 * gl[1][2] * u1 * u2
           + 2 * gl[1][3] * u1 * u3 + gl[2][2] * u2 * u2
           + 2 * gl[2][3] * u2 * u3 + gl[3][3] * u3 * u3)
    gammasq = 1.0 + tmp
    b = gl[0][1] * u1 + gl[0][2] * u2 + gl[0][3] * u3
    u0 = (-b - np.sqrt(np.maximum(b * b - gl[0][0] * gammasq, 0.0))) \
        / gl[0][0]
    uu1 = u1 - gu[0][1] / gu[0][0] * u0
    uu2 = u2 - gu[0][2] / gu[0][0] * u0
    uu3 = u3 - gu[0][3] / gu[0][0] * u0

    inside = r <= 1.0
    rho = np.where(inside, dexcise, rho)
    pgas = np.where(inside, pexcise, pgas)
    uu1 = np.where(inside, 0.0, uu1)
    uu2 = np.where(inside, 0.0, uu2)
    uu3 = np.where(inside, 0.0, uu3)
    return rho, pgas, uu1, uu2, uu3


def _build_w(mesh, phys, pin):
    cd = phys.coord.coord_data
    rho, pgas, uu1, uu2, uu3 = _analytic_prims(
        mesh, pin, phys.eos.gamma, cd.bh_spin, cd.dexcise, cd.pexcise)
    gm1 = phys.eos.gamma - 1.0
    mbi = mesh.mb_indcs
    w = np.zeros((mesh.nmb_total, phys.nvar,
                  mbi.ncells3, mbi.ncells2, mbi.ncells1))
    w[:, IDN] = rho
    w[:, IEN] = pgas / gm1
    w[:, IM1] = uu1
    w[:, IM2] = uu2
    w[:, IM3] = uu3
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return jnp.asarray(w, dtype=dtype)


def _ghost_mask(mesh):
    """[nmb,1,n3,n2,n1] bool: ghost slabs on user/physical boundaries."""
    mbi = mesh.mb_indcs
    ng = mbi.ng
    shape = (mesh.nmb_total, 1, mbi.ncells3, mbi.ncells2, mbi.ncells1)
    mask = np.zeros(shape, dtype=bool)
    full = slice(None)
    slabs = {
        "x1m": (full, full, slice(0, ng)),
        "x1p": (full, full, slice(mbi.ncells1 - ng, None)),
        "x2m": (full, slice(0, ng), full),
        "x2p": (full, slice(mbi.ncells2 - ng, None), full),
        "x3m": (slice(0, ng), full, full),
        "x3p": (slice(mbi.ncells3 - ng, None), full, full),
    }
    active = {"x1m", "x1p"}
    if mbi.nx2 > 1:
        active |= {"x2m", "x2p"}
    if mbi.nx3 > 1:
        active |= {"x3m", "x3p"}
    for key in active:
        blocks = np.where(mesh.phys_bc_mask[key])[0]
        sl = slabs[key]
        for gid in blocks:
            mask[(gid, 0) + sl] = True
    return mask


def init(pin, mesh, phys):
    if not getattr(phys, "is_gr", False):
        raise ValueError("gr_bondi requires <coord>/general_rel = true")
    wj = _build_w(mesh, phys, pin)

    if getattr(phys, "is_mhd", False):
        # unmagnetized Bondi in the GRMHD solver (zero field,
        # reference: gr_bondi.cpp:195-213)
        dtype = wj.dtype
        bfc = {k: jnp.zeros(s, dtype=dtype)
               for k, s in phys.fc_shapes.items()}
        bcc = phys.compute_bcc(bfc)
        u = phys.prim_to_cons(wj, bcc)
    else:
        u = phys.prim_to_cons(wj)

    # fixed-inflow user BC: ghost zones on physical boundaries held at the
    # analytic conserved state (reference: FixedBondiInflow).  The
    # closures are kept as host arrays and localized per device so the
    # hook also runs inside the shard_map cycle (comm.local_blocks).
    import numpy as _hostnp

    mask_np = _hostnp.asarray(_ghost_mask(mesh))
    u_fixed_np = _hostnp.asarray(u)

    def bondi_bc(uu, bv):
        from ..comm import local_blocks
        m = jnp.asarray(local_blocks(mask_np))
        uf = jnp.asarray(local_blocks(u_fixed_np, pad_edge=True))
        return jnp.where(m, uf, uu)

    bondi_bc.shard_safe = True
    phys.bvals.user_bc_func = bondi_bc
    if getattr(phys, "is_mhd", False):
        return phys.make_state(u, wj, bfc)
    return phys.make_state(u, wj)


def final(pin, mesh, phys, state):
    """L1 deviation from the analytic (stationary) solution."""
    wj = _build_w(mesh, phys, pin)
    if getattr(phys, "is_mhd", False):
        u_ref = phys.prim_to_cons(wj, state["bcc"] * 0.0)
        nvars = phys.nmhd
    else:
        u_ref = phys.prim_to_cons(wj)
        nvars = phys.nhydro
    l1, linf = err_mod.compute_errors(mesh, state["u"], u_ref, nvars)
    fname = err_mod.write_error_file(
        pin, mesh, l1, linf, ["d", "M1", "M2", "M3", "E"][:nvars])
    print(f"errors written to {fname}")
