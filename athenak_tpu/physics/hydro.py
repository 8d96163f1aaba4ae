"""Newtonian hydrodynamics module.

Parity target: the reference ``Hydro`` class and its task DAG
(reference: src/hydro/hydro.hpp:67-158, hydro_tasks.cpp:48-80,
hydro_fluxes.cpp, hydro_update.cpp, hydro_newdt.cpp).  The task list
(copyu -> flux -> rkupdate -> srcterms -> sendu/recvu -> bcs -> c2p -> newdt)
collapses into ``stage_update``, one pure function per RK stage that XLA
fuses and schedules.

State layout: conserved ``u`` and primitive ``w`` are
``[nmb, nvar, ncells3, ncells2, ncells1]`` (ghosts included), primitives
store internal energy in the IEN slot.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..bvals import BoundaryValues
from ..indices import IDN, IEN, IM1, IM2, IM3, IVX, IVY, IVZ, RECON_NGHOST
from ..mesh import Mesh
from ..ops import recon as recon_ops
from ..ops import rsolvers
from ..ops.eos import EOSData, cons_to_prim_hydro, prim_to_cons_hydro

_HUGE = float(jnp.finfo(jnp.float32).max)

# mesh axis -> array axis in [nmb, nvar, n3, n2, n1]
_ML_AXIS = {"x1": 4, "x2": 3, "x3": 2}


class Hydro:
    """Owns hydro configuration and provides the pure per-stage update."""

    def __init__(self, pin, mesh: Mesh, bvals: BoundaryValues) -> None:
        from ..coordinates import Coordinates
        self.mesh = mesh
        self.bvals = bvals
        self.coord = Coordinates(pin)
        self.eos = EOSData.from_input(pin, "hydro")
        self.is_sr = self.coord.is_special_relativistic
        self.is_gr = self.coord.is_general_relativistic
        if (self.is_sr or self.is_gr) and not self.eos.is_ideal:
            raise ValueError("relativistic hydro requires the ideal-gas EOS")
        self.nhydro = 5 if self.eos.is_ideal else 4
        self.nscalars = pin.get_or_add_integer("hydro", "nscalars", 0)
        self.nvar = self.nhydro + self.nscalars

        self.recon_method = pin.get_or_add_string("hydro", "reconstruct", "plm")
        if self.recon_method not in recon_ops.RECON_FNS:
            raise ValueError(f"hydro/reconstruct={self.recon_method} unknown")
        self.rsolver = pin.get_or_add_string("hydro", "rsolver", "llf")
        if self.is_sr:
            # SR runs map the generic solver names onto their SR variants
            # (reference: src/hydro/hydro.cpp:207-230)
            from ..ops.rsolvers_sr import SR_HYDRO_RSOLVER_FNS
            if self.rsolver not in SR_HYDRO_RSOLVER_FNS:
                raise ValueError(
                    f"hydro/rsolver={self.rsolver} not available in SR")
            self._rsolver_fns = SR_HYDRO_RSOLVER_FNS
        elif self.is_gr:
            from ..ops.rsolvers_gr import GR_HYDRO_RSOLVER_FNS
            if self.rsolver not in GR_HYDRO_RSOLVER_FNS:
                raise ValueError(
                    f"hydro/rsolver={self.rsolver} not available in GR")
            self._rsolver_fns = GR_HYDRO_RSOLVER_FNS
        else:
            if self.rsolver not in rsolvers.HYDRO_RSOLVER_FNS:
                raise ValueError(f"hydro/rsolver={self.rsolver} unknown")
            self._rsolver_fns = rsolvers.HYDRO_RSOLVER_FNS

        ng_need = RECON_NGHOST[self.recon_method]
        if mesh.mb_indcs.ng < ng_need:
            raise ValueError(
                f"reconstruct={self.recon_method} requires nghost >= {ng_need}"
                f" but mesh/nghost={mesh.mb_indcs.ng}")

        mbi = mesh.mb_indcs
        self.shape = (mesh.nmb_total, self.nvar,
                      mbi.ncells3, mbi.ncells2, mbi.ncells1)
        # axis -> (array axis, ivx, dx); dx is scalar on uniform meshes,
        # per-block broadcastable [nmb,1,1,1,1] on multilevel meshes
        self.multilevel = bool(getattr(mesh, "multilevel", False))
        if self.multilevel:
            bvals.prolong_prims = pin.get_or_add_boolean(
                "mesh_refinement", "prolong_primitives", False)

        def _dx(name):
            if self.multilevel:
                return mesh.mb_size[f"d{name}"].reshape(-1, 1, 1, 1, 1)
            return getattr(mesh.mesh_size, f"d{name}")

        self.dirs = [("x1", 4, IVX, _dx("x1"))]
        if mbi.nx2 > 1:
            self.dirs.append(("x2", 3, IVY, _dx("x2")))
        if mbi.nx3 > 1:
            self.dirs.append(("x3", 2, IVZ, _dx("x3")))

        # evolution type: "dynamic" | "kinematic" | "static"
        self.time_evolution = pin.get_string("time", "evolution") \
            if pin.does_block_exist("time") else "dynamic"

        if self.is_gr:
            from ..coordinates import GRGeometry
            self.geom = GRGeometry(mesh, self.coord.coord_data)
            cd = self.coord.coord_data
            if cd.bh_excise:
                import numpy as _np
                mask = self.geom.excision_floor_mask()
                self.excise_mask = _np.broadcast_to(
                    mask, (mesh.nmb_total, mesh.mb_indcs.ncells3,
                           mesh.mb_indcs.ncells2, mesh.mb_indcs.ncells1)
                ).copy()
            else:
                self.excise_mask = None
        else:
            self.geom = None
            self.excise_mask = None

        # diffusion (constructed only if coefficients present,
        # reference: src/hydro/hydro.cpp:77-96)
        from ..diffusion import Conduction, Viscosity
        self.pvisc = Viscosity("hydro", pin, mesh, self.eos) \
            if (pin.does_parameter_exist("hydro", "nu_iso")
                or pin.does_parameter_exist("hydro", "nu_aniso")) else None
        self.pcond = Conduction("hydro", pin, mesh, self.eos) \
            if (pin.does_parameter_exist("hydro", "alpha_iso")
                or pin.does_parameter_exist("hydro", "alpha_aniso")
                or pin.does_parameter_exist("hydro", "alpha_spitzer")) \
            else None

        # physics source terms from the <hydro_srcterms> block
        # (reference: src/srcterms/srcterms.cpp:37-80)
        from ..srcterms import SourceTerms
        self.srcterms = SourceTerms("hydro_srcterms", pin, mesh, self.eos) \
            if pin.does_block_exist("hydro_srcterms") else None

        # first-order flux correction (reference: src/hydro/hydro_fofc.cpp)
        self.use_fofc = pin.get_or_add_boolean("hydro", "fofc", False)
        self.fofc_excise_mask = None
        if self.is_gr and self.coord.coord_data.bh_excise:
            # flux-excision: cells whose surroundings touch r_ks <= r_fe
            # (reference: SetExcisionMasks excision_flux, excision.cpp:96+)
            import numpy as _np
            r_fe = 1.0
            r = self.geom.ks_radius_cc()
            rb = _np.broadcast_to(
                r, (mesh.nmb_total, mesh.mb_indcs.ncells3,
                    mesh.mb_indcs.ncells2, mesh.mb_indcs.ncells1)).copy()
            near = rb <= r_fe
            # flag cell if it or any face neighbor is inside r_fe
            m = near.copy()
            for ax in (1, 2, 3):
                m |= _np.roll(near, 1, axis=ax) | _np.roll(near, -1, axis=ax)
            self.fofc_excise_mask = m

        # turbulence driving (reference: src/srcterms/turb_driver.cpp)
        from ..turb_driver import TurbulenceDriver
        self.pturb = TurbulenceDriver(pin, mesh) \
            if pin.does_block_exist("turb_driving") else None

        # test particles (reference: src/particles/)
        from ..particles import Particles
        self.ppart = Particles(pin, mesh) \
            if pin.does_block_exist("particles") else None

        # self-gravity (reference: src/gravity/ + src/multigrid/; FFT
        # Poisson on uniform periodic meshes, SURVEY.md section 7 step 8)
        from ..gravity import make_gravity
        self.pgrav = make_gravity(pin, mesh) \
            if pin.does_block_exist("gravity") else None

        # shearing box + orbital advection (reference: src/shearing_box/)
        from ..shearing_box import ShearingBox
        self.psbox = ShearingBox(pin, mesh, self.nvar) \
            if pin.does_block_exist("shearing_box") else None

        # optional extra source-term hook: fn(u, w, beta_dt) -> u
        self.srcterms_func = None

        if self.multilevel:
            from ..multigrid import MGPoisson
            # diffusion operators take per-block dx (diffusion._dx_tab)
            # and their fluxes ride the SMR flux correction, so they
            # compose with refined meshes like the reference's
            blockers = {
                        # multigrid gravity handles refined meshes; the
                        # FFT fast path does not
                        # shearing box composes via per-level ring
                        # tables (shearing_box._check_zslab)
                        "self-gravity (fft)": self.pgrav
                        if not isinstance(self.pgrav, MGPoisson)
                        else None}
            for what, on in blockers.items():
                if on is not None and on is not False:
                    raise NotImplementedError(
                        f"{what} with static mesh refinement is not "
                        "supported yet")

    # ------------------------------------------------------------- allocate
    def allocate(self, dtype):
        u = jnp.zeros(self.shape, dtype=dtype)
        w = jnp.zeros(self.shape, dtype=dtype)
        return u, w

    # ----------------------------------------------------------------- c2p
    def cons_to_prim(self, u):
        if self.is_gr:
            from ..ops.eos_gr import cons_to_prim_gr_hydro
            gl, gu = self.geom.metric("cc")
            cd = self.coord.coord_data
            from ..comm import local_blocks
            return cons_to_prim_gr_hydro(
                u, self.eos, gl, gu,
                excise_mask=local_blocks(self.excise_mask),
                dexcise=cd.dexcise, pexcise=cd.pexcise)
        if self.is_sr:
            from ..ops.eos_sr import cons_to_prim_sr_hydro
            return cons_to_prim_sr_hydro(u, self.eos)
        return cons_to_prim_hydro(u, self.eos)

    def prim_to_cons(self, w):
        if self.is_gr:
            from ..ops.eos_gr import prim_to_cons_gr_hydro
            gl, gu = self.geom.metric("cc")
            return prim_to_cons_gr_hydro(w, self.eos, gl, gu)
        if self.is_sr:
            from ..ops.eos_sr import prim_to_cons_sr_hydro
            return prim_to_cons_sr_hydro(w, self.eos)
        return prim_to_cons_hydro(w, self.eos)

    # --------------------------------------------------------------- fluxes
    def fluxes(self, w):
        """Reconstruct + Riemann-solve in each active direction.

        Face convention: flux arrays are cell-shaped; entry i holds the flux
        through face i (the lower face of cell i), matching the reference
        uflx layout (reference: src/hydro/hydro_fluxes.cpp:78-120).
        """
        rec = recon_ops.RECON_FNS[self.recon_method]
        solve = self._rsolver_fns[self.rsolver]
        floors = self.recon_method in recon_ops.FLOORED_METHODS

        out = {}
        for name, axis, ivx, _dx in self.dirs:
            wl, wr = rec(w, axis)
            if floors:
                wl = wl.at[:, IDN].max(self.eos.dfloor)
                wr = wr.at[:, IDN].max(self.eos.dfloor)
                if self.eos.is_ideal:
                    efloor = self.eos.pfloor / (self.eos.gamma - 1.0)
                    wl = wl.at[:, IEN].max(efloor)
                    wr = wr.at[:, IEN].max(efloor)
            if self.is_gr:
                gl, gu = self.geom.metric(name)
                f = solve(wl, wr, self.eos, ivx, gl, gu)
            else:
                f = solve(wl, wr, self.eos, ivx)
            if self.nscalars > 0:
                # passive scalars: upwind advection on the mass flux
                # (reference: scalar flux blocks in each rsolver, e.g.
                # src/hydro/rsolvers/hllc_hyd.hpp end)
                fd = f[:, IDN:IDN + 1]
                ns = self.nhydro
                fs = jnp.where(fd >= 0.0, fd * wl[:, ns:], fd * wr[:, ns:])
                f = f.at[:, ns:].set(fs)
            out[name] = f
        if self.pvisc is not None:
            out = self.pvisc.add_viscous_flux(w, out, self.dirs)
        if self.pcond is not None:
            out = self.pcond.add_heat_flux(w, out, self.dirs)
        return out

    # ------------------------------------------------------ flux correction
    def _flux_correct(self, flx):
        """Conservative SMR flux correction (reference:
        src/bvals/flux_correction_cc.cpp); shared with MHD."""
        from ..refinement import flux_correct_cc
        return flux_correct_cc(flx, self.mesh, [d[0] for d in self.dirs])

    # --------------------------------------------------------------- update
    def rk_update(self, u0, u1, flx, gam0: float, gam1: float, beta_dt):
        """u0 <- gam0*u0 + gam1*u1 - beta*dt*divF
        (reference: src/hydro/hydro_update.cpp:52-80).  Computed over the
        whole array; ghost zones are refilled immediately after."""
        from ..comm import local_blocks
        divf = None
        for name, axis, _ivx, dx in self.dirs:
            f = flx[name]
            d = (jnp.roll(f, -1, axis=axis) - f) / local_blocks(
                dx, pad_edge=True)
            divf = d if divf is None else divf + d
        return gam0 * u0 + gam1 * u1 - beta_dt * divf

    # ----------------------------------------------------------------- FOFC
    def _apply_fofc(self, u, u1, w, flx, gam0, gam1, beta_dt):
        """First-order flux correction: estimate the update, flag cells
        whose c2p would floor/fail, and replace the fluxes on their faces
        with first-order LLF fluxes (reference: Hydro::FOFC,
        src/hydro/hydro_fofc.cpp:30-200).  Returns (flx, nfofc)."""
        flag = None
        if self.use_fofc:
            utest = self.rk_update(u, u1, flx, gam0, gam1, beta_dt)
            _, u_fixed, _ = self.cons_to_prim(utest)
            flag = jnp.any(u_fixed != utest, axis=1)
        if self.fofc_excise_mask is not None:
            from ..comm import local_blocks
            em = jnp.asarray(local_blocks(self.fofc_excise_mask))
            flag = em if flag is None else (flag | em)
        if flag is None:
            return flx, jnp.asarray(0)

        # first-order (donor-cell) LLF fluxes from cell-centered primitives
        if self.is_gr:
            from ..ops.rsolvers_gr import llf_gr as first_order
        elif self.is_sr:
            from ..ops.rsolvers_sr import llf_sr as first_order
        else:
            from ..ops.rsolvers import llf as first_order
        out = dict(flx)
        for name, axis, ivx, _dx in self.dirs:
            wl = jnp.roll(w, 1, axis=axis)  # cell i-1 at face i
            wr = w
            if self.is_gr:
                gl, gu = self.geom.metric(name)
                f1 = first_order(wl, wr, self.eos, ivx, gl, gu)
            else:
                f1 = first_order(wl, wr, self.eos, ivx)
            if self.nscalars > 0:
                fd = f1[:, IDN:IDN + 1]
                ns = self.nhydro
                fs = jnp.where(fd >= 0.0, fd * wl[:, ns:], fd * wr[:, ns:])
                f1 = f1.at[:, ns:].set(fs)
            # face i is corrected if cell i-1 or cell i is flagged
            fmask = (flag | jnp.roll(flag, 1, axis=axis - 1))[:, None]
            out[name] = jnp.where(fmask, f1, out[name])
        return out, jnp.sum(flag)

    # --------------------------------------------------------- GR srcterms
    def coord_src_terms(self, u, w, beta_dt):
        """Geometric source terms S_i = 1/2 T^{ab} d_i(g_ab) on the
        momenta (reference: Coordinates::CoordSrcTerms,
        src/coordinates/coordinates.cpp:122-233)."""
        gl, gu = self.geom.metric("cc")
        dgs = self.geom.metric_derivatives()
        gp = self.eos.gamma / (self.eos.gamma - 1.0)

        rho = w[:, IDN]
        p = self.eos.pressure(w[:, IEN])
        wvx, wvy, wvz = w[:, IVX], w[:, IVY], w[:, IVZ]
        q = (gl[1][1] * wvx * wvx + gl[2][2] * wvy * wvy
             + gl[3][3] * wvz * wvz
             + 2.0 * (gl[1][2] * wvx * wvy + gl[1][3] * wvx * wvz
                      + gl[2][3] * wvy * wvz))
        alpha = jnp.sqrt(-1.0 / gu[0][0])
        gam = jnp.sqrt(1.0 + q)
        uv = {0: gam / alpha,
              1: wvx - alpha * gam * gu[0][1],
              2: wvy - alpha * gam * gu[0][2],
              3: wvz - alpha * gam * gu[0][3]}
        wtot = rho + gp * p

        for d, im in ((0, IM1), (1, IM2), (2, IM3)):
            dg = dgs[d]
            s = None
            for mu in range(4):
                for nu in range(mu, 4):
                    fac = 0.5 if mu == nu else 1.0
                    tt = wtot * uv[mu] * uv[nu] + p * gu[mu][nu]
                    term = fac * dg[mu][nu] * tt
                    s = term if s is None else s + term
            u = u.at[:, im].add(beta_dt * s)
        return u

    # ---------------------------------------------------------------- newdt
    def new_dt(self, w):
        """min over active zones of dx / max signal speed per direction
        (reference: src/hydro/hydro_newdt.cpp:57-119).  Returns the module
        dtnew (cfl factor applied by the driver)."""
        mbi = self.mesh.mb_indcs
        sl = (slice(None), slice(None),
              slice(mbi.ks, mbi.ke + 1),
              slice(mbi.js, mbi.je + 1),
              slice(mbi.is_, mbi.ie + 1))
        wa = w[sl]
        vx = wa[:, IVX]
        vy = wa[:, IVY]
        vz = wa[:, IVZ]
        if self.time_evolution == "kinematic":
            dv1 = jnp.abs(vx)
            dv2 = jnp.abs(vy)
            dv3 = jnp.abs(vz)
        elif self.is_gr:
            # light speed bounds all signals (reference: hydro_newdt.cpp:85-88)
            one = jnp.ones_like(vx)
            dv1 = dv2 = dv3 = one
        elif self.is_sr:
            from ..ops.eos_sr import sr_hydro_sound_speeds
            lor = jnp.sqrt(1.0 + vx * vx + vy * vy + vz * vz)
            p = self.eos.pressure(wa[:, IEN])
            d = wa[:, IDN]
            lp1, lm1 = sr_hydro_sound_speeds(self.eos, d, p, vx, lor)
            lp2, lm2 = sr_hydro_sound_speeds(self.eos, d, p, vy, lor)
            lp3, lm3 = sr_hydro_sound_speeds(self.eos, d, p, vz, lor)
            dv1 = jnp.maximum(jnp.abs(lm1), lp1)
            dv2 = jnp.maximum(jnp.abs(lm2), lp2)
            dv3 = jnp.maximum(jnp.abs(lm3), lp3)
        else:
            if self.eos.is_ideal:
                p = self.eos.pressure(wa[:, IEN])
                cs = self.eos.hydro_sound_speed(wa[:, IDN], p)
            else:
                cs = self.eos.iso_cs
            dv1 = jnp.abs(vx) + cs
            dv2 = jnp.abs(vy) + cs
            dv3 = jnp.abs(vz) + cs

        ms = self.mesh.mesh_size
        if self.multilevel:
            from ..comm import local_blocks
            dx1 = local_blocks(self.mesh.mb_size["dx1"],
                               pad_edge=True).reshape(-1, 1, 1, 1)
            dx2 = local_blocks(self.mesh.mb_size["dx2"],
                               pad_edge=True).reshape(-1, 1, 1, 1)
            dx3 = local_blocks(self.mesh.mb_size["dx3"],
                               pad_edge=True).reshape(-1, 1, 1, 1)
        else:
            dx1, dx2, dx3 = ms.dx1, ms.dx2, ms.dx3
        dt = jnp.min(dx1 / jnp.maximum(dv1, 1e-300))
        if mbi.nx2 > 1:
            dt = jnp.minimum(dt, jnp.min(dx2 / jnp.maximum(dv2, 1e-300)))
        if mbi.nx3 > 1:
            dt = jnp.minimum(dt, jnp.min(dx3 / jnp.maximum(dv3, 1e-300)))
        return dt

    # ------------------------------------------------- state-dict interface
    is_mhd = False

    def make_state(self, u, w):
        state = {"u": u, "w": w}
        if self.pturb is not None:
            state.update(self.pturb.init_state_entries(u.dtype))
        if self.ppart is not None:
            state.update(self.ppart.init_state_entries(u.dtype))
        if self.psbox is not None:
            state["t"] = jnp.asarray(0.0, dtype=u.dtype)
        from ..multigrid import MGPoisson
        if isinstance(self.pgrav, MGPoisson):
            # warm-start carrier for the per-stage multigrid solve
            state["phi"] = jnp.zeros((u.shape[0], 1) + u.shape[2:],
                                     dtype=u.dtype)
        return state

    def save_state(self, state):
        return {"u1": state["u"]}

    def accumulate_rk4(self, saved, state, delta):
        return {"u1": saved["u1"] + delta * state["u"]}

    def init_ghosts(self, state):
        u = self.bvals.fill_ghosts(state["u"])
        w, u, _ = self.cons_to_prim(u)
        if self.bvals.prolong_prims:
            u, w = self.bvals.prolong_prims_fixup(u, w,
                                                  self.prim_to_cons)
        out = dict(state)
        out.update({"u": u, "w": w})
        return out

    def stage_update(self, state, saved, gam0, gam1, beta_dt):
        """One full RK stage: flux -> update -> srcterms -> halo -> c2p
        (reference task chain hydro_tasks.cpp:54-70)."""
        u, w = state["u"], state["w"]
        flx = self.fluxes(w)
        nfofc = None
        if self.use_fofc or self.fofc_excise_mask is not None:
            flx, nfofc = self._apply_fofc(u, saved["u1"], w, flx,
                                          gam0, gam1, beta_dt)
        if self.multilevel:
            flx = self._flux_correct(flx)
        # gravity is solved from the pre-update state: the reference runs
        # MGGravityDriver::Solve before the stagen task list
        # (reference: driver.cpp:406-408); multigrid warm-starts from the
        # previous stage's potential carried in state["phi"]
        phi = None
        if self.pgrav is not None:
            phi = self.pgrav.solve(u, self.bvals,
                                   phi0=state.get("phi"))
        u = self.rk_update(u, saved["u1"], flx, gam0, gam1, beta_dt)
        if self.is_gr:
            u = self.coord_src_terms(u, w, beta_dt)
        if self.srcterms is not None and self.srcterms.any_enabled:
            u = self.srcterms.apply(u, w, beta_dt, flx=flx, phi=phi)
        if self.psbox is not None:
            u = self.psbox.src_terms(u, w, beta_dt, self.eos.is_ideal,
                                     len(self.dirs) == 3)
        if self.srcterms_func is not None:
            kw = {}
            if getattr(self.srcterms_func, "needs_time", False):
                kw["t"] = state.get("t")
            u = self.srcterms_func(u, w, beta_dt, **kw)
        u = self.bvals.fill_ghosts(u)
        if self.psbox is not None:
            u = self.psbox.remap_ghosts(u, state["t"])
        w, u, counters = self.cons_to_prim(u)
        if self.bvals.prolong_prims:
            u, w = self.bvals.prolong_prims_fixup(u, w,
                                                  self.prim_to_cons)
        if nfofc is not None:
            counters = dict(counters, nfofc=nfofc)
        out = dict(state)
        out.update({"u": u, "w": w})
        if phi is not None and "phi" in state:
            out["phi"] = phi
        return out, counters

    def dt_from_state(self, state):
        dt = self.new_dt(state["w"])
        ndim = len(self.dirs)
        dtype = state["w"].dtype
        if self.pvisc is not None:
            dt = jnp.minimum(dt, self.pvisc.new_dt(ndim, dtype))
        if self.pcond is not None:
            dt = jnp.minimum(dt, self.pcond.new_dt(ndim, dtype))
        if self.srcterms is not None and self.srcterms.any_enabled:
            dt = jnp.minimum(dt, self.srcterms.new_dt(state["w"]))
        if self.ppart is not None:
            dt = jnp.minimum(dt, jnp.asarray(self.ppart.new_dt(),
                                             dtype=dtype))
        return dt
