"""Radiation transport: frequency-integrated intensities on the geodesic
angular grid.

Parity target: the reference ``Radiation`` module
(reference: src/radiation/radiation.hpp:31-137, radiation_fluxes.cpp,
radiation_source.cpp) which evolves i0(m, angle, k, j, i).  Round-1 scope
is the flat-spacetime (Minkowski) limit: explicit upwind spatial
transport at light speed along each geodesic-grid direction plus
absorption/scattering relaxation sources; the GR tetrad/angular-flux
machinery (radiation_tetrad.cpp) is the planned next layer.

TPU-native: the angle axis is a channel axis [nmb, nangles, n3, n2, n1];
per-direction upwind fluxes vectorize over all angles at once (the
reference's per-angle par_for collapses into one fused kernel).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .geodesic_grid import GeodesicGrid

_HUGE = float(np.finfo(np.float32).max)


class Radiation:
    is_mhd = False

    def __init__(self, pin, mesh, bvals) -> None:
        self.mesh = mesh
        self.bvals = bvals
        nlevel = pin.get_or_add_integer("radiation", "nlevel", 2)
        if getattr(mesh, "multilevel", False):
            raise NotImplementedError(
                "radiation with static mesh refinement is not supported yet")
        self.grid = GeodesicGrid(nlevel)
        self.nvar = self.grid.nangles
        # opacities (gray, constant; reference supports Rosseland/Planck
        # power laws, radiation.hpp:96-107)
        self.kappa_a = pin.get_or_add_real("radiation", "kappa_a", 0.0)
        self.kappa_s = pin.get_or_add_real("radiation", "kappa_s", 0.0)
        self.arad = pin.get_or_add_real("radiation", "arad", 1.0)

        mbi = mesh.mb_indcs
        self.shape = (mesh.nmb_total, self.nvar,
                      mbi.ncells3, mbi.ncells2, mbi.ncells1)
        self.dirs = [("x1", 4, 0, mesh.mesh_size.dx1)]
        if mbi.nx2 > 1:
            self.dirs.append(("x2", 3, 1, mesh.mesh_size.dx2))
        if mbi.nx3 > 1:
            self.dirs.append(("x3", 2, 2, mesh.mesh_size.dx3))
        # n-hat components per angle as [1, nangles, 1, 1, 1] constants
        self.n_comp = [self.grid.nh[:, d].reshape(1, -1, 1, 1, 1)
                       for d in range(3)]
        self.wgt = self.grid.weights.reshape(1, -1, 1, 1, 1)
        self.time_evolution = "dynamic"
        self.pturb = None
        self.ppart = None
        self.psbox = None
        self.eos = None
        self.srcterms_func = None

    # ------------------------------------------------------------------
    def fluxes(self, i0):
        """Upwind (donor + PLM) transport fluxes at light speed:
        F_d = n_d * I_upwind per angle (reference: radiation_fluxes.cpp)."""
        out = {}
        for name, axis, d, _dx in self.dirs:
            n_d = self.n_comp[d]
            im1 = jnp.roll(i0, 1, axis=axis)
            ip1 = jnp.roll(i0, -1, axis=axis)
            # PLM limited slopes for 2nd order
            dql = i0 - im1
            dqr = ip1 - i0
            dq2 = dql * dqr
            dqm = jnp.where(dq2 <= 0.0, 0.0, dq2 / (dql + dqr + 1e-300))
            il = jnp.roll(i0 + dqm, 1, axis=axis)   # left state at face i
            ir = i0 - dqm                            # right state at face i
            out[name] = jnp.where(n_d >= 0.0, n_d * il, n_d * ir)
        return out

    # ------------------------------------------------------------------
    def rk_update(self, i0, i1, flx, gam0, gam1, beta_dt):
        divf = None
        for name, axis, _d, dx in self.dirs:
            f = flx[name]
            d = (jnp.roll(f, -1, axis=axis) - f) / dx
            divf = d if divf is None else divf + d
        return gam0 * i0 + gam1 * i1 - beta_dt * divf

    # ------------------------------------------------------------------
    def source(self, i0, beta_dt):
        """Gray absorption + isotropizing scattering relaxation
        (reference: radiation_source.cpp implicit coupling; here the
        radiation-only limit with a fixed medium)."""
        if self.kappa_a == 0.0 and self.kappa_s == 0.0:
            return i0
        # mean intensity J = sum w I
        J = jnp.sum(self.wgt * i0, axis=1, keepdims=True)
        # implicit pointwise relaxation: dI/dt = -ka I - ks (I - J)
        ka, ks = self.kappa_a, self.kappa_s
        denom = 1.0 + beta_dt * (ka + ks)
        return (i0 + beta_dt * ks * J) / denom

    # ------------------------------------------------- state-dict interface
    def make_state(self, i0):
        return {"u": i0, "w": i0}

    def save_state(self, state):
        return {"u1": state["u"]}

    def accumulate_rk4(self, saved, state, delta):
        return {"u1": saved["u1"] + delta * state["u"]}

    def init_ghosts(self, state):
        i0 = self.bvals.fill_ghosts(state["u"])
        return dict(state, u=i0, w=i0)

    def cons_to_prim(self, u):
        return u, u, {}

    def stage_update(self, state, saved, gam0, gam1, beta_dt):
        i0 = state["u"]
        flx = self.fluxes(i0)
        i0 = self.rk_update(i0, saved["u1"], flx, gam0, gam1, beta_dt)
        i0 = self.source(i0, beta_dt)
        i0 = jnp.maximum(i0, 0.0)
        i0 = self.bvals.fill_ghosts(i0)
        if self.bvals.user_bc_func is not None:
            pass  # applied inside fill_ghosts
        return dict(state, u=i0, w=i0), {}

    def dt_from_state(self, state):
        """Light-speed CFL (reference: radiation_newdt.cpp)."""
        ms = self.mesh.mesh_size
        mbi = self.mesh.mb_indcs
        dt = ms.dx1
        if mbi.nx2 > 1:
            dt = min(dt, ms.dx2)
        if mbi.nx3 > 1:
            dt = min(dt, ms.dx3)
        return jnp.asarray(dt, dtype=state["u"].dtype)

    # moments for outputs/tests
    def moments(self, i0):
        """(E, F^i): energy density and flux (angular quadrature)."""
        E = jnp.sum(self.wgt * i0, axis=1)
        F = [jnp.sum(self.wgt * self.n_comp[d] * i0, axis=1)
             for d in range(3)]
        return E, F
