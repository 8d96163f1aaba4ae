"""Radiation: geodesic-grid quadrature, hohlraum light front, scattering
isotropization.

(reference: src/geodesic-grid/, src/radiation/; tst/test_suite/rad/)
"""

import math

import numpy as np

from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import run, build
from athenak_tpu.radiation.geodesic_grid import GeodesicGrid

DECK = """
<job>
basename = hohl

<mesh>
nghost = 2
nx1 = 64
x1min = 0.0
x1max = 1.0
ix1_bc = user
ox1_bc = outflow
nx2 = 4
x2min = 0.0
x2max = 1.0
nx3 = 4
x3min = 0.0
x3max = 1.0

<time>
evolution = dynamic
integrator = rk2
cfl_number = 0.4
tlim = 0.5

<radiation>
nlevel = 2
{opac}

<problem>
pgen_name = rad_hohlraum
i_beam = 1.0
"""


def test_geodesic_quadrature():
    """Angle quadrature integrates low-order moments exactly enough:
    sum w = 1, sum w n = 0, sum w n n = delta/3."""
    for nlev in (1, 2, 4):
        g = GeodesicGrid(nlev)
        assert g.nangles == 10 * nlev ** 2 + 2
        assert abs(g.weights.sum() - 1.0) < 1e-12
        m1 = (g.weights[:, None] * g.nh).sum(axis=0)
        assert np.abs(m1).max() < 1e-12
        m2 = np.einsum("a,ai,aj->ij", g.weights, g.nh, g.nh)
        assert np.abs(m2 - np.eye(3) / 3.0).max() < 2e-3


def test_hohlraum_light_front():
    """The radiation front crosses the box at light speed; behind the
    front E approaches the half-isotropic value sum_{nx>0} w."""
    pin = ParameterInput.from_string(DECK.format(opac=""))
    mesh, phys, driver, state = run(pin)
    mbi = mesh.mb_indcs
    E, F = phys.moments(state["u"])
    E = np.asarray(E)[0, mbi.ks + 1, mbi.js + 1, mbi.is_:mbi.ie + 1]
    x1v, _, _ = mesh.cell_centers(0)
    x = np.asarray(x1v)[mbi.is_:mbi.ie + 1]
    t = mesh.time
    # well behind the front: E ~ sum of w over nx>0 (beam fills half-space)
    wpos = phys.grid.weights[phys.grid.nh[:, 0] > 0].sum()
    behind = x < 0.5 * t
    ahead = x > 1.2 * t
    assert E[behind].mean() > 0.6 * wpos
    assert E[ahead].max() < 0.05 * wpos
    # leading edge: the fastest angles (n_x ~ 1) define a front at x = t
    # (the profile is graded since each angle's front moves at n_x c)
    lit = np.where(E > 0.01 * wpos)[0]
    xfront = x[lit[-1]]
    dx = x[1] - x[0]
    assert 0.8 * t < xfront <= t + 3 * dx, f"front at {xfront}, t={t}"


def test_scattering_isotropizes():
    """Pure relaxation (uniform field, no gradients): strong scattering
    drives I -> J exactly, conserving the mean intensity."""
    import jax.numpy as jnp
    deck = DECK.format(opac="kappa_s = 50.0")
    pin = ParameterInput.from_string(deck)
    mesh, phys, pgen, driver, state = build(pin)
    phys.bvals.user_bc_func = None  # uniform periodic-like relaxation
    # anisotropic but spatially uniform IC: I_a = 1 + n_x, stored in the
    # evolved variable i0 = n^0 n_0 I (negative-definite in flat space)
    nh = phys.grid.nh[:, 0].reshape(1, -1, 1, 1, 1)
    nn = np.asarray(phys.n0) * np.asarray(phys.n_0)
    i0 = jnp.asarray(nn * (1.0 + 0.9 * np.broadcast_to(nh, phys.shape)))
    state = dict(state, u=i0, w=i0)
    state = driver.initialize(state)
    saved = phys.save_state(state)
    s1, _ = phys.stage_update(state, saved, 0.0, 1.0, 0.5)
    out = np.asarray(s1["u"])[0, :, 3, 3, 10]
    J0 = float((phys.grid.weights * np.asarray(i0)[0, :, 3, 3, 10]).sum())
    J1 = float((phys.grid.weights * out).sum())
    # J conserved by scattering
    assert abs(J1 - J0) < 1e-10
    # anisotropy reduced by the implicit factor 1/(1+ks*dt) = 1/26
    aniso0 = 0.9
    aniso1 = (out.max() - out.min()) / 2.0
    assert aniso1 < 0.1 * aniso0
