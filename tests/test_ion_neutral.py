"""Ion-neutral coupling: drag relaxation against the analytic solution.

Uniform ion and neutral fluids with a velocity offset relax to the common
center-of-momentum velocity at rate gamma_d (rho_i + rho_n); total
momentum is conserved exactly.  Exercises the ImEx-SSP integrators and
the analytic implicit drag solve (reference: ion-neutral_tasks.cpp,
driver.cpp imex tables; physical setup akin to the C-shock suite
tst/test_suite/ion-neutral/).
"""

import math

import numpy as np
import pytest

from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import run
from athenak_tpu.indices import IDN, IVX

DECK = """
<job>
basename = inrelax

<mesh>
nghost = 2
nx1 = 16
x1min = 0.0
x1max = 1.0
nx2 = 1
x2min = 0.0
x2max = 1.0
nx3 = 1
x3min = 0.0
x3max = 1.0

<time>
evolution = dynamic
integrator = {integ}
cfl_number = 0.3
tlim = {tlim}

<hydro>
eos = ideal
gamma = 1.6666666666666667
reconstruct = plm
rsolver = hllc

<mhd>
eos = ideal
gamma = 1.6666666666666667
reconstruct = plm
rsolver = hlle

<ion-neutral>
drag_coeff = {drag}

<problem>
pgen_name = twofluid
d_i = 0.4
d_n = 1.2
p_i = 0.6
p_n = 0.6
vx_i = 0.1
vx_n = -0.1
b0 = 0.5
"""


@pytest.mark.parametrize("integ", ["imex2", "imex3"])
def test_drag_relaxation(integ):
    drag = 4.0
    tlim = 0.4
    pin = ParameterInput.from_string(
        DECK.format(integ=integ, drag=drag, tlim=tlim))
    mesh, phys, driver, state = run(pin)
    mbi = mesh.mb_indcs
    act = (slice(None), slice(mbi.ks, mbi.ke + 1),
           slice(mbi.js, mbi.je + 1), slice(mbi.is_, mbi.ie + 1))

    ui = np.asarray(state["ui"])
    un = np.asarray(state["u"])
    di, dn = 0.4, 1.2
    vi = (ui[:, 1][act] / ui[:, IDN][act]).mean()
    vn = (un[:, 1][act] / un[:, IDN][act]).mean()

    # exact: dv(t) = dv0 exp(-gamma (di+dn) t), momentum conserved
    dv0 = 0.2
    dv = dv0 * math.exp(-drag * (di + dn) * mesh.time)
    vcom = (di * 0.1 + dn * (-0.1)) / (di + dn)
    assert abs((vi - vn) - dv) < 0.03 * dv0
    ptot = (ui[:, 1][act].mean() + un[:, 1][act].mean())
    assert abs(ptot - (di * 0.1 + dn * (-0.1))) < 1e-12
    assert abs(vi - (vcom + dn / (di + dn) * dv)) < 0.03 * dv0


def test_stiff_drag_stable():
    """Hugely stiff drag (gamma dt >> 1): the implicit solve must
    equilibrate immediately and stay stable."""
    pin = ParameterInput.from_string(
        DECK.format(integ="imex2", drag=1.0e6, tlim=0.05))
    mesh, phys, driver, state = run(pin)
    ui = np.asarray(state["ui"])
    un = np.asarray(state["u"])
    assert np.isfinite(ui).all() and np.isfinite(un).all()
    vi = ui[:, 1] / ui[:, IDN]
    vn = un[:, 1] / un[:, IDN]
    vcom = (0.4 * 0.1 + 1.2 * (-0.1)) / 1.6
    # ImEx-SSP2 damps the stiff mode geometrically per step (it is not
    # exactly L-stable at z -> -inf), so expect strong but not machine-
    # level equilibration; the key property is unconditional stability
    np.testing.assert_allclose(vi, vcom, atol=0.05 * 0.2)
    np.testing.assert_allclose(vn, vcom, atol=0.05 * 0.2)
    # total momentum exact
    ptot = ui[:, 1].mean() + un[:, 1].mean()
    assert abs(ptot - (0.4 * 0.1 + 1.2 * (-0.1))) < 1e-12
