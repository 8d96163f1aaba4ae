"""Parity of the fused Pallas Z4c stage vs the whole-array jnp path.

fused_z4c_stage (ops/pallas_z4c.py) is the production Z4c stage on TPU;
the CPU suite runs it in Pallas interpret mode and compares interior
cells against rhs -> RK combine -> alg_constr from the jnp path (same
rhs_core physics, so agreement is to roundoff from re-associated
float32 sums).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from athenak_tpu.ops import pallas_z4c

DECK = """
<job>
basename = z4c_kernel
precision = single

<mesh>
nghost = {ng}
nx1 = 16
x1min = -4.0
x1max = 4.0
ix1_bc = {bc}
ox1_bc = {bc}
nx2 = 16
x2min = -4.0
x2max = 4.0
ix2_bc = {bc}
ox2_bc = {bc}
nx3 = 16
x3min = -4.0
x3max = 4.0
ix3_bc = {bc}
ox3_bc = {bc}

<meshblock>
nx1 = {mb}
nx2 = 16
nx3 = 16

<time>
evolution = dynamic
integrator = rk2
cfl_number = 0.25
tlim = 1.0

<z4c>
diss = 0.5
damp_kappa1 = 0.02
damp_kappa2 = 0.0

<problem>
pgen_name = z4c_one_puncture
punc_ADM_mass = 1.0
"""


@pytest.fixture
def f32_interpret():
    jax.config.update("jax_enable_x64", False)
    pallas_z4c.INTERPRET = True
    yield
    pallas_z4c.INTERPRET = False
    jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("ng,bc,mb", [(2, "outflow", 16),
                                      (4, "outflow", 16),
                                      (2, "periodic", 8)])
def test_z4c_stage_kernel_matches_jnp(f32_interpret, ng, bc, mb):
    pin = ParameterInput.from_string(DECK.format(ng=ng, bc=bc, mb=mb))
    mesh, phys, pgen, driver, state = build(pin)
    assert pallas_z4c.supports_z4c_stage(phys, mesh)

    u = jnp.asarray(state["u"], jnp.float32)
    u = phys.bvals.fill_ghosts(u)
    u = phys.alg_constr(u)
    rng = np.random.default_rng(3)
    u1 = u * (1.0 + 1e-3 * jnp.asarray(
        rng.normal(size=u.shape), jnp.float32))
    gam0, gam1, beta_dt = 0.25, 0.75, 0.01

    def ref(u, u1):
        rhs = phys.rhs(u)
        un = gam0 * u + gam1 * u1 + beta_dt * rhs
        return phys.alg_constr(un)

    want = np.asarray(jax.jit(ref)(u, u1))
    got = np.asarray(jax.jit(
        lambda a, b: pallas_z4c.fused_z4c_stage(
            a, b, phys, gam0, gam1, beta_dt))(u, u1))

    core = (slice(None), slice(None), slice(ng, -ng), slice(ng, -ng),
            slice(ng, -ng))
    scale = np.maximum(np.abs(want[core]), 1.0)
    np.testing.assert_allclose(got[core] / scale, want[core] / scale,
                               atol=2e-5, rtol=0)


def test_z4c_stage_packed_matches_jnp(f32_interpret):
    """Row-packed layout parity: g logical x2 rows per 128-lane row
    (ops/pallas_z4c.py pack) must reproduce the jnp stage + outflow
    ghost fill exactly on interior cells, and the folded BC on ghosts."""
    deck = DECK.format(ng=2, bc="outflow", mb=16) \
        .replace("nx1 = 16", "nx1 = 28") \
        .replace("nx2 = 16", "nx2 = 28") \
        .replace("nx3 = 16", "nx3 = 28") \
        .replace("<z4c>", "<z4c>\nuse_pallas = true")
    pin = ParameterInput.from_string(deck)
    pin.set_value("meshblock", "nx1", 28)
    pin.set_value("meshblock", "nx2", 28)
    pin.set_value("meshblock", "nx3", 28)
    mesh, phys, pgen, driver, state = build(pin)
    assert phys.fold_bc and phys.pack == 4, (phys.fold_bc, phys.pack)
    ng = 2

    u = jnp.asarray(state["u"], jnp.float32)
    u = phys.bvals.fill_ghosts(u)
    u = phys.alg_constr(u)
    rng = np.random.default_rng(7)
    u1 = u * (1.0 + 1e-3 * jnp.asarray(
        rng.normal(size=u.shape), jnp.float32))
    gam0, gam1, beta_dt = 0.25, 0.75, 0.01

    def ref(u, u1):
        rhs = phys.rhs(u)
        un = gam0 * u + gam1 * u1 + beta_dt * rhs
        un = phys.bvals.fill_ghosts(un)
        return phys.alg_constr(un)

    want = np.asarray(jax.jit(ref)(u, u1))

    def packed(a, b):
        out = pallas_z4c.fused_z4c_stage(
            phys.pack_arr(a), phys.pack_arr(b), phys, gam0, gam1,
            beta_dt, fold_bc=True, pack=phys.pack)
        return phys.unpack_arr(out)

    got = np.asarray(jax.jit(packed)(u, u1))
    # whole array: the folded outflow BC must match fill_ghosts too
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_allclose(got / scale, want / scale,
                               atol=2e-5, rtol=0)
