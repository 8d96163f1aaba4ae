"""Parity of the multi-block Pallas DMA ghost fill vs the sweep fill.

pool_fill (ops/pallas_pool_fill.py) is the production multi-block fill
on TPU; the CPU suite exercises it in Pallas interpret mode and demands
bit-exact agreement with the sequential-sweep fill (same-level copies
are exact data movement, so there is no rounding to tolerate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from athenak_tpu.ops import pallas_pool_fill

DECK = """
<job>
basename = pool_fill
precision = single

<mesh>
nghost = 2
nx1 = 16
x1min = -0.5
x1max = 0.5
nx2 = {nx2}
x2min = -0.5
x2max = 0.5
nx3 = {nx3}
x3min = -0.5
x3max = 0.5

<meshblock>
nx1 = 8
nx2 = {mb2}
nx3 = {mb3}

<time>
evolution = dynamic
integrator = rk2
cfl_number = 0.3
tlim = 1.0

<mhd>
eos = ideal
reconstruct = plm
rsolver = hlld
gamma = 1.6666666666666667

<problem>
pgen_name = blast
inner_radius = 0.1
outer_radius = 0.25
prat = 100.0
b_amb = 0.1
"""


@pytest.fixture
def f32_interpret():
    jax.config.update("jax_enable_x64", False)
    pallas_pool_fill.INTERPRET = True
    yield
    pallas_pool_fill.INTERPRET = False
    jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("dims", [(16, 16, 8, 8), (16, 1, 8, 1)])
def test_pool_fill_matches_sweeps(f32_interpret, dims):
    nx2, nx3, mb2, mb3 = dims
    pin = ParameterInput.from_string(
        DECK.format(nx2=nx2, nx3=nx3, mb2=mb2, mb3=mb3))
    pin.set_value("mesh", "coalesce", "false")
    mesh, phys, pgen, driver, state = build(pin)
    assert pallas_pool_fill.supports_pool_fill(mesh)
    nbr = pallas_pool_fill.neighbor27(mesh)

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=state["u"].shape), jnp.float32)
    bfc = {k: jnp.asarray(rng.normal(size=v.shape), jnp.float32)
           for k, v in state["bfc"].items()}

    ref_u = np.asarray(jax.jit(phys.bvals.fill_ghosts)(u))
    got_u = np.asarray(jax.jit(
        lambda a: pallas_pool_fill.pool_fill_cc(a, nbr, mesh))(u))
    np.testing.assert_array_equal(got_u, ref_u)

    ref_b = jax.jit(phys.fill_ghosts_fc)(bfc)
    got_b = jax.jit(
        lambda b: pallas_pool_fill.pool_fill_fc(b, nbr, mesh))(bfc)
    for k in bfc:
        np.testing.assert_array_equal(np.asarray(got_b[k]),
                                      np.asarray(ref_b[k]), err_msg=k)
