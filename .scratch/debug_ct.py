"""Locate fused_ct3d vs reference-path mismatch after ONE application."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from athenak_tpu.ops.pallas_stage import fused_stage3d, fused_ct3d
from bench import DECK

pin = ParameterInput.from_string(DECK.format(nx=32, mbx=16))
mesh, phys, pgen, driver, state = build(pin)
state = driver.initialize(state)
w, bcc, bfc, u = state["w"], state["bcc"], state["bfc"], state["u"]
dxs = {n: dx for n, _a, _i, dx in phys.dirs}
beta_dt = jnp.asarray(1e-3, w.dtype)
gam0, gam1 = 0.0, 1.0

@jax.jit
def both(w, bcc, bfc, u):
    acc, fden, emf = fused_stage3d(w, bcc, bfc, u, u, phys.eos,
                                   gam0, gam1, beta_dt, dxs)
    ref_e = phys.corner_e(w, bcc, fden, emf, bfc=bfc)
    ref = phys.ct_update(bfc, bfc, ref_e[0], ref_e[1], ref_e[2],
                         gam0, gam1, beta_dt)
    fus = fused_ct3d(w, bcc, fden, emf, bfc, bfc, gam0, gam1,
                     beta_dt, dxs)
    return ref, fus, ref_e

ref, fus, ref_e = both(w, bcc, bfc, u)
mbi = mesh.mb_indcs
for c, (lo3, hi3, lo2, hi2, lo1, hi1) in {
        "x1f": (2, -2, 2, -2, 2, -1),
        "x2f": (2, -2, 2, -1, 2, -2),
        "x3f": (2, -1, 2, -2, 2, -2)}.items():
    a = np.asarray(ref[c])
    b = np.asarray(fus[c])
    ai = a[:, lo3:hi3, lo2:hi2, lo1:hi1]
    bi = b[:, lo3:hi3, lo2:hi2, lo1:hi1]
    d = np.abs(ai - bi)
    print(f"{c}: max interior diff {d.max():.3e}")
    if d.max() > 1e-7:
        idx = np.unravel_index(d.argmax(), d.shape)
        print("   at (m,k,j,i)+2 =", idx, " ref", ai[idx], " fus", bi[idx])
        # histogram of diff over k planes
        print("   per-plane max:", [f"{d[:,kk].max():.1e}"
                                    for kk in range(d.shape[1])])
