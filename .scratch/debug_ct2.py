"""Diff full-cycle evolution fused_ct on/off, localize in space."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from bench import DECK


def one(fused, ncyc):
    pin = ParameterInput.from_string(DECK.format(nx=32, mbx=16))
    pin.modify_from_cmdline([f"time/nlim={ncyc}"])
    mesh, phys, pgen, driver, state = build(pin)
    phys.use_fused_ct = fused
    state = driver.initialize(state)
    state = driver.execute(state)
    return mesh, state


for ncyc in (1, 2):
    mesh, s0 = one(False, ncyc)
    _, s1 = one(True, ncyc)
    print(f"--- after {ncyc} cycle(s)")
    for c in ("x1f", "x2f", "x3f"):
        a = np.asarray(s0["bfc"][c])
        b = np.asarray(s1["bfc"][c])
        d = np.abs(a - b)
        print(f"{c}: max diff (all cells) {d.max():.3e}")
        if d.max() > 1e-7:
            idx = np.unravel_index(d.argmax(), d.shape)
            print("   at", idx, "ref", a[idx], "fus", b[idx])
            km = [f"{d[:, kk].max():.1e}" for kk in range(d.shape[1])]
            jm = [f"{d[:, :, jj].max():.1e}" for jj in range(d.shape[2])]
            im = [f"{d[..., ii].max():.1e}" for ii in range(d.shape[3])]
            print("   k:", km)
            print("   j:", jm)
            print("   i:", im)
            break
