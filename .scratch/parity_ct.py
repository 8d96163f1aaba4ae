"""Parity: fused_ct3d vs corner_e+ct_update on a real blast run (TPU)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from bench import DECK


def run(nx, mbx, fused_ct, ncyc=6):
    pin = ParameterInput.from_string(DECK.format(nx=nx, mbx=mbx))
    pin.modify_from_cmdline([f"time/nlim={ncyc}"])
    mesh, phys, pgen, driver, state = build(pin)
    phys.use_fused_ct = fused_ct
    state = driver.initialize(state)
    state = driver.execute(state)
    return mesh, phys, state


for (nx, mbx) in ((32, 16), (32, 32)):
    mesh, phys, s0 = run(nx, mbx, False)
    _, _, s1 = run(nx, mbx, True)
    mbi = mesh.mb_indcs
    act = (slice(None), slice(mbi.ks, mbi.ke + 1),
           slice(mbi.js, mbi.je + 1), slice(mbi.is_, mbi.ie + 1))
    for key in ("u", "bcc"):
        a = np.asarray(s0[key])[(slice(None), slice(None)) + act[1:]]
        b = np.asarray(s1[key])[(slice(None), slice(None)) + act[1:]]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        print(f"nx={nx} mb={mbx} {key}: rel err {err:.3e}")
        assert err < 2e-6, "MISMATCH"
    for c in ("x1f", "x2f", "x3f"):
        a = np.asarray(s0["bfc"][c])[act]
        b = np.asarray(s1["bfc"][c])[act]
        err = np.abs(a - b).max()
        print(f"nx={nx} mb={mbx} bfc/{c}: abs err {err:.3e}")
        assert err < 2e-6, "MISMATCH"
print("PARITY OK")
