"""Parity: megakernel stage vs fused_stage3d+fused_ct3d path (TPU)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from bench import DECK


def run(mega, nx=32, mbx=16, ncyc=6):
    pin = ParameterInput.from_string(DECK.format(nx=nx, mbx=mbx))
    pin.modify_from_cmdline([f"time/nlim={ncyc}"])
    mesh, phys, pgen, driver, state = build(pin)
    phys.use_mega_stage = mega and phys.use_mega_stage
    if mega:
        assert phys.use_mega_stage, "mega gate rejected this config"
    state = driver.initialize(state)
    state = driver.execute(state)
    return mesh, state


for (nx, mbx) in ((32, 16), (32, 32)):
    mesh, s0 = run(False, nx, mbx)
    _, s1 = run(True, nx, mbx)
    mbi = mesh.mb_indcs
    for key in ("u", "w", "bcc"):
        a, b = np.asarray(s0[key]), np.asarray(s1[key])
        d = np.abs(a - b).max()
        print(f"nx={nx} mb={mbx} {key}: max diff {d:.3e}")
        assert d < 1e-6, "MISMATCH"
    for c in ("x1f", "x2f", "x3f"):
        a, b = np.asarray(s0["bfc"][c]), np.asarray(s1["bfc"][c])
        d = np.abs(a - b).max()
        print(f"nx={nx} mb={mbx} bfc/{c}: max diff {d:.3e}")
        assert d < 1e-6, "MISMATCH"
print("MEGA PARITY OK")
