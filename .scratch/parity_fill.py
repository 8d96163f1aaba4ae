"""Parity: pallas periodic fill vs sweep fill on a single-block run."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from bench import DECK


def run(fast, ncyc=6):
    pin = ParameterInput.from_string(DECK.format(nx=32, mbx=32))
    pin.modify_from_cmdline([f"time/nlim={ncyc}"])
    mesh, phys, pgen, driver, state = build(pin)
    phys.bvals.use_pallas_fill = fast
    state = driver.initialize(state)
    state = driver.execute(state)
    return mesh, state


mesh, s0 = run(False)
_, s1 = run(True)
for key in ("u", "w", "bcc"):
    a, b = np.asarray(s0[key]), np.asarray(s1[key])
    d = np.abs(a - b).max()
    print(f"{key}: max diff (incl ghosts) {d:.3e}")
    assert d == 0.0, "MISMATCH"
for c in ("x1f", "x2f", "x3f"):
    a, b = np.asarray(s0["bfc"][c]), np.asarray(s1["bfc"][c])
    d = np.abs(a - b).max()
    print(f"bfc/{c}: max diff {d:.3e}")
    assert d == 0.0, "MISMATCH"
print("FILL PARITY OK")
