"""Profile the pool bench case: per-piece timings of one RK stage.

axon backend: block_until_ready is not an honest barrier; every timed
region must end with a scalar fetch (see bench.py _time_pin).
"""
import time, sys, os
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench as B
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build

COAL = os.environ.get("PROF_COALESCE", "0") == "1"
deck = B.DECK.format(nx=124, mbx=62, nx3=124, mb3=62)
pin = ParameterInput.from_string(deck)
if not COAL:
    pin.set_value("mesh", "coalesce", "false")
mesh, phys, pgen, driver, state = build(pin)
state = driver.initialize(state)
phys = driver.phys
print("mega:", phys.use_mega_stage, "fused:", phys.use_fused_stage,
      "pallas_fill:", phys.bvals.use_pallas_fill,
      "pool_fill:", phys.bvals.pool_fill_active(jnp.float32))
saved = phys.save_state(state)
zones = 124**3


def timeit(name, fn, *args, n=30):
    """fn must return something reducible; we fetch a scalar to barrier."""
    def probe(r):
        leaves = jax.tree_util.tree_leaves(r)
        return float(jnp.sum(leaves[0].ravel()[:1]))
    probe(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n - 1):
        r = fn(*args)
    v = probe(r)
    dt = (time.perf_counter() - t0) / (n - 1)
    print(f"{name:28s} {dt*1e3:8.3f} ms   {zones/dt/1e6:8.1f} Mz/s-equiv")
    return dt


from athenak_tpu.ops.pallas_stage import fused_mega_stage3d
dxs = {n: dx for n, _a, _i, dx in phys.dirs}
eos = phys.eos


@jax.jit
def mega(w, bcc, bfc, u, u1, bfc1):
    return fused_mega_stage3d(w, bcc, bfc, u, u1, bfc1, eos,
                              0.5, 0.5, 0.01, dxs)


@jax.jit
def fillfc(bfc):
    return phys.fill_ghosts_fc(bfc)


@jax.jit
def fillcc(u):
    return phys.bvals.fill_ghosts(u)


@jax.jit
def aux(u, bfc):
    bcc = phys.compute_bcc(bfc)
    w, u, counters = phys.cons_to_prim(u, bcc)
    return u, w, bcc, counters


@jax.jit
def full_stage(state, saved):
    return phys.stage_update(state, saved, 0.5, 0.5, 0.01)


@jax.jit
def newdt(state):
    return phys.new_dt(state)


s = state
timeit("full stage", full_stage, s, saved)
timeit("mega stage", mega, s["w"], s["bcc"], s["bfc"], s["u"],
       saved["u1"], saved["bfc1"])
timeit("fill_ghosts_fc", fillfc, s["bfc"])
timeit("fill_ghosts cc", fillcc, s["u"])
timeit("bcc+c2p", aux, s["u"], s["bfc"])
try:
    timeit("new_dt", newdt, s)
except Exception as e:
    print("new_dt skipped:", e)

dt0 = jnp.asarray(driver.mesh.dt, jnp.float32)
cyc = driver.make_cycle_fn()


@jax.jit
def one_cycle(s, d):
    return cyc(s, d)


timeit("full cycle", one_cycle, s, dt0)


def window(state, dtv, n=20):
    def stp(c, _):
        ss, d = c
        ss, dtn, _ = cyc(ss, d)
        return (ss, d), dtn
    (ss, _), dts = jax.lax.scan(stp, (state, dtv), None, length=n)
    return ss, jnp.sum(dts)


wf = jax.jit(window)
_ = float(wf(s, dt0)[1])
t0 = time.perf_counter()
_ = float(wf(s, dt0)[1])
el = time.perf_counter() - t0
print(f"scan20 cycles: {el/20*1e3:.3f} ms/cycle  {zones*20/el/1e6:.1f} Mz/s")
