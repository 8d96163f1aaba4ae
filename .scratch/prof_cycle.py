"""Ablation profile of the MHD bench cycle at 124^3 f32 on TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from athenak_tpu.athinput import ParameterInput
from athenak_tpu.main import build
from bench import DECK

NC = 20

def time_cycle(tag, patch=None):
    pin = ParameterInput.from_string(DECK.format(nx=124, mbx=124))
    mesh, phys, pgen, driver, state = build(pin)
    state = driver.initialize(state)
    if patch:
        patch(phys)
    dt = jnp.asarray(driver.mesh.dt, dtype=state["u"].dtype)
    cycle = driver.make_cycle_fn()
    def window(state, dt):
        def step(c, _):
            s, d = c
            s, dtn, _ = cycle(s, d)
            return (s, d), dtn
        (s, _), dts = jax.lax.scan(step, (state, dt), None, length=NC)
        return s, jnp.sum(dts)
    wf = jax.jit(window, donate_argnums=(0,))
    state, chk = wf(state, dt)
    _ = float(chk)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        state, chk = wf(state, dt)
        _ = float(chk)
        best = min(best, time.perf_counter() - t0)
    ms = best / NC * 1e3
    print(f"{tag:28s} {ms:7.3f} ms/cycle")
    return ms

base = time_cycle("full")

def no_ct(phys):
    phys.corner_e = lambda *a, **k: (None, None, None)
    phys.ct_update = lambda bfc, *a, **k: bfc
time_cycle("no corner_e+ct", no_ct)

def no_fill(phys):
    phys.bvals.fill_ghosts = lambda u: u
time_cycle("no cc ghost fill", no_fill)

def no_fill_fc(phys):
    phys.fill_ghosts_fc = lambda b: b
time_cycle("no fc ghost fill", no_fill_fc)

def no_c2p(phys):
    orig = phys.cons_to_prim
    phys.cons_to_prim = lambda u, bcc: (phys.state_w, u, {})
def patch_c2p(phys):
    def fake(u, bcc):
        w = jnp.concatenate([u[:, :5]], axis=1)  # reuse cons as prims
        return w, u, {"nceil": jnp.zeros((), jnp.int32),
                      "nfloor": jnp.zeros((), jnp.int32)}
    phys.cons_to_prim = fake
time_cycle("no cons_to_prim", patch_c2p)

def no_dt(phys):
    phys.new_dt = lambda w, bcc: jnp.asarray(1e-4, w.dtype)
time_cycle("no new_dt", no_dt)

def no_stage(phys):
    def fake(*a, **k):
        from athenak_tpu.ops.pallas_stage import fused_stage3d
        raise RuntimeError
    # replace the fused stage with a pass-through: u unchanged, zero emf
    phys.use_fused_stage = True
    import athenak_tpu.physics.mhd as M
    def stage_update(state, saved, gam0, gam1, beta_dt, _p=phys):
        u, w, bfc, bcc = (state["u"], state["w"], state["bfc"],
                          state["bcc"])
        u = _p.bvals.fill_ghosts(u)
        bfc = _p.fill_ghosts_fc(bfc)
        bcc = _p.compute_bcc(bfc)
        w, u, counters = _p.cons_to_prim(u, bcc)
        out = dict(state)
        out.update({"u": u, "w": w, "bfc": bfc, "bcc": bcc})
        return out, counters
    phys.stage_update = stage_update
time_cycle("no stage+ct (fills+c2p+dt)", no_stage)
