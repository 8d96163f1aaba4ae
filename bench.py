"""Benchmark: 3D MHD blast zone-cycles/second on one chip.

Mirrors the reference's own figure of merit — the zone-cycles/cpu_second
line printed at the end of every run (reference:
src/driver/driver.cpp:505-525) — on the headline 3D MHD blast workload
(BASELINE.md north star: >= 1e9 zone-cycles/s/chip).

Honest timing: cycles run as one on-device lax.scan per window and the
clock stops on a *value fetch* (jax.block_until_ready returns early on
the tunneled axon backend, so fetch-based sync is the only reliable
barrier).  Reports the hero single-block number plus a multi-block
configuration (8 x 62^3) that exercises the block halo-exchange path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


Z4C_DECK = """
<job>
basename = bench_punc
precision = single

<mesh>
nghost = 2
nx1 = 60
x1min = -6.0
x1max = 6.0
ix1_bc = outflow
ox1_bc = outflow
nx2 = 60
x2min = -6.0
x2max = 6.0
ix2_bc = outflow
ox2_bc = outflow
nx3 = 60
x3min = -6.0
x3max = 6.0
ix3_bc = outflow
ox3_bc = outflow

<time>
evolution = dynamic
integrator = rk4
cfl_number = 0.25
tlim = 100.0

<z4c>
diss = 0.5

<problem>
pgen_name = z4c_one_puncture
punc_ADM_mass = 1.0
"""


DECK = """
<job>
basename = bench_blast
precision = single

<mesh>
nghost = 2
nx1 = {nx}
x1min = -1.0
x1max = 1.0
nx2 = {nx}
x2min = -1.0
x2max = 1.0
nx3 = {nx3}
x3min = -1.0
x3max = 1.0

<meshblock>
nx1 = {mbx}
nx2 = {mbx}
nx3 = {mb3}

<time>
evolution = dynamic
integrator = rk2
cfl_number = 0.3
tlim = 10.0

<mhd>
eos = ideal
gamma = 1.6666666666666667
reconstruct = plm
rsolver = hlld

<problem>
pgen_name = blast
inner_radius = 0.1
outer_radius = 0.25
prat = 100.0
b_amb = 0.1
"""


def run_config(nx: int, mbx: int, ncycles: int, npasses: int,
               coalesce: bool = True, nx3: int = 0) -> float:
    from athenak_tpu.athinput import ParameterInput

    nx3 = nx3 or nx
    mb3 = nx3 if mbx == nx else mbx
    pin = ParameterInput.from_string(DECK.format(nx=nx, mbx=mbx,
                                                 nx3=nx3, mb3=mb3))
    if not coalesce:
        pin.set_value("mesh", "coalesce", "false")
    return _time_pin(pin, nx * nx * nx3, ncycles, npasses)


def run_deck(deck: str, zones: int, ncycles: int, npasses: int) -> float:
    from athenak_tpu.athinput import ParameterInput

    return _time_pin(ParameterInput.from_string(deck), zones,
                     ncycles, npasses)


def _time_pin(pin, zones: int, ncycles: int, npasses: int) -> float:
    import jax
    import jax.numpy as jnp

    from athenak_tpu.main import build

    mesh, phys, pgen, driver, state = build(pin)
    state = driver.initialize(state)
    dt = jnp.asarray(driver.mesh.dt, dtype=state["u"].dtype)

    cycle = driver.make_cycle_fn()

    def window(state, dt):
        def step(c, _):
            s, d = c
            s, dtn, _ = cycle(s, d)
            return (s, d), dtn
        (s, _), dts = jax.lax.scan(step, (state, dt), None, length=ncycles)
        return s, jnp.sum(dts)

    wf = jax.jit(window, donate_argnums=(0,))
    state, chk = wf(state, dt)
    _ = float(chk)  # compile + warm; fetch is the only honest barrier

    best = float("inf")
    for _ in range(npasses):
        t0 = time.perf_counter()
        state, chk = wf(state, dt)
        _ = float(chk)
        best = min(best, time.perf_counter() - t0)

    return zones * ncycles / best


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # Default 124^3: with 2 ghost cells the padded extent is exactly 128,
    # so arrays tile the TPU lane dimension with zero padding waste.
    nx = int(os.environ.get("BENCH_NX", "124"))
    # BENCH_NX3: x3 extent knob — the megakernel's x3 window K is the
    # largest divisor of (ncells3 - 4) <= 6, so e.g. nx3=120 gives K=6
    # (seam redundancy 8/6) vs the cube's K=4 (redundancy 6/4)
    nx3 = int(os.environ.get("BENCH_NX3", str(nx)))
    mbx = int(os.environ.get("BENCH_MBX", str(nx)))
    ncycles = int(os.environ.get("BENCH_NCYCLES", "40"))
    npasses = int(os.environ.get("BENCH_NPASSES", "2"))

    zcps = run_config(nx, mbx, ncycles, npasses, nx3=nx3)

    # multi-block secondary metrics: 8 blocks of 62^3 (the hero 124^3
    # mesh split in half along each axis).  The default
    # driver path coalesces this uniform mesh into one superblock
    # (parallel/coalesce.py) — that is what a user's run does — while
    # the "pool" variant forces the true block-pool halo-exchange path
    # real SMR/AMR/multi-chip decks hit.
    mb_zcps = mb_pool_zcps = None
    if os.environ.get("BENCH_MULTIBLOCK", "1") != "0":
        for name, kw in (("coalesced", {}), ("pool", {"coalesce": False})):
            try:
                v = run_config(124, 62, max(ncycles // 2, 5), 1, **kw)
            except Exception as e:
                print(f"multi-block ({name}) bench failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                v = None
            if name == "coalesced":
                mb_zcps = v
            else:
                mb_pool_zcps = v

    # Z4c secondary metric: one-puncture 60^3 rk4 (the NR configuration
    # has no Pallas fast path — this measures the general jnp cycle)
    z4c_zcps = None
    if os.environ.get("BENCH_Z4C", "1") != "0":
        try:
            z4c_zcps = run_deck(Z4C_DECK, 60 ** 3,
                                max(ncycles // 4, 5), 1)
        except Exception as e:
            print(f"z4c bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    out = {
        "metric": "zone_cycles_per_second_3d_mhd_blast",
        "value": zcps,
        "unit": "zone-cycles/s",
        "vs_baseline": zcps / 1.0e9,
    }
    if mb_zcps is not None:
        out["multi_block_8x62_value"] = mb_zcps
    if mb_pool_zcps is not None:
        out["multi_block_8x62_pool_value"] = mb_pool_zcps
    if z4c_zcps is not None:
        out["z4c_puncture_60_value"] = z4c_zcps
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
