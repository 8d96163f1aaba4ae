"""Problem generators (initial conditions + optional final error hooks).

Parity target: the reference pgen registry and callback enrollment
(reference: src/pgen/pgen.hpp:27-93).  Each generator is a module with

    init(pin, mesh, phys) -> (u, w)        # device arrays, ghosts unfilled
    final(pin, mesh, phys, u) -> None      # optional, e.g. error reports

selected by <problem>/pgen_name, like the reference's runtime dispatch
(reference: src/pgen/pgen.cpp:910+).
"""

from __future__ import annotations

from importlib import import_module

_REGISTRY = {
    "linear_wave": "athenak_tpu.pgen.linear_wave",
    "shock_tube": "athenak_tpu.pgen.shock_tube",
    "advection": "athenak_tpu.pgen.advection",
    "orszag_tang": "athenak_tpu.pgen.orszag_tang",
    "binary_gravity": "athenak_tpu.pgen.binary_gravity",
    "be_collapse": "athenak_tpu.pgen.be_collapse",
    "disk_magnetosphere": "athenak_tpu.pgen.disk_magnetosphere",
    "dynbbh": "athenak_tpu.pgen.dynbbh",
    "blast": "athenak_tpu.pgen.blast",
    "cpaw": "athenak_tpu.pgen.cpaw",
    "alfven_wave": "athenak_tpu.pgen.cpaw",
    "diffusion_test": "athenak_tpu.pgen.diffusion_test",
    "field_loop": "athenak_tpu.pgen.field_loop",
    "implode": "athenak_tpu.pgen.lw_implode",
    "lw_implode": "athenak_tpu.pgen.lw_implode",
    "mri3d": "athenak_tpu.pgen.mri3d",
    "mri2d": "athenak_tpu.pgen.mri2d",
    "gr_bondi": "athenak_tpu.pgen.gr_bondi",
    "gr_monopole": "athenak_tpu.pgen.gr_monopole",
    "gravity": "athenak_tpu.pgen.jeans_wave",
    "jeans": "athenak_tpu.pgen.jeans_wave",
    "turb": "athenak_tpu.pgen.turb",
    "twofluid": "athenak_tpu.pgen.twofluid",
    "z4c_linear_wave": "athenak_tpu.pgen.z4c_linear_wave",
    "z4c_one_puncture": "athenak_tpu.pgen.z4c_one_puncture",
    "rad_hohlraum": "athenak_tpu.pgen.rad_hohlraum",
    "rad_snake": "athenak_tpu.pgen.rad_snake",
    "rad_relax": "athenak_tpu.pgen.rad_relax",
    "rad_shadow": "athenak_tpu.pgen.rad_shadow",
    "rad_diffusion": "athenak_tpu.pgen.rad_diffusion",
    "gr_torus": "athenak_tpu.pgen.gr_torus",
    "kh": "athenak_tpu.pgen.kh",
    "current_sheet": "athenak_tpu.pgen.current_sheet",
    "shock_cloud": "athenak_tpu.pgen.shock_cloud",
    "slotted_cyl": "athenak_tpu.pgen.slotted_cyl",
    "slotted_cylinder": "athenak_tpu.pgen.slotted_cyl",
    "rt": "athenak_tpu.pgen.rt",
    "shu_osher": "athenak_tpu.pgen.shu_osher",
    "shwave": "athenak_tpu.pgen.shwave",
    "rad_linear_wave": "athenak_tpu.pgen.rad_linear_wave",
    "rad_beam": "athenak_tpu.pgen.rad_beam",
    "z4c_two_punctures": "athenak_tpu.pgen.z4c_two_punctures",
    "z4c_two_puncture": "athenak_tpu.pgen.z4c_two_punctures",
    "z4c_kerr_schild": "athenak_tpu.pgen.z4c_kerr_schild",
    "kerr_schild": "athenak_tpu.pgen.z4c_kerr_schild",
    "z4c_gauge_wave": "athenak_tpu.pgen.z4c_gauge_wave",
    "z4c_stability": "athenak_tpu.pgen.z4c_stability",
    "robust_stability": "athenak_tpu.pgen.z4c_stability",
    "gauge_wave": "athenak_tpu.pgen.z4c_gauge_wave",
    "z4c_boosted_puncture": "athenak_tpu.pgen.z4c_boosted_puncture",
    "z4c_adm_import": "athenak_tpu.pgen.import_id",
    "dyngr_bns_import": "athenak_tpu.pgen.import_id",
    "tov": "athenak_tpu.pgen.dyngr_tov",
    "dyngr_tov": "athenak_tpu.pgen.dyngr_tov",
}


def get_pgen(name: str):
    if name not in _REGISTRY:
        raise ValueError(f"problem/pgen_name = '{name}' not found "
                         f"(available: {sorted(_REGISTRY)})")
    return import_module(_REGISTRY[name])


def state_from_prims(phys, w, bfc=None):
    """Build the initial state from primitive arrays in ONE jitted program.

    Problem generators compute ICs in host numpy; the device tail
    (compute_bcc -> prim_to_cons) would otherwise run as dozens of eager
    ops, each paying dispatch + per-op compile latency (pathological over
    a tunneled TPU link: ~2-3 s per eager op measured).  One jit makes the
    whole tail a single compile + single dispatch, and the numpy -> device
    transfer of (w, bfc) happens once as the jit arguments.
    """
    import jax

    if bfc is not None:
        def tail(wj, bfcj):
            bcc = phys.compute_bcc(bfcj)
            return phys.prim_to_cons(wj, bcc), bcc
        u, bcc = jax.jit(tail)(w, bfc)
        return phys.make_state(u, w, bfc, bcc=bcc)
    u = jax.jit(phys.prim_to_cons)(w)
    return phys.make_state(u, w)
