"""Output variable registry: base + derived quantities.

Parity target: the reference's 154-entry ``var_choice`` table and the
derived-variable kernels (reference: src/outputs/outputs.hpp:31-105,
src/outputs/basetype_output.cpp:196-640,
src/outputs/derived_variables.cpp).

TPU-native design: every entry resolves to a jitted device computation
returning ``[nmb, nvar, n3, n2, n1]`` slices; the caller fetches only
the interior cells of the requested channels (no full-state host
readback — the reference likewise computes derived vars on device).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..indices import IDN, IEN, IVX, IVY, IVZ

_HYDRO_U = ["dens", "mom1", "mom2", "mom3", "ener"]
_HYDRO_W = ["dens", "velx", "vely", "velz", "eint"]

_Z4C_LABELS = [
    "z4c_chi",
    "z4c_gxx", "z4c_gxy", "z4c_gxz", "z4c_gyy", "z4c_gyz", "z4c_gzz",
    "z4c_Khat",
    "z4c_Axx", "z4c_Axy", "z4c_Axz", "z4c_Ayy", "z4c_Ayz", "z4c_Azz",
    "z4c_Gamx", "z4c_Gamy", "z4c_Gamz",
    "z4c_Theta", "z4c_alpha", "z4c_betax", "z4c_betay", "z4c_betaz"]

_ADM_LABELS = [
    "adm_gxx", "adm_gxy", "adm_gxz", "adm_gyy", "adm_gyz", "adm_gzz",
    "adm_Kxx", "adm_Kxy", "adm_Kxz", "adm_Kyy", "adm_Kyz", "adm_Kzz",
    "adm_alpha", "adm_betax", "adm_betay", "adm_betaz"]

_TMUNU_LABELS = [
    "tmunu_Sxx", "tmunu_Sxy", "tmunu_Sxz", "tmunu_Syy", "tmunu_Syz",
    "tmunu_Szz", "tmunu_E", "tmunu_Sx", "tmunu_Sy", "tmunu_Sz"]


def _curl_cc(v1, v2, v3, mesh, ndim):
    """Cell-centered curl with centered differences (valid in the
    interior; reference: derived_variables.cpp vorticity/current)."""
    dx1 = np.asarray(mesh.mb_size["dx1"]).reshape(-1, 1, 1, 1)
    dx2 = np.asarray(mesh.mb_size["dx2"]).reshape(-1, 1, 1, 1)
    dx3 = np.asarray(mesh.mb_size["dx3"]).reshape(-1, 1, 1, 1)

    def d(f, ax, dx):
        return (jnp.roll(f, -1, axis=ax) - jnp.roll(f, 1, axis=ax)) \
            / (2.0 * dx)

    c1 = d(v3, 2, dx2) - (d(v2, 1, dx3) if ndim == 3 else 0.0)
    c2 = (d(v1, 1, dx3) if ndim == 3 else 0.0) - d(v3, 3, dx1)
    c3 = d(v2, 3, dx1) - d(v1, 2, dx2)
    return c1, c2, c3


def _divb_cc(bfc, mesh):
    dx1 = np.asarray(mesh.mb_size["dx1"]).reshape(-1, 1, 1, 1)
    dx2 = np.asarray(mesh.mb_size["dx2"]).reshape(-1, 1, 1, 1)
    dx3 = np.asarray(mesh.mb_size["dx3"]).reshape(-1, 1, 1, 1)
    x1f, x2f, x3f = bfc["x1f"], bfc["x2f"], bfc["x3f"]
    div = (x1f[..., 1:] - x1f[..., :-1]) / dx1
    if x2f.shape[2] > 2:
        div = div + (x2f[:, :, 1:, :] - x2f[:, :, :-1, :]) / dx2
    if x3f.shape[1] > 2:
        div = div + (x3f[:, 1:, :, :] - x3f[:, :-1, :, :]) / dx3
    return div


def resolve(variable: str, phys, state, mesh
            ) -> Tuple[List[str], "jnp.ndarray"]:
    """Resolve an output variable name to (labels, device array
    [nmb, nvar, n3, n2, n1]).  Raises ValueError for unknown names."""
    u = state.get("u")
    w = state.get("w")
    bcc = state.get("bcc")
    ndim = 3 if mesh.mb_indcs.nx3 > 1 else (
        2 if mesh.mb_indcs.nx2 > 1 else 1)

    # strip the rad_ prefix: radiation-coupled runs expose the same
    # fluid fields (reference: rad_hydro_* / rad_mhd_* rows)
    name = variable
    if name.startswith("rad_hydro_") or name.startswith("rad_mhd_"):
        name = name[4:]

    for phys_name in ("hydro", "mhd"):
        pre = phys_name + "_"
        if not name.startswith(pre):
            continue
        key = name[len(pre):]
        nh = getattr(phys, "nhydro", getattr(phys, "nmhd", 5))
        base = {"u_d": (u, [IDN], ["dens"]),
                "u_m1": (u, [1], ["mom1"]),
                "u_m2": (u, [2], ["mom2"]),
                "u_m3": (u, [3], ["mom3"]),
                "u_e": (u, [IEN], ["ener"]),
                "u": (u, list(range(min(nh, 5))), _HYDRO_U[:nh]),
                "w_d": (w, [IDN], ["dens"]),
                "w_vx": (w, [IVX], ["velx"]),
                "w_vy": (w, [IVY], ["vely"]),
                "w_vz": (w, [IVZ], ["velz"]),
                "w_e": (w, [IEN], ["eint"]),
                "w": (w, list(range(min(nh, 5))), _HYDRO_W[:nh])}
        if key in base:
            arr, chans, labels = base[key]
            return labels, arr[:, chans]
        if key in ("u_s", "w_s"):
            ns = phys.nscalars
            if ns == 0:
                raise ValueError(f"{variable}: no scalars configured")
            arr = u if key == "u_s" else w
            return ([f"s{i:02d}" for i in range(ns)],
                    arr[:, phys.nvar - ns:phys.nvar])
        if key in ("bcc1", "bcc2", "bcc3"):
            i = int(key[-1]) - 1
            return [key], bcc[:, i:i + 1]
        if key == "bcc":
            return ["bcc1", "bcc2", "bcc3"], bcc
        if key in ("u_bcc", "w_bcc"):
            arr = u if key == "u_bcc" else w
            labels = (_HYDRO_U if key == "u_bcc" else _HYDRO_W)[:nh]
            return (labels + ["bcc1", "bcc2", "bcc3"],
                    jnp.concatenate([arr[:, :nh], bcc], axis=1))
        if key == "t":
            return ["temp"], state["T"][:, None]
        if key == "wz":
            _, _, c3 = _curl_cc(w[:, IVX], w[:, IVY], w[:, IVZ],
                                mesh, ndim)
            return ["vort_z"], c3[:, None]
        if key == "w2":
            c1, c2, c3 = _curl_cc(w[:, IVX], w[:, IVY], w[:, IVZ],
                                  mesh, ndim)
            return ["vort2"], (c1 * c1 + c2 * c2 + c3 * c3)[:, None]
        if key == "jz":
            _, _, c3 = _curl_cc(bcc[:, 0], bcc[:, 1], bcc[:, 2],
                                mesh, ndim)
            return ["curr_z"], c3[:, None]
        if key == "j2":
            c1, c2, c3 = _curl_cc(bcc[:, 0], bcc[:, 1], bcc[:, 2],
                                  mesh, ndim)
            return ["curr2"], (c1 * c1 + c2 * c2 + c3 * c3)[:, None]
        if key == "bmag":
            return ["bmag"], jnp.sqrt(
                bcc[:, 0] ** 2 + bcc[:, 1] ** 2 + bcc[:, 2] ** 2)[:, None]
        if key == "divb":
            return ["divb"], _divb_cc(state["bfc"], mesh)[:, None]
        raise ValueError(f"output variable '{variable}' not implemented")

    if name.startswith("z4c"):
        z = state.get("z", state.get("u"))
        if name == "z4c":
            return list(_Z4C_LABELS), z[:, :len(_Z4C_LABELS)]
        i = _Z4C_LABELS.index(name)
        return [name], z[:, i:i + 1]

    if name.startswith("adm"):
        adm = _adm_fields(phys, state)
        fields = adm["g3d"] + adm["K_dd"] \
            + [adm["alpha"]] + adm["beta_u"]
        if name == "adm":
            return list(_ADM_LABELS), jnp.stack(fields, axis=1)
        if name == "adm_psi4":
            from ..z4c.z4c import spatial_det
            det = spatial_det(adm["g3d"])
            return ["adm_psi4"], (det ** (1.0 / 6.0))[:, None]
        i = _ADM_LABELS.index(name)
        return [name], fields[i][:, None]

    if name.startswith("con"):
        zmod = phys if not hasattr(phys, "z4c") else phys.z4c
        z = state.get("z", state.get("u"))
        H, M2 = zmod.adm_constraints(z)
        if name == "con_H":
            return ["con_H"], H[:, None]
        if name == "con_M":
            return ["con_M"], jnp.sqrt(M2)[:, None]
        if name == "con":
            return ["con_H", "con_M"], jnp.stack(
                [H, jnp.sqrt(M2)], axis=1)
        raise ValueError(f"constraint variable '{name}' not implemented "
                         "(available: con, con_H, con_M)")

    if name.startswith("weyl"):
        from ..z4c.weyl import weyl_scalars
        zmod = phys if not hasattr(phys, "z4c") else phys.z4c
        z = state.get("z", state.get("u"))
        rp, ip = weyl_scalars(zmod, z)
        if name == "weyl_rpsi4":
            return ["r_psi4"], rp[:, None]
        if name == "weyl_ipsi4":
            return ["i_psi4"], ip[:, None]
        return ["r_psi4", "i_psi4"], jnp.stack([rp, ip], axis=1)

    if name.startswith("tmunu"):
        adm = _adm_fields(phys, state)
        tm = phys.set_tmunu(state["u"], state["w"], state["bcc"], adm)
        fields = tm["S_dd"] + [tm["E"]] + tm["S_d"]
        if name == "tmunu":
            return list(_TMUNU_LABELS), jnp.stack(fields, axis=1)
        i = _TMUNU_LABELS.index(name)
        return [name], fields[i][:, None]

    if name == "rad_coord":
        # coordinate-frame radiation moments R^00, R^0i (reference:
        # derived_variables.cpp rad moments branch)
        labels, moments = phys.coord_moments(state)
        return labels, moments

    if name == "turb_force":
        f = state["force"]
        return ["force1", "force2", "force3"], f

    if name == "grav_phi":
        phi = phys.pgrav.solve(state["u"], phys.bvals)
        return ["phi"], phi[:, None]

    raise ValueError(f"output variable '{variable}' unknown")


def _adm_fields(phys, state) -> Dict:
    """ADM fields for output: evolved Z4c, fixed background, or pure-Z4c
    conversion (reference: coordinates/adm.cpp)."""
    if hasattr(phys, "adm_of"):
        return phys.adm_of(state)
    from ..dyngr import adm_from_z4c
    return adm_from_z4c(phys, state.get("z", state["u"]))
