"""Geodesic (icosahedral) angular grid.

Parity target: the reference ``GeodesicGrid``
(reference: src/geodesic-grid/geodesic_grid.{hpp,cpp}): nlevel-subdivided
icosahedron with nangles = 10*nlevel^2 + 2 directions, unit vectors and
solid-angle quadrature weights (plus neighbor tables for the GR angular
fluxes, later round).

Host-side numpy construction (run once, like the reference); the angle
tables become static constants of the jitted transport kernels.
"""

from __future__ import annotations

import math

import numpy as np


def _icosahedron():
    """12 vertices of the unit icosahedron, poles on +/- z."""
    verts = [(0.0, 0.0, 1.0)]
    zu = 1.0 / math.sqrt(5.0)
    ru = 2.0 / math.sqrt(5.0)
    for k in range(5):
        ph = 2.0 * math.pi * k / 5.0
        verts.append((ru * math.cos(ph), ru * math.sin(ph), zu))
    for k in range(5):
        ph = 2.0 * math.pi * (k + 0.5) / 5.0
        verts.append((ru * math.cos(ph), ru * math.sin(ph), -zu))
    verts.append((0.0, 0.0, -1.0))
    v = np.array(verts)
    faces = []
    for k in range(5):
        kp = (k + 1) % 5
        faces.append((0, 1 + k, 1 + kp))                 # top cap
        faces.append((1 + k, 6 + k, 1 + kp))             # upper band
        faces.append((1 + kp, 6 + k, 6 + kp))            # lower band
        faces.append((6 + k, 11, 6 + kp))                # bottom cap
    return v, faces


def _subdivide(verts, faces, n):
    """n-fold subdivision of each face, projected to the sphere."""
    vlist = []
    index = {}

    def get(p):
        norm = math.sqrt(p[0] ** 2 + p[1] ** 2 + p[2] ** 2)
        q = (p[0] / norm, p[1] / norm, p[2] / norm)
        key = (round(q[0], 9), round(q[1], 9), round(q[2], 9))
        if key not in index:
            index[key] = len(vlist)
            vlist.append(q)
        return index[key]

    tris = []
    for (a, b, c) in faces:
        A, B, C = np.array(verts[a]), np.array(verts[b]), np.array(verts[c])
        # barycentric lattice points
        grid = {}
        for i in range(n + 1):
            for j in range(n + 1 - i):
                p = (A * (n - i - j) + B * i + C * j) / n
                grid[(i, j)] = get(tuple(p))
        for i in range(n):
            for j in range(n - i):
                tris.append((grid[(i, j)], grid[(i + 1, j)],
                             grid[(i, j + 1)]))
                if j < n - i - 1:
                    tris.append((grid[(i + 1, j)], grid[(i + 1, j + 1)],
                                 grid[(i, j + 1)]))
    return np.array(vlist), tris


def _spherical_area(a, b, c):
    """Spherical triangle area via the l'Huilier/Girard formula."""
    def ang(u, v):
        return math.atan2(np.linalg.norm(np.cross(u, v)), float(u @ v))
    ab, bc, ca = ang(a, b), ang(b, c), ang(c, a)
    s = 0.5 * (ab + bc + ca)
    t = math.tan(s / 2) * math.tan((s - ab) / 2) \
        * math.tan((s - bc) / 2) * math.tan((s - ca) / 2)
    return 4.0 * math.atan(math.sqrt(max(t, 0.0)))


class GeodesicGrid:
    """Angles + quadrature weights; nangles = 10 nlevel^2 + 2."""

    def __init__(self, nlevel: int) -> None:
        if nlevel < 1:
            raise ValueError("nlevel >= 1 required")
        self.nlevel = nlevel
        v0, f0 = _icosahedron()
        verts, tris = _subdivide(v0, f0, nlevel)
        self.nangles = len(verts)
        assert self.nangles == 10 * nlevel ** 2 + 2, \
            (self.nangles, nlevel)
        self.nh = np.asarray(verts)  # unit direction vectors [nangles, 3]

        # solid angles: each triangle contributes a third of its area to
        # each corner (exact partition of 4 pi)
        w = np.zeros(self.nangles)
        for (a, b, c) in tris:
            ar = _spherical_area(self.nh[a], self.nh[b], self.nh[c])
            w[a] += ar / 3.0
            w[b] += ar / 3.0
            w[c] += ar / 3.0
        self.solid_angles = w          # sums to 4 pi
        self.weights = w / (4.0 * math.pi)
