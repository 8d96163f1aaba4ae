"""Coordinates / relativity mode flags (+ GR metric later layers).

Parity target: the reference ``Coordinates`` class construction flags
(reference: src/coordinates/coordinates.cpp:30-60): <coord>/special_rel
and <coord>/general_rel select the SR/GR variants of every physics kernel.
"""

from __future__ import annotations


class CoordData:
    """GR coordinate parameters (reference: src/coordinates/coordinates.hpp:34-49)."""

    def __init__(self, pin) -> None:
        self.bh_mass = pin.get_or_add_real("coord", "m", 1.0)
        self.bh_spin = pin.get_or_add_real("coord", "a", 0.0)
        self.is_minkowski = pin.get_or_add_boolean("coord", "minkowski",
                                                   False)
        self.excise = pin.get_or_add_boolean("coord", "excise", True)
        self.dexcise = pin.get_or_add_real("coord", "dexcise", -1.0)
        self.pexcise = pin.get_or_add_real("coord", "pexcise", -1.0)


class Coordinates:
    def __init__(self, pin) -> None:
        if pin.does_block_exist("coord"):
            self.is_special_relativistic = pin.get_or_add_boolean(
                "coord", "special_rel", False)
            self.is_general_relativistic = pin.get_or_add_boolean(
                "coord", "general_rel", False)
        else:
            self.is_special_relativistic = False
            self.is_general_relativistic = False
        if self.is_special_relativistic and self.is_general_relativistic:
            raise ValueError("cannot specify both special_rel and general_rel")
        self.coord_data = CoordData(pin) \
            if self.is_general_relativistic else None
