"""Radiation transport on geodesic angular grids."""
