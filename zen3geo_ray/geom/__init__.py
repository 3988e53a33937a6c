"""Vectorized geometry kernels (numpy; no shapely/GEOS dependency)."""
