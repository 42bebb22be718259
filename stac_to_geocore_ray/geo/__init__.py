"""Pure-numpy geospatial kernels (no shapely/h3/s2 libs in this env)."""
