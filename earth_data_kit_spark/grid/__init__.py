"""Pure-python/numpy grid core: cell schemes, affine math, geometry.

No Spark imports here — these functions are used both as single-node
oracles in tests and inside vectorized pandas UDFs on executors, so
results are identical by construction.
"""
