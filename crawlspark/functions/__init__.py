"""Scalar/vectorized function families (canonicalize, extract, robots, text).

Pure-Python reference implementations live beside their Arrow/pandas
UDF wrappers: the pure function IS the pinned oracle, the UDF is the
distributed path; tests assert they agree byte-for-byte.
"""
