"""DSP ops: JAX/Pallas kernels with CPU-testable reference paths.

Each module provides the device implementation used by node lowering plus,
where numerics parity matters, a NumPy reference implementation used by the
golden tests (tests/ validates the device path against libswresample and
integer-exact C semantics).
"""
