"""Pallas TPU kernels for the hot non-matmul ops.

XLA fuses the convs/attention onto the MXU by itself; these kernels cover
the ops it handles poorly: windowed correlation (many shifted reads of the
same HBM tile) and fused NCC statistics. Every kernel has an
`interpret=True` path so the CPU test suite validates numerics against the
jnp reference implementations.
"""
