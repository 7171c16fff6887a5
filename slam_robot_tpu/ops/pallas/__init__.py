"""Pallas TPU kernels for hot image ops.

Opt-in implementations of pipeline stages where hand control over
VMEM/fusion beats XLA's default lowering. Each kernel has an interpret-mode
test and an XLA-parity test; callers select them explicitly.
"""
