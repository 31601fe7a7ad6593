"""Pallas TPU kernels — the performance path for the hot pipeline stages.

Each kernel is validated against the XLA implementations in ops/ (which are
themselves validated against the dense oracle), mirroring the reference's
kernel-vs-CPU-reference test strategy (SURVEY.md §4.1).
"""
