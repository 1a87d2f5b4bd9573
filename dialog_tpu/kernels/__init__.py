"""Pallas TPU kernels for the hot loops (SURVEY.md §2.1 kernel targets).

Each kernel has a pure-jnp reference implementation used as the CPU
fallback and as the parity oracle in tests; `common.use_pallas()` decides
which path runs.
"""
