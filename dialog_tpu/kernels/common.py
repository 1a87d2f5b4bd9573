"""Kernel dispatch helpers: Pallas on TPU, jnp reference elsewhere.

Set ``DIALOG_TPU_PALLAS_INTERPRET=1`` to force the Pallas path in interpreter
mode on any backend — this is how pytest exercises the real kernel bodies on
the CPU mesh (SURVEY.md §7.6 kernel-vs-oracle parity).
"""

from __future__ import annotations

import functools
import os

import jax


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def interpret_mode() -> bool:
    """True when kernels should run under the Pallas interpreter."""
    return os.environ.get("DIALOG_TPU_PALLAS_INTERPRET", "") == "1"


def use_pallas() -> bool:
    """Take the pallas_call path (compiled on TPU, interpreted if forced)."""
    return on_tpu() or interpret_mode()


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
