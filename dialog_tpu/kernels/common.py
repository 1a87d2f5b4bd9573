"""Kernel dispatch helpers: Pallas on TPU, jnp reference elsewhere."""

from __future__ import annotations

import functools

import jax


@functools.cache
def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
