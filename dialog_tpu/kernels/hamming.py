"""Fused Hamming matcher kernel (Pallas TPU).

The engine's highest-frequency op (SURVEY.md hot-loop rank #2): 256-bit
descriptor matching. The jnp path materializes an [N, M] distance matrix in
HBM and reduces it three times (best, second-best, mutual). This kernel
keeps everything in VMEM: for each row block it streams the whole B-side
descriptor table (M x 8 u32 = 32 KB — trivially VMEM-resident), computes
XOR+popcount distances on the VPU, applies the spatial-window / validity
gates inline, and tracks best/second-best per row in registers. The [N, M]
matrix never exists in HBM.

Outputs (best_idx, best_d, second_d) feed the same mutual/ratio logic as
``matching.match_mutual`` (mutual check = run the kernel both directions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_tpu, round_up

BLOCK_N = 128          # rows per program
CHUNK_M = 512          # B-side columns processed per inner step
MAX_DIST = 257


def _kernel(a_ref, b_ref, uva_ref, uvb_ref, va_ref, vb_ref, r2_ref,
            idx_ref, best_ref, second_ref):
    M = b_ref.shape[0]
    n_chunks = M // CHUNK_M

    a = a_ref[...]                       # [BLOCK_N, 8] u32
    uva = uva_ref[...]                   # [BLOCK_N, 2]
    va = va_ref[...]                     # [BLOCK_N] bool (as int32)
    r2 = r2_ref[...]                     # [BLOCK_N] squared radius (<0: off)

    best = jnp.full((BLOCK_N,), MAX_DIST, jnp.int32)
    second = jnp.full((BLOCK_N,), MAX_DIST, jnp.int32)
    bidx = jnp.full((BLOCK_N,), -1, jnp.int32)

    def chunk(c, carry):
        best, second, bidx = carry
        b = b_ref[pl.ds(c * CHUNK_M, CHUNK_M), :]        # [CHUNK_M, 8]
        vb = vb_ref[pl.ds(c * CHUNK_M, CHUNK_M)]
        uvb = uvb_ref[pl.ds(c * CHUNK_M, CHUNK_M), :]
        # [BLOCK_N, CHUNK_M]: XOR + popcount accumulated over the 8 words
        d = jnp.zeros((BLOCK_N, CHUNK_M), jnp.int32)
        for w in range(8):
            d = d + jax.lax.population_count(
                a[:, w][:, None] ^ b[:, w][None, :]
            ).astype(jnp.int32)
        # gates: validity both sides + optional spatial window
        dx = uva[:, 0][:, None] - uvb[:, 0][None, :]
        dy = uva[:, 1][:, None] - uvb[:, 1][None, :]
        sp_ok = (r2[:, None] < 0.0) | (dx * dx + dy * dy <= r2[:, None])
        ok = (va[:, None] > 0) & (vb[None, :] > 0) & sp_ok
        d = jnp.where(ok, d, MAX_DIST)
        # row-wise best / second-best within the chunk
        cbest = jnp.min(d, axis=1)
        carg = jnp.argmin(d, axis=1).astype(jnp.int32) + c * CHUNK_M
        d2 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, CHUNK_M), 1)
            == (carg - c * CHUNK_M)[:, None],
            MAX_DIST,
            d,
        )
        csecond = jnp.min(d2, axis=1)
        # merge with running best/second
        new_best = jnp.minimum(best, cbest)
        new_bidx = jnp.where(cbest < best, carg, bidx)
        new_second = jnp.minimum(
            jnp.maximum(jnp.minimum(best, cbest), jnp.minimum(second, csecond)),
            jnp.minimum(jnp.maximum(best, cbest), MAX_DIST),
        )
        # simpler correct merge: the two smallest of {best, second, cbest, csecond}
        lo = jnp.minimum(best, cbest)
        hi = jnp.maximum(best, cbest)
        new_second = jnp.minimum(jnp.minimum(second, csecond), hi)
        return new_best, new_second, new_bidx

    best, second, bidx = jax.lax.fori_loop(
        0, n_chunks, chunk, (best, second, bidx)
    )
    idx_ref[...] = bidx
    best_ref[...] = best
    second_ref[...] = second


@functools.partial(jax.jit, static_argnames=())
def _reference(desc_a, desc_b, valid_a, valid_b, uv_a, uv_b, r2):
    x = jax.lax.population_count(desc_a[:, None, :] ^ desc_b[None, :, :])
    d = jnp.sum(x, axis=-1).astype(jnp.int32)
    d2s = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    sp_ok = (r2[:, None] < 0) | (d2s <= r2[:, None])
    ok = valid_a[:, None] & valid_b[None, :] & sp_ok
    d = jnp.where(ok, d, MAX_DIST)
    best = jnp.min(d, axis=1)
    bidx = jnp.argmin(d, axis=1).astype(jnp.int32)
    N = d.shape[0]
    d2 = d.at[jnp.arange(N), bidx].set(MAX_DIST)
    second = jnp.min(d2, axis=1)
    return jnp.where(best >= MAX_DIST, -1, bidx), best, second


def hamming_best2(
    desc_a: jax.Array,    # u32[N, 8]
    desc_b: jax.Array,    # u32[M, 8]
    valid_a: jax.Array,   # bool[N]
    valid_b: jax.Array,   # bool[M]
    uv_a: jax.Array | None = None,   # f32[N, 2] (optional spatial gate)
    uv_b: jax.Array | None = None,   # f32[M, 2]
    radius2: jax.Array | None = None,  # f32[N] squared radius; <0 disables
):
    """Best + second-best gated Hamming match per row of A.

    Returns (best_idx i32[N] (-1 = none), best_d i32[N], second_d i32[N]).
    """
    N, M = desc_a.shape[0], desc_b.shape[0]
    if uv_a is None:
        uv_a = jnp.zeros((N, 2), jnp.float32)
        uv_b = jnp.zeros((M, 2), jnp.float32)
        radius2 = jnp.full((N,), -1.0, jnp.float32)
    if radius2 is None:
        radius2 = jnp.full((N,), -1.0, jnp.float32)

    if not on_tpu():
        return _reference(desc_a, desc_b, valid_a, valid_b, uv_a, uv_b, radius2)

    Np = round_up(N, BLOCK_N)
    Mp = round_up(M, CHUNK_M)

    def pad(x, n, fill=0):
        return jnp.pad(x, [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    a = pad(desc_a, Np)
    b = pad(desc_b, Mp)
    va = pad(valid_a.astype(jnp.int32), Np)
    vb = pad(valid_b.astype(jnp.int32), Mp)
    uva = pad(uv_a, Np)
    uvb = pad(uv_b, Mp)
    r2 = pad(radius2, Np)

    grid = (Np // BLOCK_N,)
    idx, best, second = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np,), jnp.int32),
            jax.ShapeDtypeStruct((Np,), jnp.int32),
            jax.ShapeDtypeStruct((Np,), jnp.int32),
        ],
    )(a, b, uva, uvb, va, vb, r2)
    idx = jnp.where(best >= MAX_DIST, -1, idx)
    return idx[:N], best[:N], second[:N]
