"""Fused Hamming matcher kernel (Pallas TPU).

The engine's highest-frequency op (SURVEY.md hot-loop rank #2): 256-bit
descriptor matching. The jnp path materializes an [N, M] distance matrix in
HBM and reduces it multiple times (best, second-best, mutual). This kernel
keeps everything in VMEM: for each row block it streams the whole B-side
descriptor table (M x 8 u32 — tens of KB, trivially VMEM-resident),
computes XOR+popcount distances on the VPU, applies the spatial-window /
validity gates inline, and tracks best/second-best per row in registers.
The [N, M] matrix never exists in HBM.

Spatial gating supports both orientations: a per-row radius (the forward
match) or a per-column radius (the reverse pass of a mutual check, where
the gate still belongs to the original query side). `mutual_match_fused`
reproduces `matching.match_mutual` semantics exactly with two kernel runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, round_up, use_pallas

BLOCK_N = 128          # rows per program
CHUNK_M = 512          # B-side columns processed per inner step
MAX_DIST = 257


def _kernel(band, a_ref, b_ref, uva_ref, uvb_ref, va_ref, vb_ref, r2r_ref,
            r2c_ref, octa_ref, octb_ref, idx_ref, best_ref, second_ref):
    n_chunks = b_ref.shape[0]

    i = pl.program_id(0)
    a = a_ref[...]                       # [BLOCK_N, 8] u32
    uva = uva_ref[...]                   # [BLOCK_N, 2]
    va = va_ref[i]                       # [BLOCK_N] int32 validity
    r2r = r2r_ref[i]                     # [BLOCK_N] row radius^2 (<0: off)
    octa = octa_ref[i]                   # [BLOCK_N] i32 octave

    best = jnp.full((BLOCK_N,), MAX_DIST, jnp.int32)
    second = jnp.full((BLOCK_N,), MAX_DIST, jnp.int32)
    bidx = jnp.full((BLOCK_N,), -1, jnp.int32)

    def chunk(c, carry):
        best, second, bidx = carry
        # column-side arrays arrive pre-chunked [n_chunks, CHUNK_M, ...]:
        # a dynamic leading index is supported where 1-D dynamic slices
        # are not provably aligned for Mosaic
        b = b_ref[c]
        vb = vb_ref[c]
        uvb = uvb_ref[c]
        r2c = r2c_ref[c]
        octb = octb_ref[c]
        d = jnp.zeros((BLOCK_N, CHUNK_M), jnp.int32)
        for w in range(8):
            d = d + jax.lax.population_count(
                a[:, w][:, None] ^ b[:, w][None, :]
            ).astype(jnp.int32)
        dx = uva[:, 0][:, None] - uvb[:, 0][None, :]
        dy = uva[:, 1][:, None] - uvb[:, 1][None, :]
        d2 = dx * dx + dy * dy
        # gate priority: row radius, else column radius, else open
        r2 = jnp.where(
            r2r[:, None] >= 0.0,
            r2r[:, None],
            jnp.broadcast_to(r2c[None, :], d2.shape),
        )
        sp_ok = (r2 < 0.0) | (d2 <= r2)
        oct_ok = (band < 0) | (
            jnp.abs(octa[:, None] - octb[None, :]) <= band
        )
        ok = (va[:, None] > 0) & (vb[None, :] > 0) & sp_ok & oct_ok
        # Tie-break toward the LOWEST column index (matching jnp.argmin's
        # first-occurrence semantics — Mosaic's chunked argmin does not):
        # minimize the combined key dist*CHUNK_M + col. Distances <= 257 and
        # CHUNK_M = 512 keep the key < 2^18, exact in f32 (Mosaic's min
        # lowering is f32-only).
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, CHUNK_M), 1)
        key = jnp.where(ok, d, MAX_DIST).astype(jnp.float32) * float(
            CHUNK_M
        ) + iota.astype(jnp.float32)
        kbest = jnp.min(key, axis=1)
        cbest = jnp.floor(kbest / float(CHUNK_M)).astype(jnp.int32)
        carg = kbest.astype(jnp.int32) - cbest * CHUNK_M
        d2nd = jnp.where(iota == carg[:, None], float(MAX_DIST * CHUNK_M), key)
        csecond = jnp.floor(jnp.min(d2nd, axis=1) / float(CHUNK_M)).astype(
            jnp.int32
        )
        carg = carg + c * CHUNK_M
        lo = jnp.minimum(best, cbest)
        hi = jnp.maximum(best, cbest)
        new_second = jnp.minimum(jnp.minimum(second, csecond), hi)
        new_bidx = jnp.where(cbest < best, carg, bidx)
        return lo, new_second, new_bidx

    best, second, bidx = jax.lax.fori_loop(
        0, n_chunks, chunk, (best, second, bidx)
    )
    idx_ref[i] = bidx
    best_ref[i] = best
    second_ref[i] = second


def _reference(desc_a, desc_b, valid_a, valid_b, uv_a, uv_b, r2_rows, r2_cols,
               oct_a, oct_b, band):
    x = jax.lax.population_count(desc_a[:, None, :] ^ desc_b[None, :, :])
    d = jnp.sum(x, axis=-1).astype(jnp.int32)
    d2s = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    r2 = jnp.where(
        r2_rows[:, None] >= 0, r2_rows[:, None],
        jnp.broadcast_to(r2_cols[None, :], d2s.shape),
    )
    sp_ok = (r2 < 0) | (d2s <= r2)
    oct_ok = (band < 0) | (jnp.abs(oct_a[:, None] - oct_b[None, :]) <= band)
    ok = valid_a[:, None] & valid_b[None, :] & sp_ok & oct_ok
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
    uv_a: jax.Array | None = None,       # f32[N, 2]
    uv_b: jax.Array | None = None,       # f32[M, 2]
    radius2: jax.Array | None = None,    # f32[N] row-side squared radius
    radius2_cols: jax.Array | None = None,  # f32[M] column-side squared radius
    oct_a: jax.Array | None = None,      # i32[N] octaves (band gating)
    oct_b: jax.Array | None = None,      # i32[M]
    octave_band: int = -1,               # <0 disables the octave gate
):
    """Best + second-best gated Hamming match per row of A.

    Returns (best_idx i32[N] (-1 = none), best_d i32[N], second_d i32[N]).
    """
    N, M = desc_a.shape[0], desc_b.shape[0]
    if uv_a is None:
        uv_a = jnp.zeros((N, 2), jnp.float32)
        uv_b = jnp.zeros((M, 2), jnp.float32)
    if radius2 is None:
        radius2 = jnp.full((N,), -1.0, jnp.float32)
    if radius2_cols is None:
        radius2_cols = jnp.full((M,), -1.0, jnp.float32)
    if oct_a is None:
        oct_a = jnp.zeros((N,), jnp.int32)
        oct_b = jnp.zeros((M,), jnp.int32)

    if not use_pallas():
        return _reference(
            desc_a, desc_b, valid_a, valid_b, uv_a, uv_b, radius2, radius2_cols,
            oct_a, oct_b, octave_band,
        )

    Np = round_up(N, BLOCK_N)
    Mp = round_up(M, CHUNK_M)

    def pad(x, n, fill=0):
        return jnp.pad(x, [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    nch = Mp // CHUNK_M
    idx, best, second = pl.pallas_call(
        functools.partial(_kernel, octave_band),
        grid=(Np // BLOCK_N,),
        in_specs=[
            pl.BlockSpec((BLOCK_N, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, CHUNK_M, 8), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, CHUNK_M, 2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np // BLOCK_N, BLOCK_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, CHUNK_M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np // BLOCK_N, BLOCK_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, CHUNK_M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np // BLOCK_N, BLOCK_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, CHUNK_M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Np // BLOCK_N, BLOCK_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np // BLOCK_N, BLOCK_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np // BLOCK_N, BLOCK_N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np // BLOCK_N, BLOCK_N), jnp.int32),
            jax.ShapeDtypeStruct((Np // BLOCK_N, BLOCK_N), jnp.int32),
            jax.ShapeDtypeStruct((Np // BLOCK_N, BLOCK_N), jnp.int32),
        ],
        interpret=interpret_mode(),
    )(
        pad(desc_a, Np), pad(desc_b, Mp).reshape(nch, CHUNK_M, 8),
        pad(uv_a, Np), pad(uv_b, Mp).reshape(nch, CHUNK_M, 2),
        pad(valid_a.astype(jnp.int32), Np).reshape(-1, BLOCK_N),
        pad(valid_b.astype(jnp.int32), Mp).reshape(nch, CHUNK_M),
        pad(radius2, Np, fill=-1.0).reshape(-1, BLOCK_N),
        pad(radius2_cols, Mp, fill=-1.0).reshape(nch, CHUNK_M),
        pad(oct_a, Np).reshape(-1, BLOCK_N),
        pad(oct_b, Mp).reshape(nch, CHUNK_M),
    )
    idx = idx.reshape(-1)
    best = best.reshape(-1)
    second = second.reshape(-1)
    idx = jnp.where(best >= MAX_DIST, -1, idx)
    return idx[:N], best[:N], second[:N]


def mutual_match_fused(
    desc_a, desc_b, valid_a, valid_b,
    uv_a=None, uv_b=None, radius2=None,
    oct_a=None, oct_b=None, octave_band: int = -1,
    max_dist: int = 50, ratio: float = 1.0,
):
    """`matching.match_mutual` semantics without the HBM distance matrix.

    Forward pass gates by the A-side radius; the reverse pass applies the
    same per-A gate from the column side, so mutuality is evaluated on the
    identical gated matrix. Returns (match_b i32[N], best_d i32[N]).
    """
    fwd_idx, best_d, second_d = hamming_best2(
        desc_a, desc_b, valid_a, valid_b, uv_a, uv_b, radius2,
        oct_a=oct_a, oct_b=oct_b, octave_band=octave_band,
    )
    rev_idx, _, _ = hamming_best2(
        desc_b, desc_a, valid_b, valid_a, uv_b, uv_a,
        radius2=None, radius2_cols=radius2,
        oct_a=oct_b, oct_b=oct_a, octave_band=octave_band,
    )
    N = desc_a.shape[0]
    safe = jnp.clip(fwd_idx, 0, desc_b.shape[0] - 1)
    mutual = rev_idx[safe] == jnp.arange(N)
    ok = (
        (fwd_idx >= 0)
        & (best_d <= max_dist)
        & (best_d.astype(jnp.float32) < ratio * second_d.astype(jnp.float32))
        & mutual
    )
    return jnp.where(ok, fwd_idx, -1), best_d
