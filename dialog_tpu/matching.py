"""Descriptor matching policies, TPU-first.

Replaces the reference's matcher (canonical ``src/ORBmatcher.cc`` —
SURVEY.md §2.1): 256-bit Hamming matching with distance thresholds
(TH_LOW/TH_HIGH), Lowe ratio, mutual-best checks, rotation-consistency
histogram, and the projection/window-gated search family.

Design departure (SURVEY.md §7.1 rule 6): instead of per-cell candidate
lists walked by C++ loops, every policy is a dense ``[N, M]`` distance
matrix with *masks* doing the gating (spatial window, octave band, validity).
At frame scale (N, M <= 2048) the full matrix is tiny for the VPU, and the
row/column reductions fuse into a handful of vector ops. A Pallas tiled
version slots in behind `hamming_distance_matrix` for larger problems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIST_BINS = 30       # rotation histogram (reference: HISTO_LENGTH)
MAX_DIST = 257       # sentinel > any 256-bit Hamming distance


def hamming_distance_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """Pairwise Hamming distance of packed 256-bit descriptors.

    desc_a: u32[N, 8], desc_b: u32[M, 8] -> i32[N, M].
    XOR + population count on the VPU (reference: DescriptorDistance's
    bit-twiddling popcount, vectorized over all pairs at once).
    """
    x = jax.lax.population_count(desc_a[:, None, :] ^ desc_b[None, :, :])
    return jnp.sum(x, axis=-1).astype(jnp.int32)


def rotation_consistency_mask(
    angle_a: jax.Array, angle_b: jax.Array, match_b: jax.Array, ok: jax.Array
) -> jax.Array:
    """Keep only matches whose angle difference falls in the top-3 histogram bins.

    Reference: ComputeThreeMaxima over a 30-bin rotation histogram.
    angle_a: f32[N] (query), angle_b: f32[M] (train), match_b: i32[N] index
    into b (-1 = none), ok: bool[N].
    """
    two_pi = 2.0 * jnp.pi
    rot = angle_a - angle_b[jnp.clip(match_b, 0, angle_b.shape[0] - 1)]
    rot = jnp.mod(rot, two_pi)
    bin_ = jnp.clip((rot * HIST_BINS / two_pi).astype(jnp.int32), 0, HIST_BINS - 1)
    hist = jnp.zeros((HIST_BINS,), jnp.int32).at[jnp.where(ok, bin_, 0)].add(
        ok.astype(jnp.int32)
    )
    top3 = jax.lax.top_k(hist, 3)[0]
    thresh = jnp.maximum(top3[2], (top3[0] // 10) + 1)  # drop weak bins
    keep_bin = hist >= thresh
    return ok & keep_bin[bin_]


def match_mutual(
    dist: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    max_dist: int = 50,
    ratio: float = 1.0,
):
    """Mutual-nearest match with optional Lowe ratio on the query side.

    dist: i32[N, M]. Returns (match_b i32[N] (-1 = none), best_dist i32[N]).
    """
    big = jnp.int32(MAX_DIST)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], dist, big)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    # second best for the ratio test
    N = d.shape[0]
    d2 = d.at[jnp.arange(N), best].set(big)
    second_d = jnp.min(d2, axis=1)
    # mutual check: is a the best for its matched b?
    best_for_b = jnp.argmin(d, axis=0)  # i32[M]
    mutual = best_for_b[best] == jnp.arange(N)
    ok = (
        valid_a
        & (best_d <= max_dist)
        & (best_d.astype(jnp.float32) < ratio * second_d.astype(jnp.float32))
        & mutual
    )
    return jnp.where(ok, best, -1), best_d


def match_window(
    desc_a: jax.Array,
    uv_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    uv_b: jax.Array,
    valid_b: jax.Array,
    radius: float,
    max_dist: int = 50,
    ratio: float = 0.9,
    angle_a: jax.Array | None = None,
    angle_b: jax.Array | None = None,
):
    """Window-gated mutual match (reference: SearchForInitialization).

    Candidates for a are restricted to b-features within `radius` px of a's
    location (the reference walks grid cells; here: a distance-matrix mask).
    """
    dist = hamming_distance_matrix(desc_a, desc_b)
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    near = d2 <= radius * radius
    dist = jnp.where(near, dist, MAX_DIST)
    match_b, best_d = match_mutual(dist, valid_a, valid_b, max_dist, ratio)
    if angle_a is not None:
        ok = match_b >= 0
        ok = rotation_consistency_mask(angle_a, angle_b, match_b, ok)
        match_b = jnp.where(ok, match_b, -1)
    return match_b, best_d


def match_projected(
    lm_desc: jax.Array,
    lm_uv: jax.Array,       # predicted pixel location of each landmark
    lm_valid: jax.Array,
    lm_octave: jax.Array,   # predicted octave per landmark
    ft_desc: jax.Array,
    ft_uv: jax.Array,
    ft_valid: jax.Array,
    ft_octave: jax.Array,
    radius: float,
    scale_factor: float,
    max_dist: int = 100,
    ratio: float = 0.9,
    octave_band: int = 1,
):
    """Projection-guided landmark->feature match (reference: SearchByProjection).

    The search radius scales with the landmark's predicted octave (coarser
    scale => larger window), and candidate features must lie within
    ``octave_band`` pyramid levels of the prediction.

    Returns (match_ft i32[L] (-1 = none), best_dist i32[L]).
    """
    from .kernels.common import on_tpu

    r = radius * scale_factor ** lm_octave.astype(jnp.float32)
    if on_tpu():
        # fused Pallas path: gates applied in VMEM, no [L, F] matrix in HBM
        from .kernels.hamming import mutual_match_fused

        return mutual_match_fused(
            lm_desc, ft_desc, lm_valid, ft_valid,
            uv_a=lm_uv, uv_b=ft_uv, radius2=r * r,
            oct_a=lm_octave, oct_b=ft_octave, octave_band=octave_band,
            max_dist=max_dist, ratio=ratio,
        )
    dist = hamming_distance_matrix(lm_desc, ft_desc)
    d2 = jnp.sum((lm_uv[:, None, :] - ft_uv[None, :, :]) ** 2, axis=-1)
    near = d2 <= (r * r)[:, None]
    oct_ok = jnp.abs(ft_octave[None, :] - lm_octave[:, None]) <= octave_band
    dist = jnp.where(near & oct_ok, dist, MAX_DIST)
    return match_mutual(dist, lm_valid, ft_valid, max_dist, ratio)
