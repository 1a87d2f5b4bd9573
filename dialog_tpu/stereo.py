"""Stereo and RGB-D frame construction.

Replaces the reference's stereo/depth ingestion (canonical ``src/Frame.cc``
``ComputeStereoMatches`` / ``ComputeStereoFromRGBD`` — SURVEY.md §2.1).
The reference's per-row candidate lists + SAD refinement become one masked
descriptor-distance matrix with a row-band and disparity-range gate
(SURVEY.md §7.1 rule 6), followed by a parabolic sub-pixel refinement on
descriptor distances of row neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import matching
from .config import EngineConfig
from .containers import FrameArrays


SAD_W = 5       # half patch for SAD refinement (11x11, as the reference)
SAD_L = 5       # search slide +-5 px


@functools.partial(jax.jit, static_argnames=("cfg",))
def _sad_refine(
    img_l: jax.Array, img_r: jax.Array, uv_l: jax.Array, uR0: jax.Array,
    ok: jax.Array, cfg: EngineConfig
):
    """Sub-pixel disparity via SAD of 11x11 patches slid +-5 px on the row.

    Reference: the ComputeStereoMatches SAD window with parabola fit.
    Returns (uR refined f32[N], ok bool[N]).

    Patch extraction uses the frontend's one-hot-einsum gather (MXU) — the
    previous vmap'd ``dynamic_slice`` lowered to serialized while-loops that
    cost ~120 ms per 8-frame KITTI batch, ~80% of the whole stereo step
    (profiled on v5e; SURVEY.md §7.1 "everything irregular is a matmul").
    """
    H, W = img_l.shape
    P = 2 * SAD_W + 1
    WIDE = P + 2 * SAD_L

    def row_onehot(y0):
        """[N, P, H] one-hot row selectors at clipped y0."""
        ys = jnp.clip(y0, 0, H - P)
        off = jnp.arange(P, dtype=jnp.int32)
        hh = jax.lax.broadcasted_iota(jnp.int32, (y0.shape[0], P, H), 2)
        return (hh == (ys[:, None] + off)[:, :, None]).astype(jnp.float32)

    def col_onehot(x0, w):
        """[N, w, W] one-hot column selectors at clipped x0."""
        xs = jnp.clip(x0, 0, W - w)
        off = jnp.arange(w, dtype=jnp.int32)
        ww = jax.lax.broadcasted_iota(jnp.int32, (x0.shape[0], w, W), 2)
        return (ww == (xs[:, None] + off)[:, :, None]).astype(jnp.float32)

    xl = jnp.round(uv_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(uv_l[:, 1]).astype(jnp.int32)
    xr = jnp.round(uR0).astype(jnp.int32)
    ohy = row_onehot(yl - SAD_W)
    both = jnp.stack([img_l, img_r])                                 # [2,H,W]
    rows = jnp.einsum("nph,chw->ncpw", ohy, both)                    # [N,2,P,W]
    patch_l = jnp.einsum(
        "npw,nqw->npq", rows[:, 0], col_onehot(xl - SAD_W, P)
    )                                                                # [N,P,P]
    strip_r = jnp.einsum(
        "npw,nqw->npq", rows[:, 1], col_onehot(xr - SAD_W - SAD_L, WIDE)
    )                                                                # [N,P,WIDE]
    # SAD for each of the 2L+1 offsets
    sads = jnp.stack(
        [
            jnp.sum(jnp.abs(patch_l - strip_r[:, :, o : o + P]), axis=(1, 2))
            for o in range(2 * SAD_L + 1)
        ],
        axis=-1,
    )                                                                # [N, 11]
    best = jnp.argmin(sads, axis=-1)
    at_edge = (best == 0) | (best == 2 * SAD_L)
    b = jnp.clip(best, 1, 2 * SAD_L - 1)
    s_m = jnp.take_along_axis(sads, (b - 1)[:, None], 1)[:, 0]
    s_0 = jnp.take_along_axis(sads, b[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sads, (b + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(s_m + s_p - 2.0 * s_0, 1e-6)
    delta = jnp.clip(0.5 * (s_m - s_p) / denom, -1.0, 1.0)
    uR = xr.astype(jnp.float32) + (b - SAD_L).astype(jnp.float32) + delta
    return uR, ok & ~at_edge


@functools.partial(jax.jit, static_argnames=("cfg",))
def stereo_match_frames(
    left: FrameArrays,
    right: FrameArrays,
    cfg: EngineConfig,
    img_left: jax.Array | None = None,
    img_right: jax.Array | None = None,
) -> FrameArrays:
    """Fill left frame's u_right/depth from a right-image feature frame.

    Gates: same pyramid octave band, |row difference| <= 2 * scale, disparity
    in (0.1, bf/minZ). When the images are given, the matched disparity is
    refined to sub-pixel by row SAD (reference: Frame::ComputeStereoMatches).
    """
    bf = cfg.bf
    min_z = cfg.baseline  # disparity <= bf / minZ with minZ = baseline
    max_disp = bf / jnp.maximum(min_z, 1e-6)

    dist = matching.hamming_distance_matrix(left.desc, right.desc)
    scale_l = cfg.scale_factor ** left.octave.astype(jnp.float32)
    row_gap = jnp.abs(left.uv[:, None, 1] - right.uv[None, :, 1])
    row_ok = row_gap <= 2.0 * scale_l[:, None]
    disp = left.uv[:, None, 0] - right.uv[None, :, 0]
    disp_ok = (disp > 0.1) & (disp < max_disp)
    oct_ok = jnp.abs(left.octave[:, None] - right.octave[None, :]) <= 1
    gated = jnp.where(row_ok & disp_ok & oct_ok, dist, matching.MAX_DIST)
    match_r, best_d = matching.match_mutual(
        gated, left.valid, right.valid, max_dist=cfg.th_high, ratio=1.0
    )
    ok = match_r >= 0
    jr = jnp.clip(match_r, 0, right.uv.shape[0] - 1)
    uR = right.uv[jr, 0]
    if img_left is not None and img_right is not None:
        uR, ok = _sad_refine(img_left, img_right, left.uv_raw, uR, ok, cfg)
    d = left.uv[:, 0] - uR
    ok = ok & (d > 0.1) & (d < max_disp)
    depth = jnp.where(ok, bf / jnp.maximum(d, 0.1), -1.0)
    return left._replace(
        u_right=jnp.where(ok, uR, -1.0),
        depth=depth,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_and_match_stereo_batch(
    imgs_l: jax.Array, imgs_r: jax.Array, cfg: EngineConfig
) -> FrameArrays:
    """Fused stereo frontend: extract L+R features and row-match in ONE dispatch.

    The reference extracts left and right with two `ORBextractor` instances on
    two threads (canonical ``src/Frame.cc`` stereo ctor); the previous TPU
    path mirrored that as three dispatches per batch (extract L, extract R,
    match). Fusing them stacks the 2B images into one [2B, H, W] frontend
    batch — one compile signature, one dispatch, and XLA overlaps the
    row-band matcher with the tail of the extraction (VERDICT r4 directive
    10: the stereo workload's throughput pass).
    """
    from .frontend import extract_features_batch

    B = imgs_l.shape[0]
    both = jnp.concatenate([imgs_l, imgs_r], axis=0)
    feats = extract_features_batch(both, cfg)
    fl = jax.tree_util.tree_map(lambda x: x[:B], feats)
    fr = jax.tree_util.tree_map(lambda x: x[B:], feats)
    return jax.vmap(
        lambda fle, fri, il, ir: stereo_match_frames(
            fle, fri, cfg, img_left=il, img_right=ir
        )
    )(fl, fr, imgs_l, imgs_r)


@functools.partial(jax.jit, static_argnames=("cfg",))
def depth_from_rgbd(
    frame: FrameArrays, depth_img: jax.Array, cfg: EngineConfig
) -> FrameArrays:
    """Sample the depth map at (raw) keypoint locations.

    Reference: Frame::ComputeStereoFromRGBD — fake right coordinate
    uR = u - bf/z from the registered depth image.
    """
    u = jnp.clip(frame.uv_raw[:, 0].astype(jnp.int32), 0, cfg.width - 1)
    v = jnp.clip(frame.uv_raw[:, 1].astype(jnp.int32), 0, cfg.height - 1)
    z = depth_img[v, u] / cfg.depth_map_factor
    ok = frame.valid & (z > 0.05)
    uR = jnp.where(
        (cfg.bf > 0) & ok, frame.uv[:, 0] - cfg.bf / jnp.maximum(z, 0.05), -1.0
    )
    return frame._replace(
        depth=jnp.where(ok, z, -1.0),
        u_right=uR,
    )
