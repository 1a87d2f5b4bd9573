"""Fused FAST-9 score + NMS + rank kernel (Pallas TPU).

The detection front of the extractor (canonical ``src/ORBextractor.cc``
``ComputeKeyPointsOctTree`` per-cell ``cv::FAST`` — SURVEY.md §2.1). The jnp
formulation materializes a [16, H, W] shifted stack plus ~10 full-image
intermediates in HBM per level; this kernel keeps one row-strip of the image
in VMEM and produces the final per-pixel *rank* map in a single pass:

    rank = 0                      if not a FAST corner at min_th after 3x3 NMS
         = score                  if min_th < score <= th_fast
         = score + 1000           if score > th_fast   (two-tier bonus)

with the border mask folded in. Score is OpenCV's definition: the largest
threshold at which some 9-contiguous arc of the 16-pixel Bresenham circle is
uniformly brighter/darker than the center.

Lane (x) shifts use cyclic ``pltpu.roll``; the wrap-around only contaminates
pixels within 3 columns of the image edge, all of which sit inside the
``border`` dead zone and are masked to 0 anyway. Row (y) shifts read from a
4-row halo the wrapper pads around each strip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import interpret_mode, round_up, use_pallas

# circle of radius 3, circularly ordered (dx, dy) — keep in sync with
# frontend._CIRCLE
_CIRCLE = [
    (3, 0), (3, 1), (2, 2), (1, 3), (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3), (0, -3), (1, -3), (2, -2), (3, -1),
]

def _strip_rows(width_padded: int) -> int:
    """Rows per program (multiple of 8 for f32 sublane alignment), sized so
    the ~40 live [strip+2, Wp] f32 intermediates stay well inside VMEM."""
    return 64 if width_padded <= 768 else 32


def _kernel(H, W, Wp, min_th, th_fast, border, img_ref, out_ref):
    i = pl.program_id(0)
    S = out_ref.shape[0]
    # slab covers strip rows [i*S - 4, i*S + S + 4) of the padded image
    # (wrapper pre-pads 4 rows top/bottom, so the HBM offset is i*S)
    slab = img_ref[pl.ds(i * S, S + 8), :]          # [S+8, Wp]

    def window_minmax(row_lo, n_rows):
        """FAST bright/dark scores for slab rows [row_lo, row_lo+n_rows)."""
        center = slab[row_lo : row_lo + n_rows, :]
        diffs = []
        for dx, dy in _CIRCLE:
            n = slab[row_lo + dy : row_lo + dy + n_rows, :]
            if dx:
                n = pltpu.roll(n, (-dx) % Wp, axis=1)
            diffs.append(n - center)
        # min/max over 9 circularly-consecutive diffs, all 16 starts
        def shift(lst, k):
            return lst[k:] + lst[:k]

        mn2 = [jnp.minimum(a, b) for a, b in zip(diffs, shift(diffs, 1))]
        mn4 = [jnp.minimum(a, b) for a, b in zip(mn2, shift(mn2, 2))]
        mn8 = [jnp.minimum(a, b) for a, b in zip(mn4, shift(mn4, 4))]
        mn9 = [jnp.minimum(a, b) for a, b in zip(mn8, shift(diffs, 8))]
        mx2 = [jnp.maximum(a, b) for a, b in zip(diffs, shift(diffs, 1))]
        mx4 = [jnp.maximum(a, b) for a, b in zip(mx2, shift(mx2, 2))]
        mx8 = [jnp.maximum(a, b) for a, b in zip(mx4, shift(mx4, 4))]
        mx9 = [jnp.maximum(a, b) for a, b in zip(mx8, shift(diffs, 8))]
        bright = mn9[0]
        darkneg = mx9[0]
        for k in range(1, 16):
            bright = jnp.maximum(bright, mn9[k])
            darkneg = jnp.minimum(darkneg, mx9[k])
        return jnp.maximum(bright, -darkneg)

    # score on [S+2, Wp]: strip rows plus one NMS halo row each side
    s = window_minmax(3, S + 2)
    # 3x3 NMS (strict: keep where score >= neighborhood max)
    mx = s
    for dx in (-1, 0, 1):
        r = pltpu.roll(s, (-dx) % Wp, axis=1) if dx else s
        mx = jnp.maximum(mx, r)
    nmx = jnp.maximum(jnp.maximum(mx[:S, :], mx[1 : S + 1, :]), mx[2 : S + 2, :])
    sc = s[1 : S + 1, :]
    sc = jnp.where(sc >= nmx, sc, 0.0)
    # border + image-extent mask (slab coordinates -> image rows i*S + r)
    rows = i * S + jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 1)
    inb = (
        (rows >= border) & (rows < H - border)
        & (cols >= border) & (cols < W - border)
    )
    sc = jnp.where(inb, sc, 0.0)
    rank = jnp.where(sc > min_th, sc + jnp.where(sc > th_fast, 1000.0, 0.0), 0.0)
    out_ref[...] = rank


def _reference(img, min_th, th_fast, border):
    from .. import frontend as fe

    H, W = img.shape
    s = fe.fast_score(img)
    s = fe._nms3(s)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    s = jnp.where(inb, s, 0.0)
    return jnp.where(s > min_th, s + jnp.where(s > th_fast, 1000.0, 0.0), 0.0)


def fast_nms_rank(
    img: jax.Array, min_th: float, th_fast: float, border: int
) -> jax.Array:
    """Per-pixel FAST-9 corner rank map f32[H, W] (0 = rejected).

    rank = score (+1000 above th_fast) after 3x3 NMS, border-masked, zero
    below min_th. Drop-in for the jnp fast_score -> nms -> threshold chain.
    """
    if not use_pallas():
        return _reference(img, min_th, th_fast, border)
    H, W = img.shape
    Wp = round_up(W, 128)
    STRIP = _strip_rows(Wp)
    Hp = round_up(H, STRIP)
    # pad: 4-row halo top/bottom + round up to strip/lane multiples; halo
    # garbage only reaches pixels inside the border dead zone
    imgp = jnp.zeros((Hp + 8, Wp), jnp.float32)
    imgp = jax.lax.dynamic_update_slice(imgp, img.astype(jnp.float32), (4, 0))
    out = pl.pallas_call(
        functools.partial(
            _kernel, H, W, Wp, float(min_th), float(th_fast), int(border)
        ),
        grid=(Hp // STRIP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((STRIP, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        interpret=interpret_mode(),
    )(imgp)
    return out[:H, :W]
