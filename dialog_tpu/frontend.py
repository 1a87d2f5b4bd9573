"""ORB-style feature frontend, TPU-first.

Replaces the reference's ORB extractor (canonical ``src/ORBextractor.cc`` —
SURVEY.md §2.1): 8-level image pyramid, FAST-9 corner detection, quadtree
keypoint distribution, intensity-centroid orientation, and 256-bit rotated
binary descriptors. Design departures (SURVEY.md §7.1):

* FAST segment test + score are computed for *every pixel at once* as a
  circular sliding-window min/max over 16 shifted copies of the level image —
  no per-pixel branching, pure VPU work. The score equals OpenCV's definition
  (max threshold at which the pixel stays a corner).
* The quadtree ``DistributeOctTree`` is replaced by per-cell top-K response
  selection (same spatial-uniformity goal, static shapes).
* **Everything irregular is a matmul.** TPU gathers (vmap'd dynamic slices,
  take_along_axis) measured 10-50x slower than the MXU doing the same data
  movement as dense contractions, so: pyramid resize = banded resize-matrix
  matmuls; Gaussian blur = banded blur-matrix matmuls; per-keypoint 31x31
  patch extraction = row/column one-hot einsums; descriptor sampling = one
  {-1,0,+1} comparison matrix per discretized orientation, applied as a
  single [N, 961] x [961, 30*256] matmul and a bin-select contraction. The
  orientation is discretized to 30 bins of 12 deg — exactly the lookup-table
  scheme of the original ORB paper (Rublee et al. 2011, §4.3) and the
  canonical extractor's precomputed rotated patterns.

Everything here is shape-static given an ``EngineConfig`` and jit-compatible;
``extract_features`` / ``extract_features_batch`` are the jitted entries.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig
from .containers import FrameArrays

# 16-pixel Bresenham circle of radius 3, circularly ordered (dx, dy).
_CIRCLE = np.array(
    [
        (3, 0), (3, 1), (2, 2), (1, 3), (0, 3), (-1, 3), (-2, 2), (-3, 1),
        (-3, 0), (-3, -1), (-2, -2), (-1, -3), (0, -3), (1, -3), (2, -2), (3, -1),
    ],
    dtype=np.int32,
)

PATCH_R = 15          # orientation / descriptor patch radius
PATCH = 2 * PATCH_R + 1
BORDER = PATCH_R + 4  # keep full patches inside the image (+blur margin)
N_ANGLE_BINS = 30     # 12 deg orientation discretization (ORB paper §4.3)

# cheapest MXU precision: exact for 0/1-weight selection matmuls (a one-hot
# row has a single 1.0 product; bf16 holds +-1 and the f32 accumulator keeps
# the selected value intact apart from one bf16 rounding of the operand)
_FAST_DOT = jax.lax.Precision.DEFAULT


def _brief_pattern(n_bits: int = 256, seed: int = 1234) -> np.ndarray:
    """Fixed Gaussian BRIEF sampling pattern: (n_bits, 2, 2) int offsets.

    BRIEF-style isotropic Gaussian (sigma = patch/5), clipped to the patch.
    Deterministic across runs; baked into the compiled kernel as a constant.
    """
    rng = np.random.RandomState(seed)
    pts = rng.randn(n_bits, 2, 2) * (PATCH / 5.0)
    return np.clip(np.round(pts), -PATCH_R + 1, PATCH_R - 1).astype(np.float32)


_PATTERN = _brief_pattern()

# Circular mask for the intensity-centroid moments.
_yy, _xx = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
_CIRC_MASK = ((_xx**2 + _yy**2) <= PATCH_R**2 + 1).astype(np.float32)
_MOM_X = (_xx * _CIRC_MASK).astype(np.float32)
_MOM_Y = (_yy * _CIRC_MASK).astype(np.float32)


def level_shapes(cfg: EngineConfig) -> list[tuple[int, int]]:
    """Static (H, W) per pyramid level."""
    shapes = []
    for l in range(cfg.n_levels):
        s = cfg.scale_factor**l
        shapes.append((max(int(round(cfg.height / s)), 2 * BORDER + 8),
                       max(int(round(cfg.width / s)), 2 * BORDER + 8)))
    return shapes


def features_per_level(cfg: EngineConfig) -> list[int]:
    """Geometric split of n_features over levels (reference: ORBextractor ctor)."""
    inv = 1.0 / cfg.scale_factor
    total = (1 - inv) / (1 - inv**cfg.n_levels)
    counts = [int(round(cfg.n_features * total * inv**l)) for l in range(cfg.n_levels - 1)]
    counts.append(max(cfg.n_features - sum(counts), 1))
    return counts


# ---------------------------------------------------------------------------
# resize / blur as banded-matrix matmuls (MXU instead of gather)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_src: int, n_dst: int) -> np.ndarray:
    """[n_dst, n_src] triangle-filter (antialiased bilinear) resize operator.

    Matches ``jax.image.resize(..., method="bilinear")`` semantics: half-pixel
    centers, kernel radius max(1, src/dst), weights normalized per row.
    """
    scale = n_src / n_dst
    support = max(scale, 1.0)
    out = np.zeros((n_dst, n_src), np.float32)
    for i in range(n_dst):
        pos = (i + 0.5) * scale - 0.5
        j0 = int(math.floor(pos - support)) - 1
        for j in range(j0, j0 + int(2 * support) + 3):
            w = max(0.0, 1.0 - abs(j - pos) / support)
            if w > 0.0:
                out[i, min(max(j, 0), n_src - 1)] += w
        out[i] /= out[i].sum()
    return out


@functools.lru_cache(maxsize=None)
def _blur_matrix(n: int, sigma: float = 2.0, radius: int = 3) -> np.ndarray:
    """[n, n] banded Gaussian blur operator with edge clamping."""
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    out = np.zeros((n, n), np.float32)
    for off, w in zip(range(-radius, radius + 1), k):
        idx = np.clip(np.arange(n) + off, 0, n - 1)
        out[np.arange(n), idx] += w
    return out


def resize_bilinear(img: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Separable triangle-filter resize as two matmuls (MXU path)."""
    ry = jnp.asarray(_resize_matrix(img.shape[0], shape[0]))
    rx = jnp.asarray(_resize_matrix(img.shape[1], shape[1]))
    return jnp.einsum(
        "ih,hw,jw->ij", ry, img, rx, precision=_FAST_DOT
    )


def build_pyramid(img: jax.Array, cfg: EngineConfig) -> list[jax.Array]:
    """f32[H, W] -> list of per-level images (static shapes)."""
    levels = [img]
    shapes = level_shapes(cfg)
    for l in range(1, cfg.n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[l]))
    return levels


def gaussian_blur(img: jax.Array, sigma: float = 2.0, radius: int = 3) -> jax.Array:
    """Separable Gaussian blur via banded matmuls (reference blurs before
    descriptor sampling)."""
    by = jnp.asarray(_blur_matrix(img.shape[0], sigma, radius))
    bx = jnp.asarray(_blur_matrix(img.shape[1], sigma, radius))
    return jnp.einsum("ih,hw,jw->ij", by, img, bx, precision=_FAST_DOT)


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------


def fast_score(img: jax.Array) -> jax.Array:
    """FAST-9 corner score for every pixel (0 where not a corner at t=0).

    score = max over the 16 window starts of (min over 9 contiguous circle
    pixels of the signed center difference), evaluated for both bright and
    dark arcs. A pixel passes FAST at threshold t iff score > t.
    """
    H, W = img.shape
    p = jnp.pad(img, 3, mode="edge")
    neigh = jnp.stack(
        [p[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for dx, dy in _CIRCLE]
    )  # [16, H, W]
    diff = neigh - img[None]

    def run9_min(d):
        # min over 9 circularly-consecutive entries, for each of 16 starts
        m1 = d
        m2 = jnp.minimum(m1, jnp.roll(m1, -1, axis=0))
        m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
        m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
        m9 = jnp.minimum(m8, jnp.roll(m1, -8, axis=0))
        return jnp.max(m9, axis=0)

    bright = run9_min(diff)      # >0 iff some 9-arc is uniformly brighter
    dark = run9_min(-diff)
    return jnp.maximum(bright, dark)


def _nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression; keeps strict local maxima."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


def detect_level(
    img_l: jax.Array, n_take: int, th_fast: float, min_th_fast: float, cell: int = 16
):
    """Detect up to n_take FAST keypoints on one level with spatial uniformity.

    Returns (uv f32[n_take, 2] level coords, score f32[n_take], valid bool).
    Two-tier threshold as in the reference (iniThFAST with minThFAST fallback):
    per cell, high-threshold corners outrank low-threshold ones regardless of
    raw response, implemented as a score bonus instead of a second FAST pass.
    """
    H, W = img_l.shape
    from .kernels.fast import fast_nms_rank

    s = fast_nms_rank(img_l, float(min_th_fast), float(th_fast), BORDER)
    # per-cell top-k
    Hc, Wc = -(-H // cell), -(-W // cell)
    padded = jnp.zeros((Hc * cell, Wc * cell), s.dtype).at[:H, :W].set(s)
    cells = padded.reshape(Hc, cell, Wc, cell).transpose(0, 2, 1, 3).reshape(
        Hc * Wc, cell * cell
    )
    k = max(1, min(cell * cell, -(-2 * n_take // (Hc * Wc))))
    topv, topi = jax.lax.top_k(cells, k)  # [ncells, k]
    cy = (jnp.arange(Hc * Wc) // Wc)[:, None]
    cx = (jnp.arange(Hc * Wc) % Wc)[:, None]
    py = cy * cell + topi // cell
    px = cx * cell + topi % cell
    # global top-n among per-cell winners
    flatv = topv.reshape(-1)
    gv, gi = jax.lax.top_k(flatv, n_take)
    uv = jnp.stack([px.reshape(-1)[gi], py.reshape(-1)[gi]], axis=-1).astype(jnp.float32)
    valid = gv > 0.0
    score = jnp.where(gv > 1000.0, gv - 1000.0, gv)
    return uv, score, valid


# ---------------------------------------------------------------------------
# patch extraction / orientation / descriptors as matmuls
# ---------------------------------------------------------------------------


def _patch_onehots(uv: jax.Array, H: int, W: int):
    """Row/column one-hot selectors for 31x31 patches: ([N,31,H], [N,31,W])."""
    y0 = jnp.clip(uv[:, 1].astype(jnp.int32) - PATCH_R, 0, H - PATCH)
    x0 = jnp.clip(uv[:, 0].astype(jnp.int32) - PATCH_R, 0, W - PATCH)
    N = uv.shape[0]
    off = jnp.arange(PATCH, dtype=jnp.int32)
    hh = jax.lax.broadcasted_iota(jnp.int32, (N, PATCH, H), 2)
    ohy = (hh == (y0[:, None] + off)[:, :, None]).astype(jnp.float32)
    ww = jax.lax.broadcasted_iota(jnp.int32, (N, PATCH, W), 2)
    ohx = (ww == (x0[:, None] + off)[:, :, None]).astype(jnp.float32)
    return ohy, ohx


def _gather_patches(img: jax.Array, uv: jax.Array) -> jax.Array:
    """31x31 patches centered on integer keypoints: [N, 31, 31].

    One-hot einsum formulation: each patch row/column selection rides the MXU
    instead of TPU-hostile vmap'd dynamic slices (same clamping semantics).
    """
    ohy, ohx = _patch_onehots(uv, img.shape[0], img.shape[1])
    rows = jnp.einsum("nph,hw->npw", ohy, img, precision=_FAST_DOT)
    return jnp.einsum("npw,nqw->npq", rows, ohx, precision=_FAST_DOT)


def _gather_patches2(img_a: jax.Array, img_b: jax.Array, uv: jax.Array):
    """Patches from two same-shape images at shared keypoints (one-hot reuse)."""
    ohy, ohx = _patch_onehots(uv, img_a.shape[0], img_a.shape[1])
    both = jnp.stack([img_a, img_b])  # [2, H, W]
    rows = jnp.einsum("nph,chw->ncpw", ohy, both, precision=_FAST_DOT)
    pat = jnp.einsum("ncpw,nqw->ncpq", rows, ohx, precision=_FAST_DOT)
    return pat[:, 0], pat[:, 1]


def compute_orientation(patches: jax.Array) -> jax.Array:
    """Intensity-centroid angle per patch (reference: IC_Angle)."""
    m10 = jnp.einsum("nij,ij->n", patches, jnp.asarray(_MOM_X))
    m01 = jnp.einsum("nij,ij->n", patches, jnp.asarray(_MOM_Y))
    return jnp.arctan2(m01, m10)


@functools.lru_cache(maxsize=None)
def _desc_compare_matrix() -> np.ndarray:
    """[(N_ANGLE_BINS * 256), 961] {-1,0,+1} comparison operator.

    Row (b*256 + s) computes blur_patch[p2_rot] - blur_patch[p1_rot] for
    pattern pair s rotated by bin angle b; bit s = (result > 0), identical to
    comparing the two rotated samples (reference: computeOrbDescriptor with
    the ORB paper's 12-deg precomputed pattern tables).
    """
    D = np.zeros((N_ANGLE_BINS * 256, PATCH * PATCH), np.float32)
    x = _PATTERN[..., 0]  # [256, 2]
    y = _PATTERN[..., 1]
    for b in range(N_ANGLE_BINS):
        a = 2.0 * np.pi * b / N_ANGLE_BINS
        c, s = np.cos(a), np.sin(a)
        xi = np.clip(np.round(x * c - y * s) + PATCH_R, 0, PATCH - 1).astype(int)
        yi = np.clip(np.round(x * s + y * c) + PATCH_R, 0, PATCH - 1).astype(int)
        flat = yi * PATCH + xi  # [256, 2]
        rows = b * 256 + np.arange(256)
        # bit = (sample0 < sample1)  ==  (patch[p1] - patch[p0] > 0)
        np.add.at(D, (rows, flat[:, 1]), 1.0)
        np.add.at(D, (rows, flat[:, 0]), -1.0)
    return D


_BIT_WEIGHTS = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)


def compute_descriptors(patches_blur: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotated binary descriptors from blurred patches: u32[N, 8].

    Steered BRIEF with the angle discretized to 30 bins of 12 deg (the ORB
    paper's lookup-table scheme): all 30 rotated comparison sets evaluate as
    ONE [N, 961] x [961, 30*256] matmul (bf16 operands, f32 accumulation —
    a bit flips only when the two blurred samples differ by < ~1 intensity
    unit, which is below the sensor noise the descriptor already tolerates),
    then the keypoint's bin is picked by a one-hot contraction.
    """
    N = patches_blur.shape[0]
    D = jnp.asarray(_desc_compare_matrix().T.astype(jnp.bfloat16))  # [961, B*256]
    flat = patches_blur.reshape(N, PATCH * PATCH).astype(jnp.bfloat16)
    s_all = jax.lax.dot(
        flat, D, preferred_element_type=jnp.float32
    ).reshape(N, N_ANGLE_BINS, 256)
    # angle -> nearest bin (12 deg wrap)
    bin_f = angle * (N_ANGLE_BINS / (2.0 * np.pi))
    bins = jnp.mod(jnp.round(bin_f).astype(jnp.int32), N_ANGLE_BINS)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (N, N_ANGLE_BINS), 1) == bins[:, None]
    ).astype(jnp.float32)
    s = jnp.einsum("nbs,nb->ns", s_all, onehot, precision=_FAST_DOT)
    bits = (s > 0.0).astype(jnp.uint32)  # [N, 256]
    weights = jnp.asarray(_BIT_WEIGHTS)
    return jnp.einsum(
        "nkb,b->nk", bits.reshape(N, 8, 32), weights, preferred_element_type=jnp.uint32
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features_batch(imgs: jax.Array, cfg: EngineConfig) -> FrameArrays:
    """Batched frontend: f32[B, H, W] -> FrameArrays with leading batch dim.

    One dispatch for B frames — per-dispatch + transfer overhead on the TPU
    tunnel is a throughput bottleneck alongside the extraction itself
    (KERNELS.md).
    """
    if imgs.shape[1:] != (cfg.height, cfg.width):
        raise ValueError(
            f"image batch shape {imgs.shape} does not match config "
            f"({cfg.height}, {cfg.width})"
        )
    return jax.vmap(lambda im: _extract_one(im, cfg))(imgs)


def extract_features(img: jax.Array, cfg: EngineConfig) -> FrameArrays:
    """Full frontend: f32[H, W] grayscale in [0, 255] -> FrameArrays.

    Keypoint uv is in level-0 (full-resolution) pixel coordinates; octave is
    the pyramid level; desc is the packed 256-bit descriptor.

    Implemented as the B=1 case of ``extract_features_batch``: XLA compiles
    the vmapped graph in ~18 s, while the identical un-vmapped graph was
    measured at 800+ s of compile time on the TPU toolchain (the per-level
    banded matmuls trigger a pathological fusion search when the arrays
    carry no batch dimension).
    """
    if img.shape != (cfg.height, cfg.width):
        raise ValueError(
            f"image shape {img.shape} does not match config "
            f"({cfg.height}, {cfg.width})"
        )
    batch = extract_features_batch(img[None], cfg)
    return jax.tree_util.tree_map(lambda x: x[0], batch)


def _extract_one(img: jax.Array, cfg: EngineConfig) -> FrameArrays:
    """Frontend body for one image (always invoked under vmap — see above)."""
    img = img.astype(jnp.float32)
    pyr = build_pyramid(img, cfg)
    counts = features_per_level(cfg)
    all_uv, all_score, all_valid, all_oct = [], [], [], []
    all_praw, all_pblur = [], []
    for l in range(cfg.n_levels):
        img_l = pyr[l]
        uv, score, valid = detect_level(
            img_l, counts[l], float(cfg.ini_th_fast), float(cfg.min_th_fast)
        )
        blur_l = gaussian_blur(img_l)
        praw, pblur = _gather_patches2(img_l, blur_l, uv)
        scale = jnp.float32(cfg.scale_factor**l)
        all_uv.append(uv * scale)
        all_score.append(score)
        all_valid.append(valid)
        all_oct.append(jnp.full((uv.shape[0],), l, jnp.int32))
        all_praw.append(praw)
        all_pblur.append(pblur)

    uv = jnp.concatenate(all_uv)
    score = jnp.concatenate(all_score)
    valid = jnp.concatenate(all_valid)
    octv = jnp.concatenate(all_oct)
    # orientation + descriptors once over all levels (one big MXU matmul
    # amortizes the 30-bin comparison table read across the whole frame)
    praw = jnp.concatenate(all_praw)
    pblur = jnp.concatenate(all_pblur)
    ang = compute_orientation(praw)
    desc = compute_descriptors(pblur, ang)

    F = cfg.max_features
    n = uv.shape[0]
    if n < F:
        pad = F - n
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        score = jnp.pad(score, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        octv = jnp.pad(octv, (0, pad))
        ang = jnp.pad(ang, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
    elif n > F:
        # keep strongest
        _, keep = jax.lax.top_k(jnp.where(valid, score, -1.0), F)
        uv, score, valid = uv[keep], score[keep], valid[keep]
        octv, ang, desc = octv[keep], ang[keep], desc[keep]

    return FrameArrays(
        uv=uv,
        uv_raw=uv,
        response=score,
        octave=octv,
        angle=ang,
        desc=desc,
        valid=valid,
        u_right=-jnp.ones((F,), jnp.float32),
        depth=-jnp.ones((F,), jnp.float32),
    )
