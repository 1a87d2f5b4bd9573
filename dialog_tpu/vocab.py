"""Visual vocabulary + BoW place recognition, TPU-first.

Replaces DBoW2 and the keyframe database (canonical ``Thirdparty/DBoW2``,
``src/KeyFrameDatabase.cc`` — SURVEY.md §2.2): the hierarchical k-means tree
exists in the reference to make CPU quantization O(k·L); on TPU the fast
path is the opposite — a *flat* centroid table quantized by one batched
XOR+popcount argmin, and BoW scoring as a dense matrix product against all
keyframes' BoW vectors at once. The inverted index disappears: "which
keyframes share words with the query" is a single [K, W] @ [W] product.

The vocabulary is trained by binary k-medians (per-bit majority centroids)
on descriptors harvested from the running map — the reference instead ships
a 145 MB pre-trained text vocabulary with a ~10 s load (SURVEY.md §2.2
"ORB vocabulary blob").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    """Flat codebook, optionally with a coarse level for two-level lookup.

    The flat Hamming-argmin is one MXU matmul and stays the fast path up to
    ~32k words; at ORBvoc scale (the reference ships ~1M leaves — SURVEY.md
    §2.2) the [N, W] distance matrix stops being free, so ``build_two_level``
    adds a coarse quantizer: descriptors pick one of C0 coarse cells, then
    argmin only against that cell's ~W/C0 words (DBoW2's k=10/L=6 tree
    collapsed to two levels — the shallowest hierarchy that keeps every step
    a dense batched op). ``quantize`` auto-dispatches when the coarse level
    is present.
    """

    words: jax.Array    # u32[W, 8] binary centroids
    idf: jax.Array      # f32[W] inverse document frequency weights
    coarse: jax.Array | None = None      # u32[C0, 8] coarse centroids
    cell_words: jax.Array | None = None  # u32[C0, Fo, 8] per-cell words (padded)
    cell_ids: jax.Array | None = None    # i32[C0, Fo] padded slot -> word id


def _unpack_bits(desc: jax.Array) -> jax.Array:
    """u32[N, 8] -> f32[N, 256] bit matrix."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


def _pack_bits(bits: jax.Array) -> jax.Array:
    """f32/bool[N, 256] -> u32[N, 8]."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    weights = jnp.asarray(1 << np.arange(32, dtype=np.uint64), jnp.uint32)
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def _hamming(a: jax.Array, b: jax.Array) -> jax.Array:
    x = jax.lax.population_count(a[:, None, :] ^ b[None, :, :])
    return jnp.sum(x, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_words", "iters", "chunk"))
def train_vocab(
    desc: jax.Array,       # u32[N, 8] training descriptors
    valid: jax.Array,      # bool[N]
    key: jax.Array,
    n_words: int = 4096,
    iters: int = 8,
    chunk: int = 8192,
    init_words: jax.Array | None = None,
) -> Vocabulary:
    """Binary k-medians: assign by Hamming argmin, centroid = per-bit majority.

    Contraction-based: Hamming(a, b) = |a| + |b| - 2 a.b over unpacked bits,
    so the [N, W] distance matrix and the per-cluster bit sums are both MXU
    matmuls, chunked over N (the naive pairwise-popcount form materializes an
    [N, W, 8] tensor — gigabytes of HBM traffic at map scale — and the
    scatter-add centroid update serializes on TPU).

    ``init_words`` seeds the solve (an existing codebook for the doubling
    retrain, or any sample for a fresh train) — passing it keeps the jit
    signature identical across fresh trains and retrains, so a mid-sequence
    retrain never triggers a fresh multi-second compile.
    """
    N = desc.shape[0]
    if init_words is not None:
        words = init_words
    else:
        # init: random sample of valid descriptors
        p = valid.astype(jnp.float32)
        p = p / jnp.maximum(jnp.sum(p), 1.0)
        idx = jax.random.choice(key, N, (n_words,), replace=True, p=p)
        words = desc[idx]

    pad = (-N) % chunk
    desc_c = jnp.pad(desc, ((0, pad), (0, 0))).reshape(-1, chunk, 8)
    valid_c = jnp.pad(valid, (0, pad)).reshape(-1, chunk)

    def step(_, words):
        wbits = _unpack_bits(words)                      # [W, 256]
        wsum = jnp.sum(wbits, axis=-1)                   # [W]

        def chunk_body(carry, xs):
            ssum, cnt = carry
            dc, vc = xs
            b = _unpack_bits(dc)                         # [C, 256]
            # bf16 operands are exact here (0/1 bits; dot values <= 256 are
            # exactly representable) and run the MXU at its fast rate;
            # accumulation stays f32 via preferred_element_type
            dots = jnp.dot(
                b.astype(jnp.bfloat16), wbits.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )                                            # [C, W]  (MXU)
            d = jnp.sum(b, -1)[:, None] + wsum[None, :] - 2.0 * dots
            assign = jnp.argmin(d, axis=1)
            E = jax.nn.one_hot(assign, n_words, dtype=jnp.bfloat16)
            E = E * vc[:, None].astype(jnp.bfloat16)
            ssum = ssum + jnp.dot(
                E.T, b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )                                            # [W, 256] (MXU)
            cnt = cnt + jnp.sum(E.astype(jnp.float32), axis=0)
            return (ssum, cnt), None

        init = (jnp.zeros((n_words, 256)), jnp.zeros((n_words,)))
        (ssum, cnt), _ = jax.lax.scan(chunk_body, init, (desc_c, valid_c))
        maj = ssum > 0.5 * jnp.maximum(cnt, 1.0)[:, None]
        new_words = _pack_bits(maj)
        # keep old centroid for empty clusters
        return jnp.where((cnt > 0)[:, None], new_words, words)

    words = jax.lax.fori_loop(0, iters, step, words)
    return Vocabulary(words=words, idf=jnp.ones((n_words,), jnp.float32))


def build_two_level(
    vocab: Vocabulary, n_coarse: int = 64, fill: float = 1.3, seed: int = 0
) -> Vocabulary:
    """Attach a coarse level: k-medians over the WORD TABLE, balanced cells.

    Host-side, one-time (numpy): cluster the W words into ``n_coarse`` cells,
    cap each cell at Fo = ceil(fill * W / n_coarse) words (overflow words
    spill to their next-nearest cell with space), pad short cells by
    duplicating their first word — padded slots map back to a REAL word id
    through ``cell_ids``, so two-level quantization returns ids in the same
    flat word space (tf/idf/BoW code is unchanged).
    """
    words = np.ascontiguousarray(np.asarray(vocab.words))
    W = words.shape[0]
    C0 = min(n_coarse, W)
    Fo = int(np.ceil(fill * W / C0))
    rng = np.random.default_rng(seed)

    bits = np.unpackbits(
        words.view(np.uint8), axis=1, bitorder="little"
    ).astype(np.float32)                                  # [W, 256]
    # k-medians on words (few items: plain numpy loop is fine)
    cent = bits[rng.choice(W, C0, replace=False)]
    for _ in range(8):
        d = (
            bits.sum(1)[:, None] + cent.sum(1)[None, :] - 2.0 * bits @ cent.T
        )
        assign = np.argmin(d, axis=1)
        for c in range(C0):
            sel = assign == c
            if sel.any():
                cent[c] = (bits[sel].mean(0) > 0.5).astype(np.float32)
    d = bits.sum(1)[:, None] + cent.sum(1)[None, :] - 2.0 * bits @ cent.T
    order = np.argsort(d, axis=1)                         # word -> cell prefs

    members: list[list[int]] = [[] for _ in range(C0)]
    for w in np.argsort(d[np.arange(W), order[:, 0]]):    # confident first
        for c in order[w]:
            if len(members[c]) < Fo:
                members[c].append(int(w))
                break
    # empty cells adopt the word nearest their centroid (duplicate is fine)
    for c in range(C0):
        if not members[c]:
            members[c].append(int(np.argmin(d[:, c])))

    cell_ids = np.zeros((C0, Fo), np.int32)
    for c in range(C0):
        mem = members[c]
        cell_ids[c, : len(mem)] = mem
        cell_ids[c, len(mem):] = mem[0]                   # pad = duplicate
    cell_words = words[cell_ids]                          # [C0, Fo, 8]
    coarse = np.packbits(
        cent.astype(np.uint8), axis=1, bitorder="little"
    ).view(np.uint32)                                     # [C0, 8]
    return vocab._replace(
        coarse=jnp.asarray(coarse),
        cell_words=jnp.asarray(cell_words),
        cell_ids=jnp.asarray(cell_ids),
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def _quantize_two_level(
    vocab: Vocabulary, desc: jax.Array, valid: jax.Array, chunk: int = 2048
) -> jax.Array:
    """Coarse argmin -> fine argmin within the chosen cell: O(C0 + W/C0).

    The fine step gathers each descriptor's cell words ([n, Fo, 8]) and uses
    the pairwise popcount form — at chunk = 2048, Fo <= 1024 the tensor
    stays tens of MB, and the gather is rows of a small resident table.
    """
    N = desc.shape[0]
    W = vocab.words.shape[0]
    chunk = max(1, min(chunk, N))
    cbits = _unpack_bits(vocab.coarse)                    # [C0, 256]
    csum = jnp.sum(cbits, axis=-1)
    cb16 = cbits.astype(jnp.bfloat16).T

    pad = (-N) % chunk
    desc_c = jnp.pad(desc, ((0, pad), (0, 0))).reshape(-1, chunk, 8)

    def body(_, dc):
        b = _unpack_bits(dc)
        dots = jnp.dot(
            b.astype(jnp.bfloat16), cb16, preferred_element_type=jnp.float32
        )
        dcoarse = jnp.sum(b, -1)[:, None] + csum[None, :] - 2.0 * dots
        # top-2 coarse routing: boundary descriptors (whose true word sits
        # in the runner-up cell) dominate the top-1 scheme's error, and the
        # second cell only doubles the O(W/C0) fine step
        _, cells = jax.lax.top_k(-dcoarse, 2)             # [n, 2]
        cw = vocab.cell_words[cells]                      # [n, 2, Fo, 8]
        Fo = cw.shape[2]
        cw = cw.reshape(cw.shape[0], 2 * Fo, 8)
        dfine = jnp.sum(
            jax.lax.population_count(dc[:, None, :] ^ cw), axis=-1
        )                                                 # [n, 2*Fo]
        slot = jnp.argmin(dfine, axis=1)
        ids2 = vocab.cell_ids[cells].reshape(cw.shape[0], 2 * Fo)
        return None, jnp.take_along_axis(ids2, slot[:, None], axis=1)[:, 0]

    _, wid = jax.lax.scan(body, None, desc_c)
    wid = wid.reshape(-1)[:N].astype(jnp.int32)
    return jnp.where(valid, wid, W)


def quantize(
    vocab: Vocabulary, desc: jax.Array, valid: jax.Array, chunk: int = 8192
) -> jax.Array:
    """Descriptors -> word ids (W = invalid sentinel).

    Dispatches to the two-level path when the vocabulary carries a coarse
    level (``build_two_level``); otherwise one batched flat argmin.
    """
    if vocab.coarse is not None:
        return _quantize_two_level(vocab, desc, valid)
    return _quantize_flat(vocab, desc, valid, chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _quantize_flat(
    vocab: Vocabulary, desc: jax.Array, valid: jax.Array, chunk: int = 8192
) -> jax.Array:
    """One batched flat argmin over the whole word table.

    Contraction form: Hamming(a, w) = |a| + |w| - 2 a.w over unpacked bits,
    so the [N, W] distance matrix is one (chunked) bf16 MXU matmul — the
    pairwise-popcount form materializes an [N, W, 8] tensor, which at
    whole-map sizes (N = K*F) is gigabytes. bf16 is exact here: operands
    are 0/1 and dot values <= 256.
    """
    N = desc.shape[0]
    chunk = max(1, min(chunk, N))   # static: no padding waste on small inputs
    W = vocab.words.shape[0]
    wbits = _unpack_bits(vocab.words)                    # [W, 256]
    wsum = jnp.sum(wbits, axis=-1)
    wb16 = wbits.astype(jnp.bfloat16).T

    pad = (-N) % chunk
    desc_c = jnp.pad(desc, ((0, pad), (0, 0))).reshape(-1, chunk, 8)

    def body(_, dc):
        b = _unpack_bits(dc)
        dots = jnp.dot(
            b.astype(jnp.bfloat16), wb16, preferred_element_type=jnp.float32
        )
        d = jnp.sum(b, -1)[:, None] + wsum[None, :] - 2.0 * dots
        return None, jnp.argmin(d, axis=1).astype(jnp.int32)

    _, wid = jax.lax.scan(body, None, desc_c)
    wid = wid.reshape(-1)[:N]
    return jnp.where(valid, wid, W)


@jax.jit
def bow_db_rows(vocab: Vocabulary, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """BoW rows for every keyframe in one pass.

    desc u32[K, F, 8], valid bool[K, F] -> f32[K, W] l1-normalized tf-idf.
    Replaces a per-keyframe host loop over ``bow_vector`` when the whole
    database is rebuilt (vocabulary retrain): one quantize sweep + one
    scatter-add histogram.
    """
    K, F, _ = desc.shape
    W = vocab.words.shape[0]
    wid = quantize(vocab, desc.reshape(K * F, 8), valid.reshape(K * F))
    doc = jnp.repeat(jnp.arange(K, dtype=jnp.int32), F)
    flat = doc * (W + 1) + wid
    tf = jnp.zeros((K * (W + 1),)).at[flat].add(1.0).reshape(K, W + 1)[:, :W]
    v = tf * vocab.idf[None, :]
    return v / jnp.maximum(jnp.sum(jnp.abs(v), axis=1, keepdims=True), 1e-9)


@jax.jit
def bow_vector(vocab: Vocabulary, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """l1-normalized tf-idf BoW vector f32[W]."""
    W = vocab.words.shape[0]
    wid = quantize(vocab, desc, valid)
    tf = jnp.zeros((W + 1,)).at[wid].add(1.0)[:W]
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


@jax.jit
def bow_l1_scores(q: jax.Array, db: jax.Array) -> jax.Array:
    """DBoW2 l1 score of query q [W] against db rows [K, W]: in [0, 1].

    s(v, w) = 1 - 0.5 * sum |v_i - w_i|  for l1-normalized vectors
            = 0.5 * sum (|v| + |w| - |v - w|)   (reference scoring form).
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(q[None, :] - db), axis=-1)


def load_dbow2_text(path: str, max_words: int | None = None) -> Vocabulary:
    """Convert a DBoW2 text vocabulary (ORBvoc.txt format) to a flat codebook.

    Uses the native C++ parser when available (the reference's own load of
    this file takes ~10 s); Python fallback otherwise. Leaf-node descriptors
    become the centroid table; leaf weights become idf. ``max_words`` keeps
    the highest-weight leaves (the flat Hamming argmin is O(W) per
    descriptor — the full 1M-leaf table is fine on TPU, but CPU tests want
    a small cut).
    """
    from . import native

    with open(path, "rb") as f:
        buf = f.read()

    lib = native.load_voc_parser()
    if lib is not None:
        import ctypes

        hdr = lib._VocHeader()
        rc = lib.voc_scan(buf, len(buf), ctypes.byref(hdr))
        if rc != 0:
            raise ValueError(f"not a DBoW2 text vocabulary (rc={rc})")
        n = hdr.n_nodes
        parent = np.empty(n, np.int32)
        is_leaf = np.empty(n, np.uint8)
        desc = np.empty((n, 32), np.uint8)
        weight = np.empty(n, np.float64)
        rc = lib.voc_parse(
            buf, len(buf), n,
            parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            is_leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            weight.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise ValueError("vocabulary parse failed")
    else:  # pure-Python fallback
        vals = buf.split()
        n = (len(vals) - 4) // 35
        rows = np.array(vals[4 : 4 + n * 35], dtype=object).reshape(n, 35)
        parent = rows[:, 0].astype(np.int32)
        is_leaf = rows[:, 1].astype(np.uint8)
        desc = rows[:, 2:34].astype(np.uint8)
        weight = rows[:, 34].astype(np.float64)

    leaves = is_leaf > 0
    d = desc[leaves]
    w = weight[leaves].astype(np.float32)
    if max_words is not None and len(d) > max_words:
        keep = np.argsort(-w)[:max_words]
        d, w = d[keep], w[keep]
    words = jnp.asarray(
        d.reshape(len(d), 8, 4).view(np.uint32).reshape(len(d), 8)
    )
    return Vocabulary(words=words, idf=jnp.asarray(np.maximum(w, 1e-6)))


def compute_idf(
    vocab: Vocabulary,
    word_ids: jax.Array,
    doc_ids: jax.Array,
    n_docs: int,
    n_live=None,
) -> Vocabulary:
    """Refresh idf from a corpus: idf_w = log(n_live / (1 + df_w)).

    ``n_docs`` is the (static, shape-determining) document-slot capacity;
    ``n_live`` the live document count used in the idf formula — the
    reference's df/N uses the live corpus size, and passing capacity here
    inflated idf early in a run (ADVICE r4). May be a traced scalar so a
    growing corpus never recompiles. (doc, word) pairs fit i32 at engine
    scales: n_docs <= max_keyframes (2048 in the KITTI00 preset) times W+1
    (vocab_words+1) stays far below 2^31.
    """
    W = vocab.words.shape[0]
    pair = doc_ids.astype(jnp.int32) * (W + 1) + word_ids.astype(jnp.int32)
    uniq = jnp.zeros(((n_docs) * (W + 1) + W + 1,), bool).at[pair].set(True)
    df = jnp.sum(uniq.reshape(-1, W + 1), axis=0)[:W].astype(jnp.float32)
    n = jnp.float32(n_docs) if n_live is None else n_live.astype(jnp.float32)
    idf = jnp.log(jnp.maximum(n, 1.0) / (1.0 + df))
    return vocab._replace(idf=jnp.maximum(idf, 0.0))
