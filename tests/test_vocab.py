"""Vocabulary: training, quantization, BoW scoring, DBoW2-format loading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dialog_tpu import vocab


def _clustered_descs(n_clusters=32, per=20, flips=4, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.integers(0, 2**32, (n_clusters, 8), dtype=np.uint32)
    out, labels = [], []
    for c in range(n_clusters):
        for _ in range(per):
            d = centers[c].copy()
            for _ in range(flips):
                w, b = rng.integers(0, 8), rng.integers(0, 32)
                d[w] ^= np.uint32(1 << b)
            out.append(d)
            labels.append(c)
    return np.stack(out), np.array(labels), centers


class TestTrainQuantize:
    def test_clusters_recovered(self):
        desc, labels, _ = _clustered_descs()
        v = vocab.train_vocab(
            jnp.asarray(desc), jnp.ones(len(desc), bool),
            jax.random.PRNGKey(0), n_words=64, iters=10,
        )
        wid = np.asarray(vocab.quantize(v, jnp.asarray(desc), jnp.ones(len(desc), bool)))
        # same-cluster descriptors should map to the same word most of the time
        agree = 0
        for c in np.unique(labels):
            ids = wid[labels == c]
            agree += (ids == np.bincount(ids).argmax()).mean()
        assert agree / len(np.unique(labels)) > 0.9

    def test_bow_similarity_discriminates(self):
        desc, labels, _ = _clustered_descs(seed=1)
        v = vocab.train_vocab(
            jnp.asarray(desc), jnp.ones(len(desc), bool),
            jax.random.PRNGKey(1), n_words=64, iters=8,
        )
        d1 = jnp.asarray(desc[:200])
        d2 = jnp.asarray(desc[:200])     # same content
        d3 = jnp.asarray(_clustered_descs(seed=9)[0][:200])  # different scene
        ones = jnp.ones(200, bool)
        v1 = vocab.bow_vector(v, d1, ones)
        db = jnp.stack([vocab.bow_vector(v, d2, ones), vocab.bow_vector(v, d3, ones)])
        s = np.asarray(vocab.bow_l1_scores(v1, db))
        assert s[0] > 0.95 and s[0] > s[1] + 0.3


class TestDBoW2Loader:
    def _write_voc(self, path, k=3, L=2, seed=0):
        """Small synthetic vocabulary in the DBoW2 text format."""
        rng = np.random.default_rng(seed)
        lines = [f"{k} {L} 0 0"]
        # level-1 nodes (children of root=0), then leaves
        n_l1 = k
        for i in range(n_l1):
            d = rng.integers(0, 256, 32)
            lines.append("0 0 " + " ".join(map(str, d)) + " 0")
        for i in range(n_l1 * k):
            d = rng.integers(0, 256, 32)
            w = rng.uniform(0.1, 2.0)
            lines.append(f"{1 + i // k} 1 " + " ".join(map(str, d)) + f" {w:.6f}")
        open(path, "w").write("\n".join(lines) + "\n")
        return k * k  # leaf count

    def test_load_native_and_fallback_agree(self, tmp_path):
        p = str(tmp_path / "voc.txt")
        n_leaves = self._write_voc(p)
        v = vocab.load_dbow2_text(p)
        assert v.words.shape == (n_leaves, 8)
        assert v.idf.shape == (n_leaves,)
        # force the Python fallback and compare
        from dialog_tpu import native

        orig = native.load_voc_parser
        native.load_voc_parser = lambda: None
        try:
            v2 = vocab.load_dbow2_text(p)
        finally:
            native.load_voc_parser = orig
        np.testing.assert_array_equal(np.asarray(v.words), np.asarray(v2.words))
        np.testing.assert_allclose(np.asarray(v.idf), np.asarray(v2.idf), rtol=1e-5)

    def test_max_words_cut(self, tmp_path):
        p = str(tmp_path / "voc.txt")
        self._write_voc(p, seed=2)
        v = vocab.load_dbow2_text(p, max_words=4)
        assert v.words.shape == (4, 8)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.txt")
        open(p, "w").write("this is not a vocabulary\n")
        with pytest.raises(ValueError):
            vocab.load_dbow2_text(p)
