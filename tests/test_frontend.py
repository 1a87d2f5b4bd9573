"""Frontend + matching tests (SURVEY.md §7.6: kernel-vs-oracle parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dialog_tpu import frontend, matching
from dialog_tpu.config import EngineConfig

CFG = EngineConfig(width=320, height=240, n_features=400, max_features=512, n_levels=4)


def synth_image(seed=0, w=320, h=240, n_dots=120):
    """Random bright dots on a dark gradient: plenty of FAST corners."""
    rng = np.random.default_rng(seed)
    img = np.tile(np.linspace(20, 60, w, dtype=np.float32), (h, 1))
    ys = rng.integers(20, h - 20, n_dots)
    xs = rng.integers(20, w - 20, n_dots)
    for y, x in zip(ys, xs):
        sz = rng.integers(2, 6)
        img[y : y + sz, x : x + sz] = 200.0 + rng.uniform(-30, 30)
    return img


class TestFast:
    def test_fast_score_fires_on_corner(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[30:40, 30:40] = 200.0  # bright square: corners are FAST corners
        s = np.asarray(frontend.fast_score(jnp.asarray(img)))
        assert s[30, 30] > 20.0  # corner pixel
        assert s[35, 35] == pytest.approx(0.0, abs=1e-3)  # interior flat
        assert s[5, 5] == pytest.approx(0.0, abs=1e-3)    # background flat

    def test_fast_score_no_edge_response(self):
        # Straight edge: no 9-contiguous arc is uniformly brighter/darker.
        img = np.full((64, 64), 50.0, np.float32)
        img[:, 32:] = 200.0
        s = np.asarray(frontend.fast_score(jnp.asarray(img)))
        assert float(s[32, 31]) <= 1.0 and float(s[32, 33]) <= 1.0

    def test_matches_opencv_fast(self):
        cv2 = pytest.importorskip("cv2")
        img = synth_image()
        kps = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True
        ).detect(img.astype(np.uint8))
        ours = np.asarray(frontend.fast_score(jnp.asarray(img)))
        # every strong OpenCV corner should have nonzero score nearby
        hit = 0
        for kp in kps:
            x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
            if ours[max(0, y - 1) : y + 2, max(0, x - 1) : x + 2].max() > 20:
                hit += 1
        assert hit / max(len(kps), 1) > 0.9


class TestDetect:
    def test_extract_shapes_and_validity(self):
        fr = frontend.extract_features(jnp.asarray(synth_image()), CFG)
        assert fr.uv.shape == (CFG.max_features, 2)
        n_valid = int(np.sum(np.asarray(fr.valid)))
        assert n_valid > 100
        uv = np.asarray(fr.uv)[np.asarray(fr.valid)]
        assert uv[:, 0].min() >= 0 and uv[:, 0].max() < CFG.width
        assert uv[:, 1].min() >= 0 and uv[:, 1].max() < CFG.height

    def test_spatial_uniformity(self):
        # per-cell top-k should spread detections over the image quadrants
        fr = frontend.extract_features(jnp.asarray(synth_image(3)), CFG)
        uv = np.asarray(fr.uv)[np.asarray(fr.valid)]
        qx = (uv[:, 0] > CFG.width / 2).astype(int)
        qy = (uv[:, 1] > CFG.height / 2).astype(int)
        counts = np.bincount(qy * 2 + qx, minlength=4)
        assert counts.min() > 0.08 * counts.sum()


class TestDescriptors:
    def test_rotation_invariant_matching(self):
        """Rotate the image 25 deg; descriptors should still match (steered BRIEF)."""
        cv2 = pytest.importorskip("cv2")
        img = synth_image(1)
        h, w = img.shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), 25.0, 1.0)
        rot = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)

        fa = frontend.extract_features(jnp.asarray(img), CFG)
        fb = frontend.extract_features(jnp.asarray(rot), CFG)
        dist = matching.hamming_distance_matrix(fa.desc, fb.desc)
        mb, _ = matching.match_mutual(dist, fa.valid, fb.valid, max_dist=60, ratio=0.85)
        mb = np.asarray(mb)
        ok = mb >= 0
        assert ok.sum() > 30
        # verify matched geometry against the known rotation
        uva = np.asarray(fa.uv)[ok]
        uvb = np.asarray(fb.uv)[mb[ok]]
        pred = (M @ np.concatenate([uva, np.ones((len(uva), 1))], 1).T).T
        err = np.linalg.norm(pred - uvb, axis=1)
        assert np.median(err) < 2.0


class TestHamming:
    def test_distance_matrix_vs_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (24, 8), dtype=np.uint32)
        d = np.asarray(matching.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        exp = np.zeros((16, 24), np.int32)
        for i in range(16):
            for j in range(24):
                exp[i, j] = bin(
                    int.from_bytes(a[i].tobytes(), "little")
                    ^ int.from_bytes(b[j].tobytes(), "little")
                ).count("1")
        np.testing.assert_array_equal(d, exp)

    def test_mutual_match_simple(self):
        a = np.zeros((3, 8), np.uint32)
        a[0, 0] = 0b1111
        a[1, 0] = 0b11110000
        a[2, 0] = 0xFFFF0000
        b = a[[1, 0, 2]]  # permuted copies
        d = matching.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b))
        mb, bd = matching.match_mutual(
            d, jnp.ones(3, bool), jnp.ones(3, bool), max_dist=5, ratio=1.0
        )
        np.testing.assert_array_equal(np.asarray(mb), [1, 0, 2])
        np.testing.assert_array_equal(np.asarray(bd), [0, 0, 0])

    def test_window_gating(self):
        # identical descriptors but far apart -> gated out
        desc = np.zeros((2, 8), np.uint32)
        uva = np.array([[10.0, 10.0], [100.0, 100.0]], np.float32)
        uvb = np.array([[12.0, 10.0], [200.0, 200.0]], np.float32)
        mb, _ = matching.match_window(
            jnp.asarray(desc), jnp.asarray(uva), jnp.ones(2, bool),
            jnp.asarray(desc), jnp.asarray(uvb), jnp.ones(2, bool),
            radius=15.0, max_dist=50, ratio=1.0,
        )
        mb = np.asarray(mb)
        assert mb[0] == 0 and mb[1] == -1
