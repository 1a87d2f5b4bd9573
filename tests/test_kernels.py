"""Pallas kernel parity tests (CPU runs the jnp reference path; the Pallas
path is exercised on TPU via bench/driver runs — SURVEY.md §7.6)."""

import numpy as np
import jax.numpy as jnp

from dialog_tpu.kernels.hamming import hamming_best2, _reference, MAX_DIST


def _rand(n, m, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (m, 8), dtype=np.uint32)
    return jnp.asarray(a), jnp.asarray(b)


class TestHammingBest2:
    def test_best_and_second(self):
        a, b = _rand(64, 96)
        va = jnp.ones(64, bool)
        vb = jnp.ones(96, bool)
        idx, best, second = hamming_best2(a, b, va, vb)
        # oracle
        d = np.zeros((64, 96), np.int32)
        an, bn = np.asarray(a), np.asarray(b)
        for i in range(64):
            for j in range(96):
                d[i, j] = bin(
                    int.from_bytes(an[i].tobytes(), "little")
                    ^ int.from_bytes(bn[j].tobytes(), "little")
                ).count("1")
        np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
        np.testing.assert_array_equal(np.asarray(best), d.min(1))
        d2 = d.copy()
        d2[np.arange(64), d.argmin(1)] = 10**6
        np.testing.assert_array_equal(np.asarray(second), d2.min(1))

    def test_validity_gate(self):
        a, b = _rand(16, 16, seed=1)
        va = jnp.zeros(16, bool).at[3].set(True)
        vb = jnp.ones(16, bool).at[5].set(False)
        idx, best, _ = hamming_best2(a, b, va, vb)
        idx = np.asarray(idx)
        assert (idx[np.arange(16) != 3] == -1).all()
        assert idx[3] != 5 and idx[3] >= 0

    def test_spatial_gate(self):
        a, _ = _rand(4, 4, seed=2)
        b = a  # identical descriptors
        uv_a = jnp.asarray(np.array([[0, 0], [100, 0], [0, 100], [50, 50]], np.float32))
        uv_b = uv_a + 30.0
        r2 = jnp.full((4,), 45.0**2)
        idx, best, _ = hamming_best2(
            a, b, jnp.ones(4, bool), jnp.ones(4, bool), uv_a, uv_b, r2
        )
        np.testing.assert_array_equal(np.asarray(idx), np.arange(4))
        np.testing.assert_array_equal(np.asarray(best), np.zeros(4))
        # shrink the radius: nothing within range
        idx2, _, _ = hamming_best2(
            a, b, jnp.ones(4, bool), jnp.ones(4, bool), uv_a, uv_b,
            jnp.full((4,), 10.0**2),
        )
        assert (np.asarray(idx2) == -1).all()


class TestPallasInterpret:
    """Run the actual Pallas kernel bodies under the interpreter on CPU, so
    both codepaths (kernel + jnp reference) are covered by default pytest
    (the TPU gate is `python -m dialog_tpu.kernels.selfcheck` on hardware)."""

    def test_hamming_kernel_matches_reference(self, monkeypatch):
        monkeypatch.setenv("DIALOG_TPU_PALLAS_INTERPRET", "1")
        from dialog_tpu.kernels import selfcheck

        res = selfcheck.check_hamming(n=300, m=400)
        assert all(res.values()), res

    def test_fast_kernel_matches_reference(self, monkeypatch):
        monkeypatch.setenv("DIALOG_TPU_PALLAS_INTERPRET", "1")
        from dialog_tpu.kernels import selfcheck

        res = selfcheck.check_fast(h=96, w=150)
        assert all(res.values()), res

    def test_schur_kernel_matches_einsum_path(self, monkeypatch):
        # the fused Jacobian/Schur reduction must reproduce the einsum
        # reduction through the full solve (tolerance: f32 order effects)
        monkeypatch.setenv("DIALOG_TPU_PALLAS_INTERPRET", "1")
        from dialog_tpu.kernels import selfcheck

        res = selfcheck.check_schur()
        assert all(res.values()), res

    def test_hamming_tiebreak_lowest_index(self, monkeypatch):
        # equal-distance ties must resolve to the LOWEST column index on
        # every backend (jnp.argmin first-occurrence semantics); this was
        # the round-3 on-TPU selfcheck failure
        monkeypatch.setenv("DIALOG_TPU_PALLAS_INTERPRET", "1")
        a, _ = _rand(8, 8, seed=7)
        b = jnp.concatenate([a, a], axis=0)  # every row has a 2-way tie
        idx, best, second = hamming_best2(
            a, b, jnp.ones(8, bool), jnp.ones(16, bool)
        )
        np.testing.assert_array_equal(np.asarray(idx), np.arange(8))
        np.testing.assert_array_equal(np.asarray(best), np.zeros(8))
        np.testing.assert_array_equal(np.asarray(second), np.zeros(8))
