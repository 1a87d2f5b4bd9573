"""Map container tests: allocation, covisibility, obs counting, checkpoint."""

import numpy as np
import jax.numpy as jnp

from dialog_tpu import containers as C
from dialog_tpu.config import EngineConfig

CFG = EngineConfig(max_keyframes=8, max_features=16, max_landmarks=64)


def small_map_with_obs():
    """3 keyframes; kf0 sees lms 0..7, kf1 sees 4..11, kf2 sees 10..13."""
    m = C.empty_map(CFG)
    kfs = m.kfs
    kfs = kfs._replace(valid=kfs.valid.at[:3].set(True))

    def set_obs(kfs, k, lm_ids):
        n = len(lm_ids)
        obs = kfs.obs_lm.at[k, :n].set(jnp.asarray(lm_ids, jnp.int32))
        fv = kfs.feat_valid.at[k, :n].set(True)
        return kfs._replace(obs_lm=obs, feat_valid=fv)

    kfs = set_obs(kfs, 0, list(range(0, 8)))
    kfs = set_obs(kfs, 1, list(range(4, 12)))
    kfs = set_obs(kfs, 2, list(range(10, 14)))
    lms = m.lms._replace(valid=m.lms.valid.at[:14].set(True))
    return m._replace(kfs=kfs, lms=lms, num_kfs=jnp.asarray(3), num_lms=jnp.asarray(14))


def test_empty_map_shapes():
    m = C.empty_map(CFG)
    assert m.kfs.R.shape == (8, 3, 3)
    assert m.kfs.obs_lm.shape == (8, 16)
    assert m.lms.xyz.shape == (64, 3)
    assert m.covis.shape == (8, 8)
    assert not bool(m.kfs.valid.any())


def test_first_free_kf_slot():
    m = C.empty_map(CFG)
    assert int(C.first_free_kf_slot(m)) == 0
    m = m._replace(kfs=m.kfs._replace(valid=m.kfs.valid.at[0].set(True).at[1].set(True)))
    assert int(C.first_free_kf_slot(m)) == 2


def test_free_lm_slots_skips_alive():
    m = C.empty_map(CFG)
    lms = m.lms._replace(valid=m.lms.valid.at[jnp.asarray([0, 2, 3])].set(True))
    m = m._replace(lms=lms)
    slots = np.asarray(C.free_lm_slots(m, 4))
    np.testing.assert_array_equal(slots, [1, 4, 5, 6])
    assert int(C.lm_capacity_left(m)) == 61


def test_covis_row():
    m = small_map_with_obs()
    w0 = np.asarray(C.covis_row_for_kf(m, jnp.asarray(0)))
    # kf0 & kf1 share lms 4..7 -> 4; kf0 & kf2 share none.
    assert w0[1] == 4
    assert w0[2] == 0
    assert w0[0] == 0  # self excluded
    w1 = np.asarray(C.covis_row_for_kf(m, jnp.asarray(1)))
    assert w1[0] == 4
    assert w1[2] == 2  # lms 10, 11


def test_update_covis_symmetry():
    m = small_map_with_obs()
    m = C.update_covis_for_kf(m, jnp.asarray(1))
    cv = np.asarray(m.covis)
    np.testing.assert_array_equal(cv[1, :], cv[:, 1])
    assert cv[1, 0] == 4 and cv[1, 2] == 2


def test_recount_lm_obs():
    m = small_map_with_obs()
    m = C.recount_lm_obs(m)
    n = np.asarray(m.lms.n_obs)
    assert n[0] == 1          # only kf0
    assert n[5] == 2          # kf0 + kf1
    assert n[11] == 2         # kf1 + kf2
    assert n[13] == 1         # kf2 only
    assert n[14] == 0


def test_save_load_roundtrip(tmp_path):
    m = small_map_with_obs()
    p = str(tmp_path / "map.npz")
    C.save_map(m, p)
    m2 = C.load_map(CFG, p)
    np.testing.assert_array_equal(np.asarray(m2.kfs.obs_lm), np.asarray(m.kfs.obs_lm))
    np.testing.assert_array_equal(np.asarray(m2.lms.valid), np.asarray(m.lms.valid))
    assert int(m2.num_kfs) == 3
