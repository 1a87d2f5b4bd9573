"""Loop detection and closure.

Replaces the reference's loop-closing thread (canonical
``src/LoopClosing.cc`` — SURVEY.md §2.1/§3.4), run synchronously per
keyframe: BoW candidate retrieval (one matrix product against the keyframe
BoW database), the 3-consecutive covisibility-consistency gate, batched Horn
Sim3 RANSAC between the two ends, Sim3 propagation, essential-graph pose
optimization, and landmark correction. The transient global-BA thread of the
reference becomes an optional synchronous refinement.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack_detect(m, bow_db, cur_kf):
    """BoW scores vs all KFs + covisibility row + validity + seq + shared-
    word counts (one vector), plus the boolean covisibility-adjacency matrix
    the host consistency check needs. Both are D2H-copied asynchronously at
    dispatch time so the later evaluate() never pays the tunnel RTT
    (KERNELS.md: a blocking pull costs ~32 ms; an async copy resolved a
    batch later costs ~0)."""
    from . import vocab as _vocab

    scores = _vocab.bow_l1_scores(bow_db[cur_kf], bow_db)
    # common-word counts (reference: DetectLoopCandidates' shared-word pass
    # over the inverted index — here one boolean matvec)
    q_has = (bow_db[cur_kf] > 0).astype(jnp.float32)
    common = jnp.dot((bow_db > 0).astype(jnp.float32), q_has)
    vec = jnp.concatenate(
        [
            scores,
            m.covis[cur_kf].astype(jnp.float32),
            m.kfs.valid.astype(jnp.float32),
            # insertion numbers: slot indices stop being age-ordered once
            # culled slots are recycled, so the "too recent" gate keys on seq
            m.kfs.seq.astype(jnp.float32),
            common,
        ]
    )
    neigh = (m.covis > 0) & m.kfs.valid[None, :]
    return vec, neigh.astype(jnp.uint8)

from . import geometry as geo
from . import matching
from .config import EngineConfig
from .containers import MapState
from .sim3 import solve_sim3_ransac
from .optim.pose_graph import (
    build_pose_graph,
    solve_pose_graph,
    apply_pose_graph_correction,
)

import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def _guided_sim3_matches(m, cur_kf, cand_kf, s21, R21, t21, cfg):
    """Count cur-feature <-> cand-landmark matches under a refined Sim3.

    Reference: ``ORBmatcher::SearchBySim3`` — the candidate keyframe's
    landmarks are mapped through S21^-1 into the current camera and
    projected; descriptor matching in a window then recovers
    correspondences the BoW pass missed. The final acceptance gate
    (``LoopClosing::ComputeSim3``'s >= 40 total matches) runs on this
    count, which subsumes the RANSAC/refine inliers: with the refined
    transform every true inlier reprojects inside the window.
    """
    kfs, lms = m.kfs, m.lms
    L = lms.xyz.shape[0]
    obs_k = kfs.obs_lm[cand_kf]
    ok_k = (
        kfs.feat_valid[cand_kf]
        & (obs_k >= 0)
        & lms.valid[jnp.clip(obs_k, 0, L - 1)]
    )
    ids = jnp.clip(obs_k, 0, L - 1)
    X_w = lms.xyz[ids]
    # world -> cand camera -> (Sim3 inverse) -> predicted cur camera
    Xk = geo.se3_apply(kfs.R[cand_kf], kfs.t[cand_kf], X_w)
    s12, R12, t12 = geo.sim3_inv(s21, R21, t21)
    X1 = geo.sim3_apply(s12, R12, t12, Xk)
    uv_pred, z = geo.project(
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32), X1,
        cfg.fx, cfg.fy, cfg.cx, cfg.cy,
    )
    vis = (
        ok_k
        & (z > 1e-3)
        & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < cfg.width)
        & (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < cfg.height)
    )
    match_ft, _ = matching.match_projected(
        lms.desc[ids], uv_pred, vis, kfs.octave[cand_kf],
        kfs.desc[cur_kf], kfs.uv[cur_kf], kfs.feat_valid[cur_kf],
        kfs.octave[cur_kf],
        radius=8.0, scale_factor=cfg.scale_factor,
        max_dist=cfg.th_high, ratio=1.0, octave_band=2,
    )
    return jnp.sum((match_ft >= 0).astype(jnp.int32))


@dataclasses.dataclass
class LoopCandidate:
    cand_kf: int
    s: float            # S21: cur-cam -> cand-cam similarity
    R: np.ndarray
    t: np.ndarray
    n_inliers: int


class LoopCloser:
    """Host-side consistency bookkeeping + device-step orchestration."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        # list of (group_set, count) from previous keyframes
        self._consistent: list[tuple[set[int], int]] = []
        self.closed_loops: list[tuple[int, int]] = []
        # monotonic insertion stamps (kf_count at dispatch), NOT slot ids:
        # slot recycling makes slot numbers unusable for "how long ago"
        self._last_loop_stamp = -(10**9)
        self._eval_stamp = -(10**9)
        self.last_eval_det_seq: int | None = None
        # detection dispatched at the previous keyframe, evaluated at the
        # next one (reference: LoopClosing runs on its own thread, one KF
        # behind; here the lag hides the device->host pull behind a full
        # keyframe of tracking instead of stalling the resolve path)
        self._pending_detect: tuple[int, jax.Array, jax.Array, int] | None = None

    # --- detection (reference: LoopClosing::DetectLoop) -----------------

    def dispatch(
        self, m: MapState, bow_db, vocab, cur_kf: int, stamp: int | None = None
    ) -> None:
        """Queue detection for `cur_kf` (device work only, no blocking pull).

        `stamp` is a monotonic insertion counter (the engine's kf_count);
        it gates the post-closure cooldown. Defaults to `cur_kf` for callers
        that never recycle slots."""
        if stamp is None:
            stamp = cur_kf
        if (
            bow_db is not None
            and vocab is not None
            and stamp - self._last_loop_stamp >= 10
        ):
            vec, neigh = _pack_detect(m, bow_db, jnp.int32(cur_kf))
            vec.copy_to_host_async()
            neigh.copy_to_host_async()
            self._pending_detect = (cur_kf, vec, neigh, stamp)

    def take_pending(self) -> tuple[int, jax.Array, jax.Array, int] | None:
        """Hand the pending detection to a caller that will pull it fused
        with another transfer (the batch resolve path)."""
        prev = self._pending_detect
        self._pending_detect = None
        return prev

    def detect(
        self, m: MapState, bow_db, vocab, cur_kf: int, stamp: int | None = None
    ) -> tuple[int, list[tuple[int, int]]]:
        """Dispatch detection for `cur_kf`; evaluate + return the previous
        keyframe's detection as (that_kf, [(candidate_slot, seq), ...])."""
        prev = self.take_pending()
        self.dispatch(m, bow_db, vocab, cur_kf, stamp=stamp)
        if prev is None:
            return -1, []
        return prev[0], self.evaluate(
            prev[0], np.asarray(prev[1]), prev[2], stamp=prev[3]
        )

    def evaluate(
        self, cur_kf: int, packed: np.ndarray, neigh_mat, stamp: int | None = None
    ) -> list[tuple[int, int]]:
        """Host-side candidate gating on an already-pulled detection vector.

        `neigh_mat` is the uint8 [K, K] covisibility-adjacency matrix from
        _pack_detect (already host-resident via the async copy). Returns
        accepted candidates as (slot, insertion_seq) pairs: the detection is
        evaluated one keyframe after dispatch, during which a candidate slot
        can be culled AND recycled into a brand-new keyframe — callers must
        drop any candidate whose current seq no longer matches."""
        cfg = self.cfg
        K = neigh_mat.shape[0]
        self._eval_stamp = stamp if stamp is not None else cur_kf
        # dispatch-time insertion number of the detecting keyframe, so the
        # caller can reject the whole detection if ITS slot was recycled
        self.last_eval_det_seq = int(packed[3 * K + cur_kf])
        scores = packed[:K].copy()
        covis_row = packed[K : 2 * K]
        kf_valid = packed[2 * K : 3 * K] > 0.5
        seq = packed[3 * K : 4 * K].astype(np.int64)
        common = packed[4 * K : 5 * K] if len(packed) >= 5 * K else None
        neighbors = (covis_row > 0) & kf_valid
        scores[~kf_valid] = -1.0
        scores[cur_kf] = -1.0
        # min score among covisible neighbors defines the gate
        neigh_scores = scores[neighbors & (covis_row >= 15)]
        min_score = float(neigh_scores.min()) if len(neigh_scores) else 0.3
        # candidates: non-neighbors above the gate, not inserted too recently
        # (by insertion number, not slot index — slots are recycled)
        recent = seq > seq[cur_kf] - 8
        cand_mask = (scores >= max(min_score, 0.05)) & ~neighbors & ~recent
        # shared-word gate (reference: DetectLoopCandidates keeps keyframes
        # with > 0.8 * maxCommonWords shared words before scoring)
        if common is not None and cand_mask.any():
            max_cw = float(common[cand_mask].max())
            if max_cw > 0:
                cand_mask &= common >= 0.8 * max_cw
        cands = np.nonzero(cand_mask)[0]

        # accumulated covisibility-group scoring (reference: the accScore
        # pass — each candidate's score pools over its covisible co-candidates;
        # keep groups >= 0.75 * best and return each group's best member)
        covis_np = np.asarray(neigh_mat) if len(cands) else None
        if len(cands) > 1:
            acc = np.empty(len(cands), np.float32)
            best_member = np.empty(len(cands), np.int64)
            cand_set = cand_mask.copy()
            for idx, c in enumerate(cands):
                group = (covis_np[int(c)] > 0) & cand_set
                group[int(c)] = True
                members = np.nonzero(group)[0]
                acc[idx] = float(scores[members].sum())
                best_member[idx] = members[np.argmax(scores[members])]
            keep = acc >= 0.75 * float(acc.max())
            cands = np.unique(best_member[keep])

        # 3-consecutive-KF covisibility consistency (reference gate);
        # groups are keyed on insertion numbers, never slot indices, so a
        # recycled slot can't fake continuity with an unrelated group
        accepted = []
        new_groups: list[tuple[set[int], int]] = []
        for c in cands:
            group_slots = np.nonzero((covis_np[int(c)] > 0) & kf_valid)[0]
            group = {int(seq[s]) for s in group_slots}
            group.add(int(seq[c]))
            count = 1
            for prev_group, prev_count in self._consistent:
                if group & prev_group:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count >= self.cfg.covis_consistency_th:
                accepted.append((int(c), int(seq[c])))
        self._consistent = new_groups
        return accepted

    # --- Sim3 computation (reference: LoopClosing::ComputeSim3) ---------

    def compute_sim3(
        self, m: MapState, cur_kf: int, cand_kf: int, key
    ) -> LoopCandidate | None:
        cfg = self.cfg
        kfs, lms = m.kfs, m.lms
        L = lms.xyz.shape[0]
        cur = jnp.int32(cur_kf)
        cand = jnp.int32(cand_kf)

        obs_c = kfs.obs_lm[cur]
        obs_k = kfs.obs_lm[cand]
        ok_c = kfs.feat_valid[cur] & (obs_c >= 0) & lms.valid[jnp.clip(obs_c, 0, L - 1)]
        ok_k = kfs.feat_valid[cand] & (obs_k >= 0) & lms.valid[jnp.clip(obs_k, 0, L - 1)]
        dist = matching.hamming_distance_matrix(kfs.desc[cur], kfs.desc[cand])
        mb, _ = matching.match_mutual(dist, ok_c, ok_k, max_dist=cfg.th_low, ratio=0.75)
        has = mb >= 0
        n_matches = int(jnp.sum(has))
        if n_matches < 20:
            return None

        jb = jnp.clip(mb, 0, obs_k.shape[0] - 1)
        X_cur_w = lms.xyz[jnp.clip(obs_c, 0, L - 1)]
        X_cand_w = lms.xyz[jnp.clip(obs_k[jb], 0, L - 1)]
        # camera-frame points at the two ends (drifted world frames differ)
        X1 = geo.se3_apply(kfs.R[cur], kfs.t[cur], X_cur_w)
        X2 = geo.se3_apply(kfs.R[cand], kfs.t[cand], X_cand_w)
        fix_scale = cfg.sensor.name != "MONOCULAR"
        res = solve_sim3_ransac(
            X1, X2, has, key, iters=cfg.sim3_ransac_iters,
            fix_scale=fix_scale, min_inliers=20,
        )
        if not bool(res.success):
            return None
        # image-space refinement with bidirectional reprojection edges
        # (reference: Optimizer::OptimizeSim3 after the RANSAC stage)
        from .sim3 import refine_sim3_reproj

        uv1 = kfs.uv[cur]
        uv2 = kfs.uv[cand][jb]
        s2, R2, t2, inl, n_inl = refine_sim3_reproj(
            res.s, res.R, res.t, X1, X2, uv1, uv2, res.inliers,
            cfg.fx, cfg.fy, cfg.cx, cfg.cy, fix_scale=fix_scale,
        )
        if int(n_inl) < 20:
            return None
        # guided second pass (reference: SearchBySim3 then the >= 40 total-
        # match gate): project the candidate's landmarks through the refined
        # Sim3 and require the wider correspondence set to clear
        # cfg.loop_min_matches before committing to a closure
        n_guided = int(
            _guided_sim3_matches(
                m, cur, cand, jnp.float32(s2), R2, t2, cfg
            )
        )
        if n_guided < cfg.loop_min_matches:
            return None
        return LoopCandidate(
            cand_kf=cand_kf,
            s=float(s2),
            R=np.asarray(R2),
            t=np.asarray(t2),
            n_inliers=int(n_inl),
        )

    # --- correction (reference: LoopClosing::CorrectLoop) ---------------

    def correct(
        self,
        m: MapState,
        cur_kf: int,
        loop: LoopCandidate,
        cfg: EngineConfig,
        pose_graph_iters: int = 15,
    ) -> MapState:
        """Pose-graph optimize with the loop edge and move the landmarks."""
        # loop edge measurement between nodes: S_ij = S_i o S_j^-1 with
        # i = cur, j = cand must equal S21^-1 (cand-cam -> cur-cam).
        s21 = jnp.float32(loop.s)
        R21 = jnp.asarray(loop.R)
        t21 = jnp.asarray(loop.t)
        s_m, R_m, t_m = geo.sim3_inv(s21, R21, t21)

        prob = build_pose_graph(
            m, cfg,
            loop_i=jnp.int32(cur_kf), loop_j=jnp.int32(loop.cand_kf),
            loop_s=s_m, loop_R=R_m, loop_t=t_m,
            fixed_kf=jnp.int32(loop.cand_kf),
        )
        s, R, t, cost = solve_pose_graph(prob, iters=pose_graph_iters)
        m = apply_pose_graph_correction(m, s, R, t, cfg)
        # merge duplicate landmarks across the closed junction
        # (reference: LoopClosing::SearchAndFuse with the corrected poses)
        from .mapping import fuse_landmarks_into_kf, update_covis_for_kf

        m = fuse_landmarks_into_kf(m, jnp.int32(loop.cand_kf), jnp.int32(cur_kf), cfg)
        m = fuse_landmarks_into_kf(m, jnp.int32(cur_kf), jnp.int32(loop.cand_kf), cfg)
        m = update_covis_for_kf(m, jnp.int32(cur_kf))
        m = update_covis_for_kf(m, jnp.int32(loop.cand_kf))
        self.closed_loops.append((cur_kf, loop.cand_kf))
        self._last_loop_stamp = self._eval_stamp
        self._consistent = []
        return m
