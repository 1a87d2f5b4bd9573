"""Engine facade: the public entry point of the SLAM system.

Replaces the reference's System + the threads it spawns (canonical
``src/System.cc`` + ``src/Tracking.cc`` state machine — SURVEY.md §2.1,
§3.2). One process, zero threads, zero locks (SURVEY.md §7.1 rule 1): the
host runs a thin scalar state machine (NOT_INITIALIZED / OK / LOST) and
dispatches jitted device steps; the map lives in HBM as a ``MapState``
pytree. Only scalar decisions (init succeeded? lost? need keyframe?) sync
to the host.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as geo
from . import mapping
from . import matching
from . import tracking
from .config import EngineConfig, Sensor
from .containers import (
    INVALID_ID,
    FrameArrays,
    MapMeta,
    MapState,
    empty_map,
    pack_map_meta,
    save_map,
)
from .frontend import extract_features
from .init2view import initialize_two_view
from .optim import pose_optimization

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


@dataclasses.dataclass
class FrameRecord:
    """Per-frame output (reference: the per-frame Tcw + logging state).

    ``R_rel/t_rel`` store the pose relative to keyframe ``ref_kf``
    (T_cr = T_cw o T_rw^-1); trajectory export composes them with the
    *current* keyframe poses so later BA / loop corrections propagate to
    every frame (reference: System::SaveTrajectoryTUM's mlRelativeFramePoses).
    """

    frame_id: int
    timestamp: float
    R: np.ndarray
    t: np.ndarray
    state: str
    n_tracked: int
    ref_kf: int = -1
    R_rel: np.ndarray | None = None
    t_rel: np.ndarray | None = None


class Engine:
    """TPU-native SLAM engine (reference: ORB_SLAM2::System).

    Usage::

        eng = Engine(config)
        for img, ts in frames:
            rec = eng.track_image(img, ts)   # or track_features(...)
        eng.save_trajectory_tum(path)
    """

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.m: MapState = empty_map(cfg)
        self.state = NOT_INITIALIZED
        self.frame_id = 0
        self.kf_count = 0
        self.ref_kf = 0
        self.last_kf_frame_id = -(10**9)
        self.last_kf_tracked = 0
        # host-mutable copy of the stale-keyframe interval: benchmarks sweep
        # keyframe rate without re-hashing cfg (cfg is a static jit argument,
        # so a new cfg instance would recompile every device function)
        self.kf_interval = cfg.max_frames_between_kf
        # saturation accounting (SURVEY.md §5 "no silent caps"): capacity
        # events are counted and exposed; attach a RunLogger to get events
        self.stats = {
            "lm_dropped": 0,
            "kf_slot_full": 0,
            "gba_obs_dropped": 0,
            "gba_runs": 0,
        }
        self.logger = None  # optional instrument.RunLogger
        # init bookkeeping
        self._init_frame: Optional[FrameArrays] = None
        self._init_ts = 0.0
        self._init_fid = 0
        # last-frame tracking state
        self._last_frame: Optional[FrameArrays] = None
        self._last_lm_ids = None
        self._last_R = np.eye(3, dtype=np.float32)
        self._last_t = np.zeros(3, dtype=np.float32)
        self._vel: Optional[tuple[np.ndarray, np.ndarray]] = None
        self.trajectory: list[FrameRecord] = []
        self._key = jax.random.PRNGKey(cfg.n_features)
        # place recognition (reference: ORBVocabulary + KeyFrameDatabase)
        self._vocab = None
        self._bow_db = None  # f32[K, W] BoW vector per keyframe
        self._vocab_trained_kfs = 0  # kf_count at last codebook (re)train
        from .loopclosing import LoopCloser

        self._loop = LoopCloser(cfg)
        self.loop_closing_enabled = True
        self.localization_only = False
        # asynchronous loop-closure GBA (reference: the transient
        # RunGlobalBundleAdjustment thread): the full-map refinement after a
        # loop correction is chunked into one LM iteration per tracked
        # batch, so tracking never stalls behind a multi-second solve; the
        # result folds into the live map via fold_gba_result (spanning-tree
        # re-anchor for keyframes/landmarks created meanwhile)
        self.gba_async = True
        self.gba_iters = 8
        self._gba: dict | None = None
        # multi-chip scaling axis (SURVEY.md §2.3): when more than one device
        # is visible, global BA shards its landmark axis over this mesh; XLA
        # inserts the cross-shard reductions (psum over ICI) when per-shard
        # Schur contributions combine into the replicated camera system
        self.mesh = None
        if len(jax.devices()) > 1:
            from .distributed import make_mesh

            self.mesh = make_mesh()
        # pipelined-tracking state (track_features_async); depth = how many
        # frames stay in flight before the host reads a result (larger hides
        # the tunnel completion latency; state decisions lag by this much)
        self._pending: list = []
        self._pending_b: list = []
        self._dev_state = None
        self._ref_kf_dev = None   # cached device copy (H2D puts are not free)
        self._true_dev = jnp.asarray(True)
        self.pipeline_depth = 3
        # --- keyframe slot recycling (reference: KeyFrame::SetBadFlag
        # returns capacity) --------------------------------------------
        # host view of which slots hold live keyframes; refreshed from the
        # per-batch / per-frame device snapshot (pack_map_meta) which lags
        # allocation by the pipeline depth. Slots the host allocated since
        # ride `_recent_kf_allocs` (slot -> expected insertion seq) until a
        # snapshot that postdates the allocation (seq[slot] >= expected)
        # confirms them — so a cull of a just-allocated keyframe is observed
        # as soon as a fresh snapshot lands, never masked.
        self._kf_valid_host = np.zeros(cfg.max_keyframes, bool)
        self._recent_kf_allocs: dict[int, int] = {}
        # host mirror of the device's monotonic insertion counter (device:
        # insert_keyframe sets seq = max(seq)+1; starts at 0 on empty map)
        self._seq_next = 0
        # trajectory records indexed by their anchor slot, so observing a
        # keyframe cull re-anchors only the affected records
        self._recs_by_ref: dict[int, list[FrameRecord]] = {}

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def track_image(self, img, timestamp: float) -> FrameRecord:
        """Monocular image entry (reference: System::TrackMonocular)."""
        frame = extract_features(jnp.asarray(img), self.cfg)
        frame = self._undistort(frame)
        return self.track_features(frame, timestamp)

    def track_stereo(self, img_left, img_right, timestamp: float) -> FrameRecord:
        """Stereo pair entry (reference: System::TrackStereo)."""
        from .stereo import stereo_match_frames

        img_left = jnp.asarray(img_left, jnp.float32)
        img_right = jnp.asarray(img_right, jnp.float32)
        left = extract_features(img_left, self.cfg)
        right = extract_features(img_right, self.cfg)
        left = stereo_match_frames(
            left, right, self.cfg, img_left=img_left, img_right=img_right
        )
        return self.track_features(self._undistort(left), timestamp)

    def track_rgbd(self, img, depth_img, timestamp: float) -> FrameRecord:
        """RGB-D entry (reference: System::TrackRGBD)."""
        from .stereo import depth_from_rgbd

        frame = extract_features(jnp.asarray(img), self.cfg)
        frame = depth_from_rgbd(frame, jnp.asarray(depth_img), self.cfg)
        return self.track_features(self._undistort(frame), timestamp)

    def track_features(self, frame: FrameArrays, timestamp: float) -> FrameRecord:
        """Track a pre-extracted feature frame (also the synthetic-data entry)."""
        self._gba_tick()
        if self.state == NOT_INITIALIZED:
            rec = self._initialize(frame, timestamp)
        else:
            rec = self._track(frame, timestamp)
        self._append_record(rec)
        self.frame_id += 1
        return rec

    # --- pipelined tracking (throughput mode) --------------------------

    def track_features_async(self, frame: FrameArrays, timestamp: float):
        """Pipelined entry: launch this frame's device step and resolve the
        PREVIOUS frame's result (which has finished by now).

        The TPU-tunnel completion latency (~27 ms) only bites when the host
        blocks on a fresh result; resolving one frame behind makes every
        read hit an already-finished value (~0.01 ms). Mapping consequently
        lags tracking by one frame — exactly the reference's asynchronous
        LocalMapping thread semantics. Returns the previous frame's
        FrameRecord (None while the pipeline fills or during init).
        """
        if self.state != OK or self._last_lm_ids is None:
            self.flush()
            self.track_features(frame, timestamp)
            return self.trajectory[-1]
        cfg = self.cfg
        use_st = cfg.sensor != Sensor.MONOCULAR and cfg.bf > 0
        dev = self._dev_state
        if dev is None:
            dev = {
                "R": jnp.asarray(self._last_R),
                "t": jnp.asarray(self._last_t),
                "R_prev": jnp.asarray(self._last_R),
                "t_prev": jnp.asarray(self._last_t),
                "has_vel": jnp.asarray(False),
                "lm_ids": self._last_lm_ids,
            }
        if self._ref_kf_dev is None:
            self._ref_kf_dev = jnp.int32(self.ref_kf)
        R_d, t_d, lm_ids_d, packed, counts = tracking.fused_track_step_auto(
            self.m, dev["lm_ids"], frame,
            dev["R"], dev["t"], dev["R_prev"], dev["t_prev"], dev["has_vel"],
            self._ref_kf_dev, cfg, use_stereo=use_st,
        )
        # fold landmark visibility counters (device-side add, async)
        self.m = tracking.apply_track_counts(self.m, counts)
        self._dev_state = {
            "R": R_d, "t": t_d,
            "R_prev": dev["R"], "t_prev": dev["t"],
            "has_vel": self._true_dev,
            "lm_ids": lm_ids_d,
        }
        packed.copy_to_host_async()
        # keyframe bookkeeping snapshot rides every per-frame pull too, so
        # device keyframe culls are observed (slot freelist + trajectory
        # re-anchor) without a blocking refresh on this path
        meta = pack_map_meta(self.m)
        meta.copy_to_host_async()
        self._pending.append(
            (frame, timestamp, self.frame_id, self.ref_kf, R_d, t_d, lm_ids_d,
             packed, meta)
        )
        self.frame_id += 1
        if len(self._pending) > self.pipeline_depth:
            return self._resolve_oldest()
        return None

    def track_batch(self, frames: FrameArrays, timestamps) :
        """Batched pipelined entry: track B frames in one device dispatch.

        `frames` has a leading batch dim on every leaf (e.g. from
        `frontend.extract_features_batch`). Per-dispatch tunnel overhead is
        the throughput bottleneck (KERNELS.md), so B frames share one
        dispatch; results resolve one batch behind. Returns the list of
        FrameRecords resolved by this call (possibly empty).
        """
        B = len(timestamps)
        if self.state == OK:
            # advance any in-flight loop-closure GBA by one chunk; the
            # chunk's device work interleaves between batch dispatches
            self._gba_tick()
        if self.state != OK or self._last_lm_ids is None:
            # per-frame until healthy; the NEXT full batch re-enters batched
            # mode. (Never call track_batch on a partial batch: every distinct
            # batch length compiles its own fused_track_multi.)
            self.flush()
            out = []
            for b in range(B):
                fb = jax.tree_util.tree_map(lambda x: x[b], frames)
                out.append(self.track_features(fb, float(timestamps[b])))
            return out
        # resolve the in-flight batch BEFORE dispatching this one. Its packed
        # result started a D2H copy at dispatch time, so by now (a full batch
        # interval later) the host read is (near-)free — the RTT hiding of a
        # deeper pipeline without its staleness: any keyframe the resolve
        # creates lands in the map THIS batch tracks against. Tracking
        # robustness showed measurably worse when mapping lagged two batches
        # (fast sweeps starve the motion-model search of fresh landmarks).
        out = []
        if self._pending_b:
            out = self._resolve_batch()
            if self.state != OK:
                # recovery: route this batch through the per-frame path
                # (relocalization). Never recurse into track_batch with a
                # shorter batch — each distinct batch length compiles its
                # own fused_track_multi (tens of seconds on TPU).
                for b in range(B):
                    fb = jax.tree_util.tree_map(lambda x: x[b], frames)
                    out.append(self.track_features(fb, float(timestamps[b])))
                return out
        cfg = self.cfg
        use_st = cfg.sensor != Sensor.MONOCULAR and cfg.bf > 0
        dev = self._dev_state
        if dev is None:
            dev = {
                "R": jnp.asarray(self._last_R),
                "t": jnp.asarray(self._last_t),
                "R_prev": jnp.asarray(self._last_R),
                "t_prev": jnp.asarray(self._last_t),
                "has_vel": jnp.asarray(False),
                "lm_ids": self._last_lm_ids,
            }
        if self._ref_kf_dev is None:
            self._ref_kf_dev = jnp.int32(self.ref_kf)
        R_l, t_l, R_p, t_p, lm_l, packed, counts = tracking.fused_track_multi(
            self.m, dev["lm_ids"], frames,
            dev["R"], dev["t"], dev["R_prev"], dev["t_prev"], dev["has_vel"],
            self._ref_kf_dev, cfg, use_stereo=use_st,
        )
        # fold the batch-summed landmark visibility counters (async add)
        self.m = tracking.apply_track_counts(self.m, counts)
        self._dev_state = {
            "R": R_l, "t": t_l, "R_prev": R_p, "t_prev": t_p,
            "has_vel": self._true_dev, "lm_ids": lm_l,
        }
        fids = list(range(self.frame_id, self.frame_id + B))
        self.frame_id += B
        # the pending loop detection (if any) carries its own async-copied
        # arrays; it is evaluated when this batch resolves, by which point
        # its transfer has long completed
        det = self._loop.take_pending() if self.loop_closing_enabled else None
        pull = packed.reshape(-1)
        # keyframe bookkeeping snapshot from the same map this batch tracks
        # against; feeds the host slot freelist + cull re-anchoring
        meta = pack_map_meta(self.m)
        # start the D2H copies now; they proceed as soon as the batch's
        # compute finishes, overlapping the host's next-batch prep
        pull.copy_to_host_async()
        meta.copy_to_host_async()
        self._pending_b.append(
            (frames, list(timestamps), fids, self.ref_kf, lm_l, pull, det, meta)
        )
        return out

    def _resolve_batch(self):
        frames, ts_list, fids, ref_launch, lm_l, pull, det, meta = (
            self._pending_b.pop(0)
        )
        cfg = self.cfg
        B = len(ts_list)
        V = np.asarray(pull)                   # ONE pull per batch
        P = V[: B * 26].reshape(B, 26)
        out = []
        lost_at = None
        for b in range(len(ts_list)):
            p = P[b]
            n_tracked = int(p[24])
            if n_tracked < cfg.min_inliers_local:
                lost_at = b
                break
            rec = FrameRecord(
                frame_id=fids[b], timestamp=ts_list[b],
                R=p[:9].reshape(3, 3), t=p[9:12],
                state=OK, n_tracked=n_tracked, ref_kf=ref_launch,
                R_rel=p[12:21].reshape(3, 3), t_rel=p[21:24],
            )
            self._append_record(rec)
            out.append(rec)
            self._last_R, self._last_t = rec.R, np.asarray(p[9:12])
        # fold the keyframe bookkeeping snapshot (taken at this batch's
        # dispatch) into the host slot view; re-anchors culled-KF records
        self._observe_kf_meta(MapMeta(meta, cfg.max_keyframes))
        if lost_at is not None:
            # tracking failed mid-batch: collect the frames computed against
            # the now-stale state (the rest of this batch plus any deeper
            # in-flight batches) and RE-TRACK them through the per-frame
            # path — state LOST routes each through relocalization instead
            # of blanket-recording them lost (reference: Tracking::Track's
            # per-frame Relocalization attempt)
            retrack = [
                (jax.tree_util.tree_map(lambda x: x[b], frames), ts_list[b], fids[b])
                for b in range(lost_at, len(ts_list))
            ]
            for fr2, ts2, fid2, _, _, _, _, _ in self._pending_b:
                retrack += [
                    (jax.tree_util.tree_map(lambda x: x[b], fr2), ts2[b], fid2[b])
                    for b in range(len(ts2))
                ]
            self._pending_b.clear()
            self._dev_state = None
            self.state = LOST
            self._vel = None
            fid_after = self.frame_id
            for fb, ts_b, fid_b in retrack:
                self.frame_id = fid_b
                out.append(self.track_features(fb, float(ts_b)))
            self.frame_id = fid_after
            return out
        # keyframe decision: the batch's LAST frame is the only candidate —
        # its pose and feature->landmark associations (lm_l) are mutually
        # consistent; one KF per batch keeps mapping bounded
        counts = P[:, 24].astype(int)
        b_best = len(ts_list) - 1
        self._last_lm_ids = lm_l
        self._last_frame = None
        self.state = OK
        slot = None
        if self._need_keyframe(int(counts[b_best]), fid=fids[b_best]):
            slot = self._alloc_kf_slot()
        if slot is not None:
            frame_b = jax.tree_util.tree_map(lambda x: x[b_best], frames)
            self.m = mapping.process_new_keyframe(
                self.m, frame_b,
                jnp.asarray(P[b_best, :9].reshape(3, 3)),
                jnp.asarray(P[b_best, 9:12]),
                lm_l,
                jnp.int32(fids[b_best]), jnp.float32(ts_list[b_best]),
                jnp.int32(slot), jnp.int32(self.ref_kf), cfg,
                spawn_depth=cfg.sensor != Sensor.MONOCULAR,
                n_neighbors=cfg.kf_tri_neighbors,
            )
            if self.kf_count >= 2:
                from .optim.local_ba import local_bundle_adjustment

                self.m = local_bundle_adjustment(
                    self.m, slot, cfg, iters=cfg.local_ba_iters
                )
            self.ref_kf = slot
            self._ref_kf_dev = None
            self.kf_count += 1
            self.last_kf_frame_id = fids[b_best]
            self.last_kf_tracked = int(counts[b_best])
            self._ensure_vocab()
            self._update_bow_row(slot)
            # dispatch-only: the detection vector rides the NEXT batch's pull
            self._detect_and_close_loop(slot, dispatch_only=True)
        # evaluate the detection dispatched at an earlier keyframe; its
        # device work and async D2H copies are long done by now
        if det is not None:
            det_kf = det[0]
            cands = self._loop.evaluate(
                det_kf, np.asarray(det[1]), det[2], stamp=det[3]
            )
            self._close_loop_from(det_kf, cands)
        return out

    def shutdown(self) -> None:
        """Drain all in-flight work (reference: System::Shutdown — which
        joins the threads and waits for a running GBA; here: resolve pending
        batches/frames and run any in-flight loop-closure GBA to completion).
        The engine remains usable afterwards."""
        self.flush()

    def flush(self):
        """Drain the pipeline (call before reading trajectory / evaluating)."""
        while getattr(self, "_pending", None):
            self._resolve_oldest()
        while getattr(self, "_pending_b", None):
            self._resolve_batch()
        while self._gba is not None:
            self._gba_tick()
        self._dev_state = None

    def _resolve_oldest(self):
        frame, ts, fid, ref_launch, R_d, t_d, lm_ids_d, packed, meta = (
            self._pending.pop(0)
        )
        cfg = self.cfg
        p = np.asarray(packed)
        # fold the keyframe bookkeeping snapshot taken at this frame's
        # dispatch (observes device culls; re-anchors affected records)
        self._observe_kf_meta(MapMeta(meta, cfg.max_keyframes))
        n_tracked = int(p[24])
        if n_tracked < cfg.min_inliers_local:
            # tracking failed at this frame: drop in-flight work, go LOST
            dropped = [(e[1], e[2], e[3]) for e in self._pending]
            self._pending.clear()
            self._dev_state = None
            self.state = LOST
            self._vel = None
            rec = FrameRecord(
                frame_id=fid, timestamp=ts, R=self._last_R, t=self._last_t,
                state=LOST, n_tracked=0, ref_kf=ref_launch,
            )
            self._append_record(rec)
            # in-flight frames were computed against pre-loss state: record
            # them as LOST rather than silently skipping them
            for d_ts, d_fid, d_ref in dropped:
                self._append_record(
                    FrameRecord(
                        frame_id=d_fid, timestamp=d_ts, R=self._last_R,
                        t=self._last_t, state=LOST, n_tracked=0, ref_kf=d_ref,
                    )
                )
            return rec
        R_cur = p[:9].reshape(3, 3)
        t_cur = p[9:12]
        rec = FrameRecord(
            frame_id=fid, timestamp=ts, R=R_cur, t=t_cur,
            state=OK, n_tracked=n_tracked, ref_kf=ref_launch,
            R_rel=p[12:21].reshape(3, 3), t_rel=p[21:24],
        )
        self._append_record(rec)
        self._last_R, self._last_t = R_cur, t_cur
        self._last_frame = frame
        self._last_lm_ids = lm_ids_d
        self.state = OK
        slot = None
        if self._need_keyframe(n_tracked, fid=fid):
            slot = self._alloc_kf_slot()
        if slot is not None:
            self.m = mapping.process_new_keyframe(
                self.m, frame, R_d, t_d, lm_ids_d,
                jnp.int32(fid), jnp.float32(ts),
                jnp.int32(slot), jnp.int32(self.ref_kf), cfg,
                spawn_depth=cfg.sensor != Sensor.MONOCULAR,
                n_neighbors=cfg.kf_tri_neighbors,
            )
            if self.kf_count >= 2:
                from .optim.local_ba import local_bundle_adjustment

                # dispatched asynchronously; later steps consume the refined
                # map without the host ever blocking on it
                self.m = local_bundle_adjustment(
                    self.m, slot, cfg, iters=cfg.local_ba_iters
                )
            self.ref_kf = slot
            self._ref_kf_dev = None
            self.kf_count += 1
            self.last_kf_frame_id = fid
            self.last_kf_tracked = n_tracked
            self._ensure_vocab()
            self._update_bow_row(slot)
            self._detect_and_close_loop(slot)
        return rec

    def final_poses(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """Per-frame world->camera poses composed against the *current* map.

        Frames tied to a keyframe get T_cw = T_cr o T_rw(now), so keyframe
        corrections from BA (and later loop closure) propagate to the whole
        trajectory (reference: SaveTrajectoryTUM pose-chain recomputation).
        """
        kf_R = np.asarray(self.m.kfs.R)
        kf_t = np.asarray(self.m.kfs.t)
        out = []
        for r in self.trajectory:
            if r.ref_kf >= 0 and r.R_rel is not None:
                Rr, tr = kf_R[r.ref_kf], kf_t[r.ref_kf]
                R = r.R_rel @ Rr
                t = r.R_rel @ tr + r.t_rel
            else:
                R, t = r.R, r.t
            out.append((R, t))
        return out

    def save_trajectory_tum(self, path: str) -> None:
        from .eval.trajectory import save_tum

        poses = self.final_poses()
        save_tum(
            path,
            [r.timestamp for r in self.trajectory],
            [p[0] for p in poses],
            [p[1] for p in poses],
        )

    def save_trajectory_kitti(self, path: str) -> None:
        from .eval.trajectory import save_kitti

        poses = self.final_poses()
        save_kitti(path, [p[0] for p in poses], [p[1] for p in poses])

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        """Keyframe poses only, ordered by insertion number.

        Reference: System::SaveKeyFrameTrajectoryTUM — the sparse trajectory
        evaluators use when per-frame poses are not wanted.
        """
        from .eval.trajectory import save_tum

        valid = np.asarray(self.m.kfs.valid)
        seq = np.asarray(self.m.kfs.seq)
        ts = np.asarray(self.m.kfs.timestamp)
        kf_R = np.asarray(self.m.kfs.R)
        kf_t = np.asarray(self.m.kfs.t)
        slots = np.nonzero(valid)[0]
        slots = slots[np.argsort(seq[slots])]
        save_tum(
            path,
            [float(ts[s]) for s in slots],
            [kf_R[s] for s in slots],
            [kf_t[s] for s in slots],
        )

    def save_checkpoint(self, path: str) -> None:
        save_map(self.m, path)

    def _bake_all_records(self) -> None:
        """Convert every trajectory record to an absolute pose against the
        CURRENT map, then drop the slot index. Called before the map is
        discarded (reset / checkpoint load): records must not re-compose
        against an unrelated future map occupying the same slots."""
        kf_R = np.asarray(self.m.kfs.R)
        kf_t = np.asarray(self.m.kfs.t)
        for rec in self.trajectory:
            if rec.ref_kf >= 0 and rec.R_rel is not None:
                Rr, tr = kf_R[rec.ref_kf], kf_t[rec.ref_kf]
                rec.R = rec.R_rel @ Rr
                rec.t = rec.R_rel @ tr + rec.t_rel
            rec.ref_kf, rec.R_rel, rec.t_rel = -1, None, None
        self._recs_by_ref.clear()

    def load_checkpoint(self, path: str) -> None:
        """Resume from a saved map: host counters rebuild from array masks
        (reference has no map save/load at all — SURVEY.md §5)."""
        from .containers import load_map

        self._gba = None   # an in-flight GBA belongs to the old map
        self.flush()
        self._bake_all_records()
        self.m = load_map(self.cfg, path)
        valid = np.asarray(self.m.kfs.valid)
        self.kf_count = int(np.asarray(self.m.num_kfs))
        self._kf_valid_host = valid.copy()
        self._recent_kf_allocs.clear()
        self._seq_next = int(np.asarray(self.m.kfs.seq).max()) + 1
        alive = np.nonzero(valid)[0]
        if len(alive):
            # newest surviving keyframe by insertion number (slots are
            # recycled, so the highest slot index is not the newest KF)
            seq = np.asarray(self.m.kfs.seq)
            last = int(alive[np.argmax(seq[alive])])
            self.ref_kf = last
            self._last_R = np.asarray(self.m.kfs.R[last])
            self._last_t = np.asarray(self.m.kfs.t[last])
            self._last_lm_ids = self.m.kfs.obs_lm[last]
            self.state = LOST  # relocalize against the loaded map
            self._vocab = None  # retrain lazily from the loaded descriptors
            self._bow_db = None
            self._vocab_trained_kfs = 0
        else:
            self.state = NOT_INITIALIZED

    def block_refine(
        self,
        n_blocks: int = 8,
        rounds: int = 2,
        iters: int = 6,
        cams_pb: int = 64,
        lms_pb: int = 4096,
    ) -> None:
        """Parallel keyframe-block map refinement (large-scale SfM mode).

        Partitions the map into contiguous keyframe blocks and runs
        block-coordinate BA with the block axis sharded over the device
        mesh (optim/block_ba) — the offline/large-map counterpart of the
        loop-closure GBA. Call when tracking is idle (it synchronously
        rewrites poses/landmarks).
        """
        from .optim.block_ba import block_bundle_adjustment

        self.flush()
        self.m = block_bundle_adjustment(
            self.m, self.cfg, n_blocks=n_blocks, rounds=rounds, iters=iters,
            cams_pb=cams_pb, lms_pb=lms_pb, mesh=self.mesh, stats=self.stats,
        )
        self._last_R = np.asarray(self.m.kfs.R[self.ref_kf])
        self._last_t = np.asarray(self.m.kfs.t[self.ref_kf])
        self._vel = None
        self._dev_state = None
        self._refresh_kf_meta_blocking()

    def set_localization_mode(self, on: bool) -> None:
        """Freeze the map; track only (reference: ActivateLocalizationMode)."""
        self.localization_only = on

    def reset(self) -> None:
        """Clear the map and start over (reference: System::Reset)."""
        self._gba = None   # abandon, don't drain, an in-flight GBA
        self.flush()
        self._bake_all_records()
        self.m = empty_map(self.cfg)
        self.state = NOT_INITIALIZED
        self.kf_count = 0
        self.ref_kf = 0
        self.last_kf_frame_id = -(10**9)
        self.last_kf_tracked = 0
        self._init_frame = None
        self._last_frame = None
        self._last_lm_ids = None
        self._last_R = np.eye(3, dtype=np.float32)
        self._last_t = np.zeros(3, dtype=np.float32)
        self._vel = None
        self._vocab = None
        self._bow_db = None
        self._vocab_trained_kfs = 0
        self._kf_valid_host = np.zeros(self.cfg.max_keyframes, bool)
        self._recent_kf_allocs.clear()
        self._seq_next = 0
        self._ref_kf_dev = None
        from .loopclosing import LoopCloser

        self._loop = LoopCloser(self.cfg)

    def export_map_ply(self, path: str) -> None:
        """Dump landmarks + keyframe centers as a PLY point cloud (replaces
        the reference's live Pangolin viewer with offline export)."""
        lv = np.asarray(self.m.lms.valid)
        pts = np.asarray(self.m.lms.xyz)[lv]
        kv = np.asarray(self.m.kfs.valid)
        kR = np.asarray(self.m.kfs.R)[kv]
        kt = np.asarray(self.m.kfs.t)[kv]
        cams = np.stack([-R.T @ t for R, t in zip(kR, kt)]) if kv.any() else np.zeros((0, 3))
        with open(path, "w") as f:
            n = len(pts) + len(cams)
            f.write(
                "ply\nformat ascii 1.0\n"
                f"element vertex {n}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n"
            )
            for p in pts:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} 180 180 180\n")
            for c in cams:
                f.write(f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f} 255 40 40\n")

    @property
    def positions(self) -> np.ndarray:
        """Camera centers [N, 3] (world frame), BA-corrected, for evaluation."""
        out = [-R.T @ t for R, t in self.final_poses()]
        return np.stack(out) if out else np.zeros((0, 3))

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _undistort(self, frame: FrameArrays) -> FrameArrays:
        c = self.cfg
        if c.k1 == 0.0 and c.k2 == 0.0 and c.p1 == 0.0 and c.p2 == 0.0:
            return frame
        uv = geo.undistort_points(
            frame.uv_raw, c.fx, c.fy, c.cx, c.cy, c.k1, c.k2, c.p1, c.p2, c.k3
        )
        return frame._replace(uv=uv)

    def _record(self, ts, R, t, n_tracked=0, ref_kf=-1) -> FrameRecord:
        R = np.asarray(R)
        t = np.asarray(t)
        R_rel = t_rel = None
        if ref_kf >= 0:
            Rr = np.asarray(self.m.kfs.R[ref_kf])
            tr = np.asarray(self.m.kfs.t[ref_kf])
            R_rel = R @ Rr.T
            t_rel = t - R_rel @ tr
        return FrameRecord(
            frame_id=self.frame_id,
            timestamp=ts,
            R=R,
            t=t,
            state=self.state,
            n_tracked=int(n_tracked),
            ref_kf=int(ref_kf),
            R_rel=R_rel,
            t_rel=t_rel,
        )

    # --- keyframe slot recycling ---------------------------------------
    # The reference frees a culled KeyFrame's memory (KeyFrame::SetBadFlag);
    # here "memory" is a fixed-capacity slot, so the host runs a freelist
    # over the device validity mask. Culling happens on device inside
    # process_new_keyframe; the host learns of it from the map-meta snapshot
    # that rides each batch pull (or a blocking refresh on the per-frame
    # path) and re-anchors trajectory records of the culled keyframe to its
    # spanning-tree parent (reference: SaveTrajectoryTUM's bad-KF walk).

    def _append_record(self, rec: FrameRecord) -> None:
        self.trajectory.append(rec)
        if rec.ref_kf >= 0:
            self._recs_by_ref.setdefault(rec.ref_kf, []).append(rec)

    def _kf_slot_view(self) -> np.ndarray:
        """Occupied-slot mask: last device snapshot + host allocs since."""
        mask = self._kf_valid_host.copy()
        for s in self._recent_kf_allocs:
            mask[s] = True
        return mask

    def _has_free_kf_slot(self) -> bool:
        return bool((~self._kf_slot_view()).any())

    def _alloc_kf_slot(self) -> int | None:
        """First free keyframe slot, or None when the map is at capacity."""
        free = np.nonzero(~self._kf_slot_view())[0]
        if len(free) == 0:
            return None
        slot = int(free[0])
        self._mark_kf_slot(slot)
        return slot

    def _mark_kf_slot(self, slot: int) -> None:
        """Register a slot the engine is about to insert a keyframe into.

        Records the insertion number the device will assign, so a later
        snapshot can be classified as pre- or post-allocation."""
        self._recent_kf_allocs[slot] = self._seq_next
        self._seq_next += 1
        self._kf_valid_host[slot] = True

    def _observe_kf_meta(self, meta: "MapMeta") -> None:
        """Fold a device keyframe snapshot into the host slot view and
        re-anchor trajectory records whose reference keyframe was culled.

        A record stores T_cr with T_cw = T_cr o T_rw; when r is culled the
        device captured T_rp to its spanning-tree parent AT CULL TIME
        (``cull_R/cull_t`` — the reference's KeyFrame::SetBadFlag mTcp), so
        the re-anchor composes exact relative transforms and later BA /
        loop-closure moves of the parent propagate without error. Chains of
        simultaneous culls are walked through their cull records up to the
        first keyframe the snapshot still shows alive.
        """
        # surface landmark-freelist saturation (SURVEY.md §5 "no silent caps")
        if meta.lm_dropped > self.stats["lm_dropped"]:
            self.stats["lm_dropped"] = meta.lm_dropped
            if self.logger is not None:
                self.logger.log_event("lm_freelist_full", dropped=meta.lm_dropped)
        # retire host-side alloc entries the snapshot has caught up with
        for s, expected in list(self._recent_kf_allocs.items()):
            if meta.seq[s] >= expected:
                del self._recent_kf_allocs[s]
        pending = self._recent_kf_allocs
        newly_dead = [
            int(s)
            for s in np.nonzero(self._kf_valid_host & ~meta.valid)[0]
            if int(s) not in pending
        ]
        self._kf_valid_host = meta.valid.copy()
        for s in pending:
            self._kf_valid_host[s] = True

        for s in newly_dead:
            recs = self._recs_by_ref.pop(s, [])
            if not recs:
                continue
            hop = self._chain_to_live(meta, s)
            if hop is None:
                # orphaned: bake the absolute pose from the snapshot (gauge
                # anchors 0/1 are never culled, so this is a pathological-
                # map fallback)
                for rec in recs:
                    if rec.R_rel is None:
                        continue
                    rec.R = rec.R_rel @ meta.R[s]
                    rec.t = rec.R_rel @ meta.t[s] + rec.t_rel
                    rec.ref_kf, rec.R_rel, rec.t_rel = -1, None, None
                continue
            p, R_rp, t_rp = hop
            keep = self._recs_by_ref.setdefault(p, [])
            for rec in recs:
                if rec.R_rel is None:
                    rec.ref_kf = p
                else:
                    rec.t_rel = rec.R_rel @ t_rp + rec.t_rel
                    rec.R_rel = rec.R_rel @ R_rp
                    rec.ref_kf = p
                keep.append(rec)

    @staticmethod
    def _chain_to_live(meta: "MapMeta", s: int):
        """Walk cull records from dead slot ``s`` to a live ancestor.

        Returns (anchor_slot, R_sp, t_sp) with T_sp = T_sw o T_pw^-1 at cull
        time, composing through any ancestors culled in the same window, or
        None when no record exists (orphan fallback applies)."""
        if meta.cull_parent[s] < 0 or meta.cull_seq[s] != meta.seq[s]:
            return None
        p = int(meta.cull_parent[s])
        R_sp = meta.cull_R[s]
        t_sp = meta.cull_t[s]
        for _ in range(meta.valid.shape[0]):
            if p < 0:
                return None
            if meta.valid[p]:
                return p, R_sp, t_sp
            if meta.cull_parent[p] < 0 or meta.cull_seq[p] != meta.seq[p]:
                return None
            # T_s->pp = T_s->p o T_p->pp
            t_sp = R_sp @ meta.cull_t[p] + t_sp
            R_sp = R_sp @ meta.cull_R[p]
            p = int(meta.cull_parent[p])
        return None

    def _refresh_kf_meta_blocking(self) -> None:
        """Synchronous-path snapshot: one blocking pull right after keyframe
        processing (the pipelined paths piggyback this on their async pulls)."""
        self._observe_kf_meta(
            MapMeta(pack_map_meta(self.m), self.cfg.max_keyframes)
        )

    # --- monocular initialization (reference: MonocularInitialization) ---

    def _initialize(self, frame: FrameArrays, ts: float) -> FrameRecord:
        cfg = self.cfg
        if cfg.sensor != Sensor.MONOCULAR:
            return self._initialize_depth(frame, ts)
        n_valid = int(jnp.sum(frame.valid))
        if self._init_frame is None or n_valid < cfg.init_min_features:
            self._set_init_frame(frame, ts, n_valid)
            return self._record(ts, np.eye(3), np.zeros(3))

        mb, _ = matching.match_window(
            self._init_frame.desc, self._init_frame.uv, self._init_frame.valid,
            frame.desc, frame.uv, frame.valid,
            radius=100.0, max_dist=cfg.th_low, ratio=cfg.nn_ratio_init,
            angle_a=self._init_frame.angle, angle_b=frame.angle,
        )
        ok = mb >= 0
        if int(jnp.sum(ok)) < cfg.init_min_matches:
            self._set_init_frame(frame, ts, n_valid)
            return self._record(ts, np.eye(3), np.zeros(3))

        jb = jnp.clip(mb, 0, frame.uv.shape[0] - 1)
        uv2 = frame.uv[jb]
        self._key, sub = jax.random.split(self._key)
        res = initialize_two_view(
            self._init_frame.uv, uv2, ok,
            cfg.fx, cfg.fy, cfg.cx, cfg.cy, sub, iters=cfg.init_ransac_iters,
            min_good=cfg.init_min_good,
        )
        if not bool(res.success):
            # keep the init frame for a few attempts, then re-seed
            if self.frame_id - self._init_fid > 20:
                self._set_init_frame(frame, ts, n_valid)
            return self._record(ts, np.eye(3), np.zeros(3))

        # --- create the initial map (CreateInitialMapMonocular) ----------
        good = np.asarray(res.good)
        z = np.asarray(res.points)[:, 2]
        med = float(np.median(z[good])) if good.any() else 1.0
        med = max(med, 1e-6)
        X = res.points / med                      # scale-normalized, cam0 frame
        R1 = res.R
        t1 = res.t / med
        eye3 = jnp.eye(3, dtype=jnp.float32)
        zero3 = jnp.zeros(3, dtype=jnp.float32)

        m, slot_of = mapping.alloc_landmarks(
            self.m, X, self._init_frame.desc, self._init_frame.octave,
            res.good, jnp.int32(0), zero3, cfg,
        )
        L = cfg.max_landmarks
        lm0 = jnp.where(res.good & (slot_of < L), slot_of, INVALID_ID).astype(jnp.int32)
        F = frame.uv.shape[0]
        lm1 = jnp.full((F,), INVALID_ID, jnp.int32)
        lm1 = lm1.at[jnp.where(lm0 >= 0, jb, F)].set(
            jnp.where(lm0 >= 0, lm0, INVALID_ID), mode="drop"
        )
        m = mapping.insert_keyframe(
            m, self._init_frame, eye3, zero3, lm0,
            jnp.int32(self._init_fid), jnp.float32(self._init_ts),
            jnp.int32(0), jnp.int32(-1), cfg,
        )
        m = mapping.insert_keyframe(
            m, frame, R1, t1, lm1,
            jnp.int32(self.frame_id), jnp.float32(ts),
            jnp.int32(1), jnp.int32(0), cfg,
        )
        self.m = m
        self.kf_count = 2
        self._mark_kf_slot(0)
        self._mark_kf_slot(1)
        self.ref_kf = 1
        self.last_kf_frame_id = self.frame_id
        self.state = OK
        self._last_frame = frame
        self._last_lm_ids = lm1
        self._last_R = np.asarray(R1)
        self._last_t = np.asarray(t1)
        self._vel = None
        n_pts = int(jnp.sum(lm1 >= 0))
        self.last_kf_tracked = n_pts
        return self._record(ts, self._last_R, self._last_t, n_pts, ref_kf=1)

    def _initialize_depth(self, frame: FrameArrays, ts: float) -> FrameRecord:
        """Stereo/RGB-D bootstrap: first well-covered depth frame becomes KF0
        and spawns landmarks directly (reference: StereoInitialization)."""
        cfg = self.cfg
        n_depth = int(jnp.sum(frame.valid & (frame.depth > 0)))
        if n_depth < cfg.init_min_features:
            return self._record(ts, np.eye(3), np.zeros(3))
        eye3 = jnp.eye(3, dtype=jnp.float32)
        zero3 = jnp.zeros(3, dtype=jnp.float32)
        F = frame.uv.shape[0]
        lm_none = jnp.full((F,), INVALID_ID, jnp.int32)
        m = mapping.insert_keyframe(
            self.m, frame, eye3, zero3, lm_none,
            jnp.int32(self.frame_id), jnp.float32(ts),
            jnp.int32(0), jnp.int32(-1), cfg,
        )
        m = mapping.spawn_depth_landmarks(m, jnp.int32(0), cfg)
        self.m = m
        self.kf_count = 1
        self._mark_kf_slot(0)
        self.ref_kf = 0
        self.last_kf_frame_id = self.frame_id
        self.state = OK
        self._last_frame = frame
        self._last_lm_ids = self.m.kfs.obs_lm[0]
        self._last_R = np.eye(3, dtype=np.float32)
        self._last_t = np.zeros(3, dtype=np.float32)
        self._vel = None
        n_pts = int(jnp.sum(self.m.kfs.obs_lm[0] >= 0))
        self.last_kf_tracked = n_pts
        return self._record(ts, eye3, zero3, n_pts, ref_kf=0)

    def _set_init_frame(self, frame, ts, n_valid):
        self._init_frame = frame if n_valid >= self.cfg.init_min_features else None
        self._init_ts = ts
        self._init_fid = self.frame_id

    # --- per-frame tracking (reference: Track() with state OK) -----------

    def _track(self, frame: FrameArrays, ts: float) -> FrameRecord:
        cfg = self.cfg
        if self.state == LOST:
            rec = self._try_relocalize(frame, ts)
            if rec is not None:
                return rec
            # fall through: retry tracking from the last known pose
        # constant-velocity prediction
        if self._vel is not None:
            Rv, tv = self._vel
            R_pred = Rv @ self._last_R
            t_pred = Rv @ self._last_t + tv
        else:
            R_pred, t_pred = self._last_R, self._last_t
        R_pred = jnp.asarray(R_pred)
        t_pred = jnp.asarray(t_pred)

        use_st = cfg.sensor != Sensor.MONOCULAR and cfg.bf > 0
        R_cur_d, t_cur_d, lm_ids, packed, counts = tracking.fused_track_step(
            self.m, self._last_lm_ids, frame, R_pred, t_pred,
            jnp.asarray(self._last_R), jnp.asarray(self._last_t),
            jnp.int32(self.ref_kf), cfg, use_stereo=use_st,
        )
        self.m = tracking.apply_track_counts(self.m, counts)
        p = np.asarray(packed)          # the single per-frame host sync
        n_tracked = int(p[24])
        if n_tracked < cfg.min_inliers_local:
            return self._handle_lost(frame, ts)
        res = tracking.TrackOut(R_cur_d, t_cur_d)
        self._packed = p

        R_cur = p[:9].reshape(3, 3)
        t_cur = p[9:12]
        # velocity: T_cur o T_last^-1
        self._vel = (
            R_cur @ self._last_R.T,
            t_cur - (R_cur @ self._last_R.T) @ self._last_t,
        )
        self._last_R, self._last_t = R_cur, t_cur
        self._last_frame = frame
        self._last_lm_ids = lm_ids
        self.state = OK

        if self._need_keyframe(n_tracked):
            self._create_keyframe(frame, ts, res.R, res.t, lm_ids, n_tracked)
            # the frame's pose may have been BA-refined inside keyframe creation
            R_cur, t_cur = self._last_R, self._last_t
            return self._record(ts, R_cur, t_cur, n_tracked, ref_kf=self.ref_kf)
        # non-KF frame: the relative pose came back in the packed transfer
        rec = FrameRecord(
            frame_id=self.frame_id, timestamp=ts, R=R_cur, t=t_cur,
            state=self.state, n_tracked=n_tracked, ref_kf=self.ref_kf,
            R_rel=p[12:21].reshape(3, 3), t_rel=p[21:24],
        )
        return rec

    def _handle_lost(self, frame: FrameArrays, ts: float) -> FrameRecord:
        self.state = LOST
        self._last_frame = frame
        self._vel = None
        ref = self.ref_kf if self.kf_count > 0 else -1
        return self._record(ts, self._last_R, self._last_t, 0, ref_kf=ref)

    # --- place recognition & relocalization ---------------------------

    def _ensure_vocab(self):
        """Train — and periodically retrain — the codebook from map
        descriptors (the reference instead loads a shipped 145 MB vocabulary
        at startup). The codebook is learned at ``vocab_min_kfs`` keyframes
        and re-learned whenever the keyframe count has doubled since, so the
        words keep tracking the scene's descriptor distribution; tf-idf
        weights come from the keyframe corpus itself (reference:
        TemplatedVocabulary leaf weights from its offline training set)."""
        if self.kf_count < self.cfg.vocab_min_kfs:
            return
        if (
            self._vocab is not None
            and self.kf_count < 2 * max(self._vocab_trained_kfs, 1)
        ):
            return
        from . import vocab as _vocab

        kfs = self.m.kfs
        K, F = kfs.obs_lm.shape
        desc = kfs.desc.reshape(K * F, 8)
        valid = (kfs.feat_valid & kfs.valid[:, None]).reshape(K * F)
        self._key, sub = jax.random.split(self._key)
        # retrains warm-start from the current codebook (k-medians converges
        # fast from a near-solution); fresh trains seed from a random sample
        # computed HERE so both calls share one jit signature — a doubling
        # retrain mid-sequence must never pay a fresh compile
        W = self.cfg.vocab_words
        if self._vocab is None:
            p = valid.astype(jnp.float32)
            p = p / jnp.maximum(jnp.sum(p), 1.0)
            self._key, sub2 = jax.random.split(self._key)
            init = desc[jax.random.choice(sub2, K * F, (W,), replace=True, p=p)]
        else:
            init = self._vocab.words
        self._vocab = _vocab.train_vocab(
            desc, valid, sub, n_words=W, iters=4, init_words=init
        )
        if W >= 8192:
            # ORBvoc-scale codebooks get the two-level quantizer: coarse
            # argmin + in-cell argmin is O(sqrt(W)) per descriptor instead
            # of the [N, W] flat product (vocab.build_two_level)
            self._vocab = _vocab.build_two_level(
                self._vocab, n_coarse=max(64, int(np.sqrt(W)))
            )
        self._vocab_trained_kfs = self.kf_count
        # idf from the keyframe corpus: one quantize pass over every KF's
        # descriptors; invalid slots quantize to the sentinel word and fall
        # out of the document-frequency counts
        wid = _vocab.quantize(self._vocab, desc, valid)
        doc_ids = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, F)
        ).reshape(-1)
        self._vocab = _vocab.compute_idf(
            self._vocab, wid, doc_ids, K, n_live=jnp.sum(kfs.valid)
        )
        # (re)build BoW rows for existing keyframes under the new codebook —
        # one batched pass (a per-row host loop is ~5x the device time and
        # lands inside the benchmark's timed region at every retrain)
        self._bow_db = _vocab.bow_db_rows(
            self._vocab, kfs.desc, kfs.feat_valid & kfs.valid[:, None]
        )

    def _update_bow_row(self, slot: int):
        from . import vocab as _vocab

        if self._vocab is None:
            return
        kfs = self.m.kfs
        v = _vocab.bow_vector(
            self._vocab, kfs.desc[slot], kfs.feat_valid[slot]
        )
        self._bow_db = self._bow_db.at[slot].set(v)

    def _try_relocalize(self, frame: FrameArrays, ts: float):
        """BoW candidates -> PnP RANSAC -> pose refine (reference:
        Tracking::Relocalization via DetectRelocalizationCandidates + EPnP).
        Returns a FrameRecord on success, None on failure."""
        from . import vocab as _vocab
        from .pnp import solve_pnp_ransac

        self._ensure_vocab()
        if self._vocab is None:
            return None
        cfg = self.cfg
        q = _vocab.bow_vector(self._vocab, frame.desc, frame.valid)
        scores = _vocab.bow_l1_scores(q, self._bow_db)
        scores = jnp.where(self.m.kfs.valid, scores, -1.0)
        # candidate gating (reference: DetectRelocalizationCandidates):
        # shared-word count gate at 0.8 * max, then covisibility-group
        # accumulated scores — try each group's best member, best group first
        common = np.array(
            jnp.dot(
                (self._bow_db > 0).astype(jnp.float32),
                (q > 0).astype(jnp.float32),
            )
        )
        scores = np.asarray(scores)
        valid = np.asarray(self.m.kfs.valid)
        common[~valid] = 0.0
        cand_mask = valid & (scores > 0.0)
        if cand_mask.any():
            max_cw = common[cand_mask].max()
            if max_cw > 0:
                cand_mask &= common >= 0.8 * max_cw
        cands = np.nonzero(cand_mask)[0]
        if len(cands) > 1:
            covis = np.asarray(self.m.covis)  # blocking pull; reloc is rare
            acc = np.empty(len(cands), np.float32)
            best_member = np.empty(len(cands), np.int64)
            for i, c in enumerate(cands):
                group = (covis[int(c)] > 0) & cand_mask
                group[int(c)] = True
                members = np.nonzero(group)[0]
                acc[i] = scores[members].sum()
                best_member[i] = members[np.argmax(scores[members])]
            keep = acc >= 0.75 * acc.max()
            order = [
                int(c)
                for c in np.unique(best_member[keep])[
                    np.argsort(-scores[np.unique(best_member[keep])])
                ]
            ][:3]
        else:
            order = [int(c) for c in cands]
        for cand in order:
            cand = int(cand)
            if float(scores[cand]) <= 0.0:
                break
            lm_ids, n = tracking.match_reference_kf(
                self.m, jnp.int32(cand), frame, cfg
            )
            if int(n) < 15:
                continue
            X, uv, inv_s2, valid = tracking.gather_track_problem(
                self.m, frame, lm_ids, cfg
            )
            self._key, sub = jax.random.split(self._key)
            pnp = solve_pnp_ransac(
                X, uv, valid, cfg.fx, cfg.fy, cfg.cx, cfg.cy, sub,
                iters=cfg.pnp_ransac_iters,
            )
            if not bool(pnp.success):
                continue
            res = pose_optimization(
                pnp.R, pnp.t, X, uv, inv_s2, valid,
                cfg.fx, cfg.fy, cfg.cx, cfg.cy, chi2_th=cfg.chi2_mono,
            )
            if int(res.n_inliers) < cfg.reloc_min_inliers:
                continue
            # recovered
            lm_ids = jnp.where(res.inlier, lm_ids, INVALID_ID)
            self.state = OK
            self.ref_kf = cand
            self._ref_kf_dev = None
            self._last_R = np.asarray(res.R)
            self._last_t = np.asarray(res.t)
            self._last_frame = frame
            self._last_lm_ids = lm_ids
            self._vel = None
            return self._record(
                ts, res.R, res.t, int(res.n_inliers), ref_kf=cand
            )
        return None

    # --- keyframe policy (reference: NeedNewKeyFrame) --------------------

    def _need_keyframe(self, n_tracked: int, fid: int | None = None) -> bool:
        if self.localization_only:
            return False
        if not self._has_free_kf_slot():
            # at capacity: culling normally runs inside keyframe processing,
            # which a full map can no longer reach — run a standalone cull
            # pass so redundancy keeps freeing slots (no monotonic hard stop)
            self.stats["kf_slot_full"] += 1
            if self.logger is not None:
                self.logger.log_event(
                    "kf_slots_full", count=self.stats["kf_slot_full"]
                )
            self.m = mapping.cull_keyframes(
                self.m, jnp.int32(self.ref_kf), self.cfg
            )
            if not self._pending_b and not self._pending:
                # sync path has no piggybacked snapshot to learn the freed
                # slot from — refresh now (batch mode reads the next pull)
                self._refresh_kf_meta_blocking()
            return False
        fid = self.frame_id if fid is None else fid
        if self._pending:
            # per-frame pipelined mode: frames resolved now were launched
            # before the last keyframe's map update landed — without a
            # cooldown the weak/starving triggers re-fire on every lagged
            # frame
            if fid - self.last_kf_frame_id < len(self._pending) + 2:
                return False
        if self._pending_b:
            # batch mode: the KF decision already runs once per batch, so
            # candidates arrive B frames apart; require only that at least
            # one full batch passed since the last keyframe (a tighter
            # lag-based cooldown starves map growth at exactly the moment
            # tracking is decaying)
            batch_len = len(self._pending_b[0][1])
            if fid - self.last_kf_frame_id < batch_len:
                return False
        since = fid - self.last_kf_frame_id
        if since < 1:
            return False
        weak = n_tracked < self.cfg.kf_tracked_ratio * max(self.last_kf_tracked, 1)
        # absolute floor: replenish the map before tracking starves, even if
        # the previous keyframe was itself weak (reference inserts whenever
        # mapping is idle; we have no idle gate, so use a tracked floor)
        starving = n_tracked < 2 * self.cfg.min_inliers_local
        stale = since >= self.kf_interval
        return ((weak or starving) and n_tracked > 15) or stale

    def _create_keyframe(self, frame, ts, R, t, lm_ids, n_tracked):
        cfg = self.cfg
        slot = self._alloc_kf_slot()
        if slot is None:
            return
        self.m = mapping.process_new_keyframe(
            self.m, frame, R, t, lm_ids,
            jnp.int32(self.frame_id), jnp.float32(ts),
            jnp.int32(slot), jnp.int32(self.ref_kf), cfg,
            spawn_depth=cfg.sensor != Sensor.MONOCULAR,
            n_neighbors=cfg.kf_tri_neighbors,
        )
        if self.kf_count >= 2:
            from .optim.local_ba import local_bundle_adjustment

            self.m = local_bundle_adjustment(
                self.m, slot, cfg, iters=cfg.local_ba_iters
            )
            # continue tracking from the BA-refined keyframe pose (the
            # velocity prior stays: BA shifts are tiny vs frame motion)
            self._last_R = np.asarray(self.m.kfs.R[slot])
            self._last_t = np.asarray(self.m.kfs.t[slot])
        # refresh this frame's associations with the new landmarks
        self._last_lm_ids = self.m.kfs.obs_lm[slot]
        self.ref_kf = slot
        self._ref_kf_dev = None
        self.kf_count += 1
        self.last_kf_frame_id = self.frame_id
        self.last_kf_tracked = n_tracked
        self._ensure_vocab()
        self._update_bow_row(slot)
        self._detect_and_close_loop(slot)
        # learn of any keyframe the processing chain culled (sync path has
        # no piggybacked snapshot); re-anchors that KF's trajectory records
        self._refresh_kf_meta_blocking()

    def _detect_and_close_loop(self, slot: int, dispatch_only: bool = False):
        """Per-keyframe loop detection/closure (reference: LoopClosing::Run)."""
        if (
            not self.loop_closing_enabled
            or self._vocab is None
            or self.kf_count <= 10
        ):
            return
        if dispatch_only:
            # batch mode: queue the detection; its vector is pulled fused
            # with the next batch's packed result and evaluated there
            self._loop.dispatch(
                self.m, self._bow_db, self._vocab, slot, stamp=self.kf_count
            )
            return
        det_kf, cands = self._loop.detect(
            self.m, self._bow_db, self._vocab, slot, stamp=self.kf_count
        )
        self._close_loop_from(det_kf, cands)

    def _close_loop_from(self, det_kf: int, cands) -> None:
        if not cands:
            return
        # detection lags evaluation by a keyframe: any slot involved may have
        # been culled and RECYCLED into an unrelated new keyframe since.
        # Verify insertion numbers against the live map before trusting a
        # slot (one small blocking pull, only when candidates exist — rare).
        seq_now = np.asarray(self.m.kfs.seq)
        valid_now = np.asarray(self.m.kfs.valid)
        det_seq = getattr(self._loop, "last_eval_det_seq", None)
        if not valid_now[det_kf] or (
            det_seq is not None and int(seq_now[det_kf]) != det_seq
        ):
            return
        for c, c_seq in cands:
            if not valid_now[c] or int(seq_now[c]) != c_seq:
                continue
            self._key, sub = jax.random.split(self._key)
            lc = self._loop.compute_sim3(self.m, det_kf, c, sub)
            if lc is None:
                continue
            # a GBA still in flight optimized the pre-correction graph:
            # abandon it (reference: mbStopGBA aborts the running thread
            # before CorrectLoop relaunches a fresh one)
            self._gba = None
            self.m = self._loop.correct(self.m, det_kf, lc, self.cfg)
            # refine the whole map after the topological correction;
            # landmark-sharded over the device mesh when one is available
            if self.gba_async:
                # chunked across subsequent tracked batches (reference: the
                # transient RunGlobalBundleAdjustment thread)
                self._start_gba(self.gba_iters)
            else:
                from .optim.global_ba import global_bundle_adjustment

                self.m = global_bundle_adjustment(
                    self.m, self.cfg, iters=8, mesh=self.mesh,
                    stats=self.stats,
                )
            # resume tracking from the corrected latest-keyframe pose
            self._last_R = np.asarray(self.m.kfs.R[self.ref_kf])
            self._last_t = np.asarray(self.m.kfs.t[self.ref_kf])
            self._vel = None
            # in-flight device tracking state predates the correction
            self._dev_state = None
            break

    # --- asynchronous loop-closure GBA --------------------------------

    def _start_gba(self, iters: int) -> None:
        """Snapshot the map and start a chunked full-map BA.

        Reference: ``LoopClosing::CorrectLoop`` launching
        ``RunGlobalBundleAdjustment`` on a transient thread. Here the solve
        advances one LM iteration per tracked batch (``_gba_tick``) so the
        per-frame stall is bounded by one PCG chunk instead of the whole
        multi-second solve, then merges via ``fold_gba_result``.
        """
        from .optim.global_ba import (
            GBASnapshot,
            build_global_problem,
            shard_problem,
        )
        from .optim.schur_pcg import lm_init_pcg

        prob, n_dropped = build_global_problem(self.m, self.cfg)
        self.stats["gba_runs"] += 1
        self.stats["gba_obs_dropped"] += int(n_dropped)
        if self.logger is not None and int(n_dropped):
            self.logger.log_event("gba_obs_dropped", n=int(n_dropped))
        if self.mesh is not None:
            prob = shard_problem(prob, self.mesh)
        snap = GBASnapshot(self.m)
        carry = lm_init_pcg(prob, self.cfg, chi2_th=self.cfg.chi2_mono)
        # bound the per-tick stall at capacity-scale maps: truncated CG +
        # loose tolerance per LM iteration (inexact Newton; KERNELS.md has
        # the measured tick times). Small maps keep the full budget.
        big = prob.lm_ids.shape[0] > 65536
        self._gba = {"prob": prob, "snap": snap, "carry": carry,
                     "left": int(iters),
                     "cg_iters": 16 if big else 48,
                     "cg_tol": 1e-4 if big else 1e-6}

    def _gba_tick(self) -> None:
        """Advance the in-flight GBA by one LM iteration (async dispatch)."""
        if self._gba is None:
            return
        from .optim.schur_pcg import lm_steps_pcg

        g = self._gba
        g["carry"] = lm_steps_pcg(
            g["prob"], self.cfg, g["carry"], chi2_th=self.cfg.chi2_mono,
            cg_iters=g["cg_iters"], cg_tol=g["cg_tol"],
            chunk=self.mesh is None,
        )
        g["left"] -= 1
        if g["left"] <= 0:
            self._finish_gba()

    def _finish_gba(self) -> None:
        """Fold the finished GBA into the live map and re-anchor tracking."""
        from .optim.global_ba import fold_gba_result

        g = self._gba
        self._gba = None
        R, t, xyz = g["carry"][:3]
        R = geo.orthogonalize(R)
        if self.mesh is not None:
            dev = jax.devices()[0]
            R, t, xyz = jax.device_put((R, t, xyz), dev)
        snap = g["snap"]
        self.m = fold_gba_result(
            self.m, snap.kf_seq, snap.kf_valid, snap.lm_valid,
            snap.lm_first_seq, snap.lm_ref, R, t, xyz,
        )
        self._last_R = np.asarray(self.m.kfs.R[self.ref_kf])
        self._last_t = np.asarray(self.m.kfs.t[self.ref_kf])
        self._vel = None
        self._dev_state = None
        self._refresh_kf_meta_blocking()
