"""The per-frame tracking pipeline as one fused jitted step.

TPU-first redesign of Tracking (/root/reference/src/sg-slam/src/Tracking.cc):
the reference's per-frame sequence — Frame construction (ORB extraction),
TrackWithMotionModel (projective search radius 15 + motion-only BA,
Tracking.cc:906-967), TrackLocalMap (local-point search + second BA,
:969-1014), keyframe-need counters (:1016-1113) — becomes ONE jitted
fixed-shape program `track_step`, so a tracked frame costs a single
host->device round trip (image in, pose out; SURVEY.md §7 hard-part #7).

The state machine (init / OK / lost handling, KF insertion, local BA) stays
on the host in `Tracker` — the analogue of the reference's thread glue, with
queues replaced by plain Python control flow around jitted stages.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..geometry.camera import backproject
from ..mapstate import local_map as lm
from ..mapstate import mapstate as ms
from ..matching import search
from ..ops import orb
from ..optim import local_ba, pose_opt

NO_POINT = ms.NO_POINT


@partial(jax.jit, static_argnums=(0,))
def extract_frame(cfg: SlamConfig, gray, depth) -> orb.Features:
    feats = orb.extract(gray, cfg.orb, cfg.camera)
    return orb.attach_rgbd(feats, depth, cfg.camera)


@partial(jax.jit, static_argnums=(0,))
def extract_frame_stereo(cfg: SlamConfig, gray_l, gray_r) -> orb.Features:
    """Stereo frame construction: extract on the left image, fill
    u_right/depth by rectified epipolar SAD search in the right image
    (the stereo Frame constructor, Frame.cc:87-127 + ComputeStereoMatches
    Frame.cc:716-890)."""
    from ..ops import stereo as stereo_ops

    feats = orb.extract(gray_l, cfg.orb, cfg.camera)
    return stereo_ops.attach_stereo(cfg.camera, feats, gray_l, gray_r)


@partial(jax.jit, static_argnums=(0,))
def extract_frame_mono(cfg: SlamConfig, gray) -> orb.Features:
    """Monocular frame construction: no depth, u_right < 0 everywhere
    (pose optimization then uses the 2-dof mono residual)."""
    return orb.extract(gray, cfg.orb, cfg.camera)


@partial(jax.jit, static_argnums=(0,))
def track_step(cfg: SlamConfig, m: ms.MapState, feats: orb.Features,
               Tcw_pred):
    """Track one frame against the map. Returns
    (Tcw, matched_pids [N], n_inliers, n_close_tracked).

    Stage 1 = TrackWithMotionModel contract: wide projective search
    (radius 15 px) at the predicted pose + motion-only BA.
    Stage 2 = TrackLocalMap contract: re-project at the refined pose,
    tight search (radius by viewing angle), second BA, inlier counts.
    """
    t = cfg.tracker
    local = lm.select_local_points(cfg.camera, m, Tcw_pred,
                                   scale_factor=cfg.orb.scale_factor,
                                   capacity=cfg.capacity.local_points)

    def associate_and_optimize(Tcw_in, radius_mult, max_dist, prev_ok):
        # project local points at the current pose estimate
        pc = se3.se3_apply(Tcw_in[None], local.pos)
        from ..geometry.camera import project

        proj = project(cfg.camera, pc)
        idx, ok, dist = search.search_by_projection(
            proj, local.radius * radius_mult, local.pred_level,
            local.desc, local.valid & (pc[..., 2] > 0.1),
            feats.xy, feats.level, feats.desc, feats.valid,
            level_window=1, max_dist=max_dist,
            scale_factor=cfg.orb.scale_factor)
        ok = search.resolve_duplicate_targets(idx, ok, dist, feats.capacity)
        obs = jnp.stack([feats.xy[idx, 0], feats.xy[idx, 1],
                         feats.u_right[idx]], -1)
        lv = feats.level[idx].astype(jnp.float32)
        inv_s2 = (1.0 / cfg.orb.scale_factor ** 2) ** lv
        Tcw, inl, n = pose_opt.pose_optimization(
            cfg.camera, Tcw_in, local.pos, obs, inv_s2, ok,
            rounds=rounds, iters=iters, guarded=False)
        return Tcw, idx, ok & inl, n

    # Stage 1: wide search at predicted pose (motion-model contract)
    rounds, iters = t.pose_opt_rounds_stage1, t.pose_opt_iters_stage1
    Tcw1, _, _, n1 = associate_and_optimize(
        Tcw_pred, t.search_radius_motion / 4.0,
        100, None)  # th_high=100 like SearchByProjection last-frame

    # Fallback when the windowed search fails (large/unmodeled motion):
    # descriptor-only brute force vs the local points, the contract of
    # TrackReferenceKeyFrame's SearchByBoW path (Tracking.cc:796-860).
    def brute_force(_):
        idx, ok, dist = search.match_by_descriptor(
            local.desc, local.valid, feats.desc, feats.valid, cfg.matcher,
            max_dist=cfg.matcher.th_low, mutual=True)
        ok = search.resolve_duplicate_targets(idx, ok, dist, feats.capacity)
        obs = jnp.stack([feats.xy[idx, 0], feats.xy[idx, 1],
                         feats.u_right[idx]], -1)
        lv = feats.level[idx].astype(jnp.float32)
        inv_s2 = (1.0 / cfg.orb.scale_factor ** 2) ** lv
        Tcw, inl, n = pose_opt.pose_optimization(
            cfg.camera, Tcw_pred, local.pos, obs, inv_s2, ok)
        return Tcw

    Tcw1 = jax.lax.cond(n1 >= t.min_matches_motion, lambda _: Tcw1,
                        brute_force, None)
    # Stage 2: tight local-map association at refined pose
    rounds, iters = t.pose_opt_rounds_stage2, t.pose_opt_iters_stage2
    Tcw2, idx2, ok2, n2 = associate_and_optimize(
        Tcw1, 1.0, 100, None)

    # per-feature matched point ids (invert point->feature matches)
    slot = jnp.where(ok2, idx2, feats.capacity)
    matched = jnp.full((feats.capacity + 1,), NO_POINT, jnp.int32).at[
        slot].set(local.ids, mode="drop")[:feats.capacity]

    # close-point bookkeeping for the KF decision (Tracking.cc:1040-1113)
    close = (feats.depth > 0) & (feats.depth < cfg.close_depth_threshold)
    tracked_close = jnp.sum((matched >= 0) & close)
    untracked_close = jnp.sum((matched < 0) & close & feats.valid)

    return Tcw2, matched, n2, tracked_close, untracked_close


@partial(jax.jit, static_argnums=(0,))
def local_ba_step(cfg: SlamConfig, m: ms.MapState, center_kf):
    """Covisibility window -> BA -> writeback, fully on device.

    Replaces LocalMapping's per-KF Optimizer::LocalBundleAdjustment call.
    """
    cap = cfg.capacity
    # temporal window (sequential KFs ARE the covisible set for a moving
    # RGB-D camera; the covisibility-ranked variant lives in lm.ba_window
    # and is used on loop-closure paths where temporal adjacency breaks)
    ids, opt_mask = lm.ba_window_temporal(m, center_kf,
                                          window=cap.local_window,
                                          n_fixed=cap.local_window // 2)
    prob, pids = lm.build_ba_problem(cfg.camera, m, ids, opt_mask,
                                     max_points=cap.local_points,
                                     scale_factor=cfg.orb.scale_factor)
    poses, points, inlier = local_ba.bundle_adjust(
        cfg.camera, prob, iters1=cfg.tracker.local_ba_iters1,
        iters2=cfg.tracker.local_ba_iters2)
    return lm.writeback_ba(m, ids, opt_mask, poses, pids, points)


@partial(jax.jit, static_argnums=(0,))
def local_ba_cov_step(cfg: SlamConfig, m: ms.MapState, center_kf, cov):
    # NOTE: runs bundle_adjust with a 10x tighter convergence tol than the
    # hot path — this is the post-loop-closure window, whose residual
    # after an essential-graph correction is far from converged
    """Covisibility-ranked local BA around `center_kf`.

    The loop-closure path's window (Optimizer.cc:456-504 builds the BA
    window from covisible keyframes): after a closure joins two trajectory
    segments, the covisible set spans BOTH sides of the loop — temporal
    adjacency (ba_window_temporal) would miss the far side entirely. `cov`
    is the dense covisibility matrix the loop path already materialized.
    """
    cap = cfg.capacity
    ids, opt_mask = lm.ba_window(m, center_kf, cov,
                                 window=cap.local_window,
                                 n_fixed=cap.local_window // 2)
    prob, pids = lm.build_ba_problem(cfg.camera, m, ids, opt_mask,
                                     max_points=cap.local_points,
                                     scale_factor=cfg.orb.scale_factor)
    poses, points, inlier = local_ba.bundle_adjust(
        cfg.camera, prob, iters1=cfg.tracker.local_ba_iters1,
        iters2=cfg.tracker.local_ba_iters2)
    return lm.writeback_ba(m, ids, opt_mask, poses, pids, points)


@partial(jax.jit, static_argnums=(0,))
def process_new_keyframe(cfg: SlamConfig, m: ms.MapState, kf_id):
    """The full per-keyframe back-end pass, fully on device.

    Mirrors LocalMapping::Run's sequence per new keyframe
    (/root/reference/src/sg-slam/src/LocalMapping.cc:61-87):
    MapPointCulling -> CreateNewMapPoints (epipolar triangulation with the
    previous keyframe) -> SearchInNeighbors (duplicate fusion) ->
    LocalBundleAdjustment -> KeyFrameCulling.
    """
    from ..mapstate import maintenance as mt

    m = mt.cull_map_points(m)
    prev = mt.prev_valid_kf(m, kf_id)
    m = jax.lax.cond(
        prev >= 0,
        lambda mm: mt.triangulate_new_points(
            cfg.camera, mm, kf_id, jnp.maximum(prev, 0),
            scale_factor=cfg.orb.scale_factor),
        lambda mm: mm, m)
    m = mt.fuse_duplicates(cfg.camera, m, kf_id,
                           scale_factor=cfg.orb.scale_factor,
                           max_candidates=cfg.capacity.local_points)
    n_valid = jnp.sum(m.kf_valid.astype(jnp.int32))
    m = jax.lax.cond(n_valid >= 3,
                     lambda mm: local_ba_step(cfg, mm, kf_id),
                     lambda mm: mm, m)
    return mt.cull_keyframes(m)


class Tracker:
    """Host-side state machine (System+Tracking facade without semantics).

    States mirror Tracking.h:93-99: NOT_INITIALIZED -> OK; LOST on inlier
    collapse (relocalization lands in a later milestone — on loss we coast
    on the motion model, which the reference's VO fallback approximates).
    """

    def __init__(self, cfg: SlamConfig, local_ba_every: int = 1):
        self.cfg = cfg
        self.map = ms.empty_map(cfg.capacity, cfg.orb.max_keypoints)
        self.state = "NOT_INITIALIZED"
        # localization-only mode: track against the frozen map, never
        # insert keyframes (System::ActivateLocalizationMode contract,
        # System.cc:345-355 / Tracking.cc "mbOnlyTracking")
        self.only_tracking = False
        self.Tcw = se3.se3_identity()
        self.velocity = se3.se3_identity()
        self.last_Tcw = se3.se3_identity()
        self.frame_id = 0
        self.last_kf_frame_id = -999
        self.ref_matches = 200     # match count at the reference keyframe
        self.n_kf = 0
        self.local_ba_every = local_ba_every
        self.on_compaction = None    # callback(kf_old_to_new, old_valid)
        self.compactions = 0
        self.last_reloc_frame_id = -999
        self.trajectory: list[np.ndarray] = []
        # trajectory as relative poses against the reference keyframe, so a
        # loop/GBA correction of keyframes retroactively corrects every
        # frame (System::SaveTrajectoryTUM contract, System.cc:424-453)
        self.traj_ref_kf: list[int] = []
        self.traj_rel: list[np.ndarray] = []
        self.n_inliers_hist: list[int] = []

    # -- keyframe policy (contract of Tracking::NeedNewKeyFrame) --
    def _need_new_kf(self, n_inliers, tracked_close, untracked_close):
        t = self.cfg.tracker
        since = self.frame_id - self.last_kf_frame_id
        if since < 1:
            return False
        need_close = (tracked_close < 100) and (untracked_close > 70)
        c1 = since >= t.max_frames_between_kf
        # relative to the reference keyframe's match count
        # (Tracking.cc:1085-1113: mnMatchesInliers < nRefMatches*ratio)
        c2 = (n_inliers < self.ref_matches * t.kf_tracked_ratio
              or need_close)
        return bool(c1 or (c2 and n_inliers > 15))

    def _insert_kf(self, feats, matched):
        kf_slot = int(self.map.next_kf)
        self.map = ms.insert_keyframe(
            self.cfg.camera, self.cfg.orb.scale_factor, self.map, feats,
            self.Tcw, self.frame_id, matched,
            self.cfg.close_depth_threshold)
        self.last_kf_frame_id = self.frame_id
        self.n_kf += 1
        self.kf_inserted = True
        self.last_kf_id = kf_slot
        # full back-end pass per keyframe (LocalMapping::Run contract):
        # point culling, triangulation, fusion, local BA, KF culling
        if self.n_kf >= 2 and (self.n_kf % self.local_ba_every == 0):
            self.map = process_new_keyframe(self.cfg, self.map,
                                            jnp.asarray(kf_slot))
        self._maybe_compact()

    def _maybe_compact(self):
        """Repack the map when monotonic slot allocation nears capacity.

        Frames recorded relative to a culled keyframe are re-anchored to
        absolute poses first (their reference slot's data is about to be
        reused), then reference-KF slot ids are remapped.
        """
        from ..mapstate import maintenance as mt

        m = self.map
        if (int(m.next_kf) < m.max_kf - 4
                and int(m.next_pt) < m.max_pt - 2048):
            return
        kf_valid = np.asarray(m.kf_valid)
        kf_pose = np.asarray(m.kf_pose)
        m2, kf_map, _ = mt.compact_map(m)
        kf_map = np.asarray(kf_map)
        for i, ref in enumerate(self.traj_ref_kf):
            if ref < 0:
                continue
            if kf_valid[ref]:
                self.traj_ref_kf[i] = int(kf_map[ref])
            else:  # anchor KF was culled: bake the absolute pose
                T_abs = se3.se3_compose(jnp.asarray(self.traj_rel[i]),
                                        jnp.asarray(kf_pose[ref]))
                self.traj_ref_kf[i] = -1
                self.traj_rel[i] = np.asarray(T_abs)
                self.trajectory[i] = np.asarray(T_abs)
        if self.last_kf_id >= 0 and kf_valid[self.last_kf_id]:
            self.last_kf_id = int(kf_map[self.last_kf_id])
        self.map = m2
        self.compactions = getattr(self, "compactions", 0) + 1
        if self.on_compaction is not None:
            self.on_compaction(kf_map, kf_valid)

    def process_stereo(self, gray_l, gray_r) -> np.ndarray:
        """Track one rectified stereo pair (System::TrackStereo role):
        identical state machine — stereo depth stands in for RGB-D depth."""
        feats = extract_frame_stereo(self.cfg, jnp.asarray(gray_l),
                                     jnp.asarray(gray_r))
        return self.process(gray_l, None, feats=feats)

    def process(self, gray, depth, feats=None) -> np.ndarray:
        """Track one RGB-D frame; returns Tcw [7] (numpy).

        `feats` may be supplied by the caller (System does this to run
        semantic dynamic rejection between extraction and tracking).
        """
        self.kf_inserted = False
        if feats is None:
            feats = extract_frame(self.cfg, gray, depth)

        if self.state == "NOT_INITIALIZED":
            # StereoInitialization contract (Tracking.cc:548-600):
            # need enough keypoints with depth
            n_ok = int(jnp.sum(feats.valid & (feats.depth > 0)))
            if n_ok >= 200:
                self.Tcw = se3.se3_identity()
                matched = jnp.full((feats.capacity,), NO_POINT, jnp.int32)
                self._insert_kf(feats, matched)
                self.state = "OK"
            self._record()
            self.frame_id += 1
            return np.asarray(self.Tcw)

        Tcw_pred = se3.se3_compose(self.velocity, self.last_Tcw)
        Tcw, matched, n_inl, tracked_close, untracked_close = track_step(
            self.cfg, self.map, feats, Tcw_pred)
        n_inl = int(n_inl)
        self.n_inliers_hist.append(n_inl)

        # TrackLocalMap inlier gates (Tracking.cc:1006-1012): 50 inliers
        # required shortly after a relocalization, 30 otherwise
        t = self.cfg.tracker
        recently_relocated = (self.frame_id - self.last_reloc_frame_id
                              < t.max_frames_between_kf)
        min_inl = (t.min_inliers_after_reloc if recently_relocated
                   else t.min_inliers_local_map)
        if n_inl < min_inl:
            # lost: coast on the motion model; the System facade attempts
            # relocalization against the keyframe database
            self.state = "LOST"
            self.Tcw = Tcw_pred
        else:
            self.state = "OK"
            self.Tcw = Tcw
            if not self.only_tracking and self._need_new_kf(
                    n_inl, int(tracked_close), int(untracked_close)):
                self.ref_matches = max(n_inl, 30)
                self._insert_kf(feats, matched)

        self.velocity = se3.se3_compose(self.Tcw,
                                        se3.se3_inverse(self.last_Tcw))
        self._record()
        self.last_Tcw = self.Tcw
        self.frame_id += 1
        return np.asarray(self.Tcw)

    def force_pose(self, Tcw):
        """Install an externally recovered pose (relocalization)."""
        self.Tcw = jnp.asarray(Tcw)
        self.last_Tcw = self.Tcw
        self.velocity = se3.se3_identity()
        self.state = "OK"
        self.last_reloc_frame_id = self.frame_id
        if self.trajectory:
            self.trajectory.pop()
            self.traj_ref_kf.pop()
            self.traj_rel.pop()
            self._record()

    def _record(self):
        self.trajectory.append(np.asarray(self.Tcw))
        ref = self.last_kf_id if self.n_kf > 0 else -1
        self.traj_ref_kf.append(ref)
        if ref < 0:
            self.traj_rel.append(np.asarray(self.Tcw))
        else:
            T_rel = se3.se3_compose(
                jnp.asarray(self.Tcw),
                se3.se3_inverse(self.map.kf_pose[ref]))
            self.traj_rel.append(np.asarray(T_rel))

    # -- exports (System::SaveTrajectoryTUM contract) --
    def poses_cw(self) -> np.ndarray:
        """Full trajectory, reconstructed as T_rel * Tcw(ref KF) with the
        CURRENT keyframe poses — frames recorded before a loop closure or
        global BA come out corrected (System.cc:424-453)."""
        if not self.trajectory:
            return np.zeros((0, 7), np.float32)
        refs = np.asarray(self.traj_ref_kf)
        rel = np.stack(self.traj_rel)
        kf_pose = np.asarray(self.map.kf_pose)
        ref_T = kf_pose[np.maximum(refs, 0)]
        out = np.asarray(jax.vmap(se3.se3_compose)(
            jnp.asarray(rel), jnp.asarray(ref_T)))
        raw = np.stack(self.trajectory)
        return np.where((refs >= 0)[:, None], out, raw)
