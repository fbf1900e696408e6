"""Loop detection, Sim3 verification, and essential-graph correction.

Replaces LoopClosing (/root/reference/src/sg-slam/src/LoopClosing.cc) and
KeyFrameDatabase (src/KeyFrameDatabase.cc):

  * candidate retrieval: dense BoW-score scan over the keyframe database
    with the reference's gates — exclude covisible keyframes, require score
    >= the min score among covisible neighbors (DetectLoop,
    LoopClosing.cc:103-229; KeyFrameDatabase.cc:76-197);
  * temporal consistency: a candidate (or its covisibility group) must
    recur over `covisibility_consistency_th` consecutive keyframes
    (LoopClosing.h:120) — small host-side bookkeeping;
  * geometric verification: brute-force ORB matches between the two
    keyframes' feature blocks -> camera-frame 3-D from RGB-D depth ->
    batched Horn RANSAC Sim3 (ComputeSim3, :231-400);
  * correction: Sim3 essential-graph GN over spanning-tree + strong
    covisibility + loop edges, then point correction through each point's
    reference keyframe (CorrectLoop :402-585 + the spanning-tree
    propagation of RunGlobalBundleAdjustment :645-749).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..geometry.camera import backproject
from ..mapstate import mapstate as ms
from ..matching import search
from ..models import vocab as vocab_mod
from ..optim import pose_graph, sim3

NO_POINT = ms.NO_POINT


@jax.jit
def _bow_of_kf(vocab, desc, valid):
    words = vocab_mod.quantize(vocab, desc, valid)
    return vocab_mod.bow_vector(vocab, words)


@partial(jax.jit, donate_argnums=(2, 3))
def _kf_update(vocab, m, bow_db, db_valid, kf_id):
    """Fused per-keyframe database update + loop-candidate detection:
    BoW of the new keyframe, inverted-file row install, covisibility-gated
    candidate scores, and the top candidates' covisibility rows for the
    host's streak bookkeeping — ONE dispatch + one small fetch per
    keyframe (each separate host read is a tunnel round trip)."""
    desc = m.kf_feat_desc[kf_id]
    valid = m.kf_feat_valid[kf_id]
    words = vocab_mod.quantize(vocab, desc, valid)
    bow = vocab_mod.bow_vector(vocab, words)
    bow_db = bow_db.at[kf_id].set(bow)
    db_valid = db_valid.at[kf_id].set(True)

    dbv = db_valid & m.kf_valid
    cov_row = ms.covisibility_rows(m, kf_id[None])[0]
    scores = vocab_mod.l1_score(bow, bow_db)
    covisible = cov_row > 0          # connected KFs (weight >= 15)
    cov_scores = jnp.where(covisible & dbv, scores, jnp.inf)
    min_score = jnp.minimum(jnp.min(cov_scores), 1.0)
    eligible = (dbv & ~covisible
                & (jnp.arange(bow_db.shape[0]) != kf_id)
                & (jnp.arange(bow_db.shape[0]) < kf_id - 5))
    s = jnp.where(eligible & (scores >= jnp.where(jnp.isfinite(min_score),
                                                  min_score, 0.0)),
                  scores, -jnp.inf)
    # covisibility-group score accumulation
    # (KeyFrameDatabase::DetectLoopCandidates, KeyFrameDatabase.cc:152-197):
    # each candidate's group = itself + its connected KFs that also scored;
    # only groups within 0.75x of the best accumulated score survive. A
    # revisit spreads BoW evidence over several neighboring keyframes —
    # per-KF top-k alone flickers, the group sum is stable.
    pre_s, pre_i = jax.lax.top_k(s, 8)
    pre_cov = ms.covisibility_rows(m, pre_i)         # [8, K]
    s_pos = jnp.where(jnp.isfinite(s), s, 0.0)
    acc = jnp.where(
        jnp.isfinite(pre_s),
        pre_s + jnp.sum(jnp.where(pre_cov > 0, s_pos[None, :], 0.0), axis=1),
        -jnp.inf)
    best_acc = jnp.max(acc)
    acc = jnp.where(acc >= 0.75 * best_acc, acc, -jnp.inf)
    top_a, sel = jax.lax.top_k(acc, 3)
    top_i = pre_i[sel]
    top_s = jnp.where(jnp.isfinite(top_a), pre_s[sel], -jnp.inf)
    cov_top = pre_cov[sel] > 0                       # [3,K] for streaks
    return bow_db, db_valid, top_i, top_s, cov_top


@partial(jax.jit, static_argnums=(0,))
def _match_keyframes(cfg: SlamConfig, m: ms.MapState, kf_a, kf_b):
    """Brute-force ORB match between two KF feature blocks -> 3-D pairs."""
    desc_a = m.kf_feat_desc[kf_a]
    desc_b = m.kf_feat_desc[kf_b]
    va = m.kf_feat_valid[kf_a] & (m.kf_feat_depth[kf_a] > 0)
    vb = m.kf_feat_valid[kf_b] & (m.kf_feat_depth[kf_b] > 0)
    idx, ok, dist = search.match_by_descriptor(
        desc_a, va, desc_b, vb, cfg.matcher, max_dist=cfg.matcher.th_low,
        mutual=True)
    pa = backproject(cfg.camera, m.kf_feat_xy[kf_a],
                     m.kf_feat_depth[kf_a])
    pb_all = backproject(cfg.camera, m.kf_feat_xy[kf_b],
                         m.kf_feat_depth[kf_b])
    pb = pb_all[idx]
    uva = m.kf_feat_xy[kf_a]
    uvb = m.kf_feat_xy[kf_b][idx]
    return pa, pb, uva, uvb, ok


@partial(jax.jit, static_argnums=(0,), static_argnames=("fix_scale",))
def _widen_sim3(cfg: SlamConfig, m: ms.MapState, kf_cur, kf_loop, S_ab,
                fix_scale: bool = True):
    """SearchBySim3 widening + Horn refine (LoopClosing.cc:323-391;
    ORBmatcher::SearchBySim3, ORBmatcher.cc:1106): transform the loop
    keyframe's depth-backed features into the current keyframe through the
    candidate Sim3, run a windowed projective search for additional
    correspondences (radius 7.5 px like the reference's th), then
    re-estimate the Sim3 on the widened match set and re-count inliers.

    Returns (S_refined [8], n_total_matches).
    """
    cam = cfg.camera
    # loop-KF features with valid depth -> camera-frame 3-D
    depth_b = m.kf_feat_depth[kf_loop]
    valid_b = m.kf_feat_valid[kf_loop] & (depth_b > 0)
    pb = backproject(cam, m.kf_feat_xy[kf_loop], depth_b)
    # into the current KF's camera through S_ab, then project
    pb_in_a = se3.sim3_apply(S_ab[None], pb)
    from ..geometry.camera import project

    proj = project(cam, pb_in_a)
    N = pb.shape[0]
    idx, ok, dist = search.search_by_projection(
        proj, jnp.full(N, 7.5), m.kf_feat_level[kf_loop],
        m.kf_feat_desc[kf_loop], valid_b & (pb_in_a[:, 2] > 0.1),
        m.kf_feat_xy[kf_cur], m.kf_feat_level[kf_cur],
        m.kf_feat_desc[kf_cur], m.kf_feat_valid[kf_cur],
        level_window=1, max_dist=cfg.matcher.th_high,
        scale_factor=cfg.orb.scale_factor)
    ok = search.resolve_duplicate_targets(idx, ok, dist, m.n_feat)
    # matched current-KF features need depth for the 3-D Horn re-estimate
    depth_a = m.kf_feat_depth[kf_cur][idx]
    ok3 = ok & (depth_a > 0)
    pa = backproject(cam, m.kf_feat_xy[kf_cur][idx], depth_a)
    uva = m.kf_feat_xy[kf_cur][idx]
    uvb = m.kf_feat_xy[kf_loop]

    S_ref = sim3.horn_alignment(pb, pa, ok3.astype(jnp.float32),
                                fix_scale=fix_scale)
    # two-way reprojection inlier count at the refined Sim3
    pb_in_a2 = se3.sim3_apply(S_ref[None], pb)
    e1 = jnp.sum((project(cam, pb_in_a2) - uva) ** 2, -1)
    pa_in_b = se3.sim3_apply(se3.sim3_inverse(S_ref)[None], pa)
    e2 = jnp.sum((project(cam, pa_in_b) - uvb) ** 2, -1)
    inl = ok3 & (e1 < 9.21) & (e2 < 9.21)
    n = jnp.sum(inl.astype(jnp.int32))
    S_final = sim3.horn_alignment(pb, pa, inl.astype(jnp.float32),
                                  fix_scale=fix_scale)
    return S_final, n


@jax.jit
def _apply_correction(m: ms.MapState, old_poses, new_poses) -> ms.MapState:
    """Move every map point through its reference keyframe's correction and
    install the new keyframe poses."""
    k = jnp.clip(m.pt_first_kf, 0, m.max_kf - 1)
    T_old = old_poses[k]
    T_new = new_poses[k]
    pc = se3.se3_apply(T_old, m.pt_pos)
    p_new = se3.se3_apply(jax.vmap(se3.se3_inverse)(T_new), pc)
    p_new = jnp.where((m.pt_first_kf >= 0)[:, None] & m.pt_valid[:, None],
                      p_new, m.pt_pos)
    return dataclasses.replace(m, pt_pos=p_new, kf_pose=new_poses)


class LoopCloser:
    """Host orchestration of the loop-closing pipeline.

    deferred=True delays each keyframe's candidate inspection to the NEXT
    on_keyframe call (or flush): the detection results are device arrays
    whose host copy is started asynchronously, so the fetch that would
    otherwise cost a synchronous tunnel round trip per keyframe overlaps
    device work — the real-time chunked runner uses this (the reference's
    LoopClosing likewise lags tracking through its queue,
    LoopClosing.cc:57-88)."""

    def __init__(self, cfg: SlamConfig, vocab=None, deferred: bool = False,
                 fix_scale: bool = True):
        # fix_scale=False: estimate the 7th (scale) dof in loop Sim3s —
        # required for monocular maps whose scale drifts (the reference's
        # bFixScale=false path through Sim3Solver/OptimizeSim3)
        self.fix_scale = fix_scale
        self.cfg = cfg
        # default = the packaged trained vocabulary asset (ORBvoc.bin role)
        self.vocab = vocab if vocab is not None else vocab_mod.default_vocab()
        K = cfg.capacity.max_keyframes
        self.bow_db = jnp.zeros((K, self.vocab.n_words), jnp.float32)
        self.db_valid = jnp.zeros(K, bool)
        self.deferred = deferred
        self._deferred_det = None       # (kf_id, cand_i, cand_s, cov_top)
        # (kf_id, old_pose, new_pose) of the most recent correction — the
        # runner re-anchors its live tracking state through this delta
        self.last_correction = None
        self._consistency: dict[int, int] = {}  # candidate -> streak
        self.loops_closed: list[tuple[int, int]] = []
        # persistent loop edges: every past closure's (cur, loop, Sim3)
        # triple is re-added to EVERY later essential-graph optimization
        # (the reference keeps mspLoopEdges on keyframes and re-adds them,
        # Optimizer.cc:852-880 sLoopEdges / LoopClosing.cc:546-564) — so a
        # second loop closure cannot unwind the first. The measurement is
        # the relative Sim3 AS ESTABLISHED at closure (stored), not
        # re-derived from current poses: a later corruption of the poses
        # must be pulled back toward the verified constraint, not baked
        # into it.
        self.loop_edges: list[tuple[int, int, np.ndarray]] = []
        # cooperative-cancel hook for the post-loop global BA (mbStopGBA
        # role, LoopClosing.cc:410-423): return True to preempt. The
        # runner installs a producer (e.g. "a keyframe is waiting"); an
        # aborted GBA leaves `gba_remaining` > 0 and resumes later via
        # `continue_gba` (BA is anytime: every completed slice is kept).
        self.should_abort_gba = None
        self.last_gba_iters = 0
        self.gba_remaining = 0
        # loop-pair pin for the post-loop GBA (incl. resume slices):
        # [K] bool mask or None — see the pinning rationale in _correct
        self._gba_fixed = None

    def remap_keyframes(self, kf_old_to_new, old_valid):
        """Follow a map compaction: permute the BoW database rows and the
        consistency streaks to the new keyframe slots."""
        # a deferred detection holds a pre-compaction slot id; the runner
        # resolves via flush() before compacting, but drop defensively
        self._deferred_det = None
        K = self.bow_db.shape[0]
        # the GBA loop-pair pin follows the compaction permutation
        if self._gba_fixed is not None:
            dstf = jnp.where(jnp.asarray(old_valid),
                             jnp.asarray(kf_old_to_new), K)
            self._gba_fixed = jnp.zeros_like(self._gba_fixed).at[dstf].set(
                self._gba_fixed & jnp.asarray(old_valid), mode="drop")
        old_valid = jnp.asarray(old_valid)
        dst = jnp.where(old_valid, jnp.asarray(kf_old_to_new), K)
        bow_new = jnp.zeros_like(self.bow_db).at[dst].set(
            jnp.where(old_valid[:, None], self.bow_db, 0.0), mode="drop")
        db_valid_new = jnp.zeros_like(self.db_valid).at[dst].set(
            self.db_valid & old_valid, mode="drop")
        self.bow_db = bow_new
        self.db_valid = db_valid_new
        ov = np.asarray(old_valid)
        km = np.asarray(kf_old_to_new)
        self._consistency = {int(km[k]): v for k, v in
                             self._consistency.items() if ov[k]}
        # loop-edge endpoints follow the compaction; an edge whose endpoint
        # was culled is dropped (the reference re-parents around dead KFs,
        # KeyFrame.cc:454-520 — its loop partner constraint dies with it)
        self.loop_edges = [(int(km[i]), int(km[j]), s)
                           for i, j, s in self.loop_edges
                           if i >= 0 and j >= 0 and ov[i] and ov[j]]
        # endpoints a previous compaction already killed stay -1: km[-1]
        # and ov[-1] wrap to the last slot, which would "resurrect" a dead
        # endpoint as a wrong live keyframe id
        self.loops_closed = [(int(km[i]) if i >= 0 and ov[i] else -1,
                              int(km[j]) if j >= 0 and ov[j] else -1)
                             for i, j in self.loops_closed]

    def on_keyframe(self, m: ms.MapState, kf_id: int):
        """Update the database; returns a corrected map if a loop closes
        (in deferred mode, the correction triggered by the PREVIOUS
        keyframe's candidates)."""
        corrected = None
        if self._deferred_det is not None:
            corrected = self._inspect(m, *self._deferred_det)
            self._deferred_det = None
            m = corrected if corrected is not None else m
        (self.bow_db, self.db_valid, cand_i, cand_s,
         cov_top) = _kf_update(self.vocab, m, self.bow_db, self.db_valid,
                               jnp.asarray(kf_id, jnp.int32))
        if kf_id < 10:
            return corrected
        if self.deferred:
            for a in (cand_i, cand_s, cov_top):
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
            self._deferred_det = (kf_id, cand_i, cand_s, cov_top)
            return corrected
        out = self._inspect(m, kf_id, cand_i, cand_s, cov_top)
        return out if out is not None else corrected

    def flush(self, m: ms.MapState):
        """Resolve a deferred detection (sequence end / drain idle)."""
        if self._deferred_det is None:
            return None
        out = self._inspect(m, *self._deferred_det)
        self._deferred_det = None
        return out

    def _inspect(self, m: ms.MapState, kf_id: int, cand_i, cand_s,
                 cov_top):
        """Streak bookkeeping + geometric verification + correction.
        (A deferred keyframe is at most one insertion old, within
        cull_keyframes' protect_last window — its slot cannot have been
        culled between detection and inspection.)"""
        cfg = self.cfg
        # one packed fetch for everything the host inspects
        cand_i, cand_s, cov_top = jax.device_get((cand_i, cand_s, cov_top))

        # temporal consistency bookkeeping (DetectLoop's group streaks)
        new_streaks: dict[int, int] = {}
        hits: list[int] = []
        for k, (ci, s) in enumerate(zip(cand_i, cand_s)):
            if not np.isfinite(s):
                continue
            ci = int(ci)
            # a candidate continues a streak if it or a covisible neighbor
            # was a candidate for the previous keyframe
            prev = self._consistency.get(ci, 0)
            if prev == 0:
                for cj, streak in self._consistency.items():
                    if cj < cov_top.shape[1] and cov_top[k, cj]:
                        prev = max(prev, streak)
            new_streaks[ci] = prev + 1
            if prev + 1 >= cfg.loop.covisibility_consistency_th:
                hits.append(ci)
        self._consistency = new_streaks
        if not hits:
            return None

        # geometric verification of EVERY consistency-passing candidate —
        # the reference RANSACs all candidates and accepts the first that
        # verifies (LoopClosing::ComputeSim3, LoopClosing.cc:231-400);
        # single-candidate verification lets one bad top hit kill a loop
        hit, S_ab = self._verify_candidates(m, kf_id, hits)
        if hit is None:
            return None

        # loop accepted: essential-graph optimization (the full
        # covisibility matrix is only materialized on this rare path)
        self.loops_closed.append((int(kf_id), int(hit)))
        self._consistency = {}
        # full pre/post pose tables: the essential graph corrects every
        # keyframe DIFFERENTLY (drift is distributed), so a consumer
        # re-anchoring live state must use the correction of ITS OWN
        # reference keyframe, not the loop keyframe's
        old_poses = m.kf_pose
        corrected, sim_opt = self._correct(m, kf_id, hit, S_ab,
                                           ms.covisibility(m))
        self.last_correction = (kf_id, old_poses, corrected.kf_pose)
        # persist the loop constraint AS ESTABLISHED by this correction —
        # from the FULL optimized Sim3 poses, scale included: with
        # fix_scale=False (monocular) the closure carries a scale
        # correction, and a stored scale-1 measurement would let every
        # later essential-graph run pull that correction back out
        Si = sim_opt[kf_id]
        Sj = sim_opt[hit]
        self.loop_edges.append((int(kf_id), int(hit), np.asarray(
            se3.sim3_compose(Si, se3.sim3_inverse(Sj)))))
        return corrected

    def _verify_candidates(self, m: ms.MapState, kf_id: int,
                           hits: list[int]):
        """Geometric verification: BoW-match gate -> batched Horn RANSAC
        Sim3 -> SearchBySim3 widening + refine -> total-match gate, per
        candidate; first verified candidate wins (ComputeSim3 contract).
        Returns (hit, S_ab) or (None, None)."""
        cfg = self.cfg
        for hit in hits:
            pa, pb, uva, uvb, ok = _match_keyframes(
                cfg, m, jnp.asarray(kf_id), jnp.asarray(hit))
            if int(ok.sum()) < cfg.loop.min_bow_matches:
                continue
            S_ab, inl, n = sim3.ransac_sim3(
                cfg.camera, pa, pb, uva, uvb, ok,
                jax.random.PRNGKey(kf_id), iters=128,
                fix_scale=self.fix_scale)
            if int(n) < cfg.loop.min_sim3_inliers:
                continue
            # GN refinement with two-way reprojection edges + chi2 gating
            # (Optimizer::OptimizeSim3 between RANSAC and the widening,
            # LoopClosing.cc:326)
            S_ab, inl, n = sim3.optimize_sim3(
                cfg.camera, S_ab, pa, pb, uva, uvb, ok,
                fix_scale=self.fix_scale)
            if int(n) < cfg.loop.min_sim3_inliers:
                continue
            # SearchBySim3 widening + refine (LoopClosing.cc:323-391):
            # gather additional correspondences through the candidate Sim3,
            # then gate at the reference's stricter total-match threshold
            # (>= 40) — self-similar scenes produce 20-inlier false loops
            S_ab, n_total = _widen_sim3(cfg, m, jnp.asarray(kf_id),
                                        jnp.asarray(hit), S_ab,
                                        fix_scale=self.fix_scale)
            if int(n_total) >= cfg.loop.min_total_matches:
                return hit, S_ab
        return None, None

    # ------------------------------------------------------------------
    def relocalize(self, m: ms.MapState, feats):
        """Relocalization: BoW candidates -> 2D-3D PnP RANSAC -> pose.

        Contract of Tracking::Relocalization (Tracking.cc:1460-1621) with
        KeyFrameDatabase::DetectRelocalizationCandidates (no covisibility
        min-score gate). Returns (Tcw [7], n_inliers) or (None, 0).
        """
        from ..optim.pnp import ransac_pnp

        cfg = self.cfg
        bow = _bow_of_kf(self.vocab, feats.desc, feats.valid)
        scores = vocab_mod.l1_score(bow, self.bow_db)
        scores = jnp.where(self.db_valid & m.kf_valid, scores, -jnp.inf)
        top_s, top_i = jax.lax.top_k(scores, 3)
        best = (None, 0)
        for ci, s in zip(np.asarray(top_i), np.asarray(top_s)):
            if not np.isfinite(s):
                continue
            kf = jnp.asarray(int(ci))
            # match frame descriptors against the candidate KF's map points
            obs_pt = m.kf_obs_point[kf]
            has_pt = obs_pt >= 0
            idx, ok, dist = search.match_by_descriptor(
                feats.desc, feats.valid,
                m.kf_feat_desc[kf], m.kf_feat_valid[kf] & has_pt,
                cfg.matcher, max_dist=cfg.matcher.th_low, mutual=False)
            pid = jnp.where(ok, obs_pt[idx], 0)
            pw = m.pt_pos[pid]
            ok = ok & m.pt_valid[pid]
            if int(ok.sum()) < 15:
                continue
            Tcw, inl, n = ransac_pnp(
                cfg.camera, pw, feats.xy, ok,
                jax.random.PRNGKey(int(ci)), iters=256)
            if int(n) > best[1]:
                best = (Tcw, int(n))
        if best[0] is None or best[1] < 12:
            return None, best[1]
        # projective-widen + re-optimize (Tracking.cc:1569-1606): the PnP
        # pose seeds a full local-map association + two-stage motion-only
        # BA — exactly track_step's contract — recovering the 50-inlier
        # accept the raw PnP pose alone often misses.
        from . import tracking

        T2, _, n2, _, _ = tracking.track_step(cfg, m, feats, best[0])
        n2 = int(n2)
        if n2 >= cfg.tracker.min_inliers_after_reloc:
            return T2, n2
        if best[1] >= cfg.tracker.min_inliers_after_reloc:
            return best
        return None, max(best[1], n2)

    def _correct(self, m: ms.MapState, kf_cur: int, kf_loop: int, S_cur_loop,
                 cov):
        """Pose-graph over Sim3 + point correction (CorrectLoop contract).

        Returns (corrected_map, optimized_sim_poses [K,8]) — the full Sim3
        table (quat, t, scale) so callers can persist scale-true loop
        constraints."""
        K = m.max_kf
        old_poses = m.kf_pose
        sim_poses = jnp.concatenate(
            [old_poses, jnp.ones((K, 1), old_poses.dtype)], axis=1)

        nkf = int(np.asarray(m.next_kf))
        kf_valid = np.asarray(m.kf_valid)
        cov_np = np.asarray(cov)

        # covisibility spanning tree (KeyFrame parent semantics,
        # KeyFrame.cc:454-520): parent = the EARLIER keyframe sharing the
        # most observations; only when no covisible predecessor exists fall
        # back to the nearest earlier valid slot (plain odometry chain) —
        # slot order alone is structurally wrong after heavy culling
        parent = np.full(K, -1, np.int64)
        prev_valid = -1
        for k in range(nkf):
            if not kf_valid[k]:
                continue
            if prev_valid >= 0:
                w = cov_np[k, :k].copy()
                w[~kf_valid[:k]] = 0.0
                best = int(np.argmax(w)) if w.size else 0
                parent[k] = best if w.size and w[best] > 0 else prev_valid
            prev_valid = k

        # loop edges (i=cur, j=loop): residual r = log(meas * S_j * S_i^-1)
        # vanishes when meas = S_i * S_j^-1 = the verified relative Sim3
        # (S_cur_loop maps loop-KF camera coords into cur-KF camera coords).
        # EVERY past loop edge is re-added with its STORED verified
        # measurement (sLoopEdges semantics, Optimizer.cc:852-880) — the
        # stored constraint pulls a later corruption back toward the
        # established closure instead of baking the corruption in.
        li, lj, lmeas = [int(kf_cur)], [int(kf_loop)], [np.asarray(S_cur_loop)]
        for (pi, pj, pmeas) in self.loop_edges:
            if pi < 0 or pj < 0 or not (kf_valid[pi] and kf_valid[pj]):
                continue
            li.append(pi)
            lj.append(pj)
            lmeas.append(np.asarray(pmeas))

        ei, ej, meas, ew = pose_graph.build_essential_edges(
            cov_np, np.asarray(sim_poses), parent,
            np.asarray(li), np.asarray(lj), lmeas,
            min_covis_weight=100.0,
            max_edges=4 * K)

        valid = np.zeros(K, bool)
        valid[:nkf] = kf_valid[:nkf]
        fixed = np.zeros(K, bool)
        fixed[kf_loop] = True

        opt = pose_graph.optimize_pose_graph(
            sim_poses, jnp.asarray(valid), jnp.asarray(fixed),
            ei, ej, meas, ew, iters=40, fix_scale=self.fix_scale)
        new_poses = opt[:, :7]
        new_poses = jax.vmap(
            lambda q, t: se3.se3_make(se3.quat_normalize(q), t))(
            new_poses[:, :4], new_poses[:, 4:7])
        sim_opt = jnp.concatenate([new_poses, opt[:, 7:8]], axis=1)
        m = _apply_correction(m, old_poses, new_poses)

        # post-correction duplicate fusion (SearchAndFuse,
        # LoopClosing.cc:542-613): with the loop closed, loop-side and
        # current-side points now project onto the same features — merge
        # them in the current keyframe, its temporal predecessor, AND
        # every keyframe inserted after it (the real-time path's loop
        # detection lags tracking by a drain window; un-fused newer
        # keyframes would keep duplicating the revisited structure and
        # re-trigger loop detection every few keyframes)
        from ..mapstate import maintenance as mt

        prev = mt.prev_valid_kf(m, jnp.asarray(kf_cur))
        fuse_slots = [int(np.asarray(prev))] if int(np.asarray(prev)) >= 0 \
            else []
        kf_valid_now = np.asarray(m.kf_valid)
        fuse_slots += [k for k in range(kf_cur, nkf) if kf_valid_now[k]]
        for k in fuse_slots[:12]:
            # WIDE search radius: right after a large-drift correction the
            # duplicated revisit structure can sit tens of px from its
            # original — the hot path's 3 px window would leave the two
            # copies unmerged forever (descriptor gate + mutual-duplicate
            # resolution still protect against wrong merges)
            m = mt.fuse_duplicates(
                self.cfg.camera, m, jnp.asarray(k),
                scale_factor=self.cfg.orb.scale_factor,
                max_candidates=self.cfg.capacity.local_points,
                radius=6.0)

        # NO windowed local BA here: the reference's CorrectLoop goes
        # essential graph -> fuse -> GBA directly (LoopClosing.cc:402-585;
        # the covisibility-window BA of Optimizer.cc:456-504 belongs to
        # LocalMapping, not LoopClosing). A cov-windowed BA at this point
        # was tried and measurably UNDOES the graph correction: its
        # (pre-closure) covisibility window spans only current-side
        # keyframes, whose observation mass is consistent with the drifted
        # shape — measured on the injected-drift fixture: graph 0.035 m ->
        # +covBA 0.092 m -> +GBA back to 0.130 m, vs 0.046 m with the
        # reference's graph->fuse->GBA order (tests/test_loop_e2e.py).
        # trk.local_ba_cov_step remains available for maintenance callers.

        # full-map BA after the graph correction (the reference spawns
        # RunGlobalBundleAdjustment here, LoopClosing.cc:575-579). The
        # first 10 iterations run to completion — the reference's
        # GlobalBundleAdjustemnt(10) always finishes unless preempted by a
        # NEW LOOP (mbStopGBA, LoopClosing.cc:410-423; ordinary keyframes
        # abort only LOCAL BA via mbAbortBA) — and only the extra budget
        # beyond that is cooperatively cancellable.
        if self.cfg.loop.run_global_ba:
            from ..optim.global_ba import global_ba_interruptible

            # Pin the VERIFIED LOOP PAIR (kf_cur, kf_loop) through the
            # post-loop GBA, on top of the KF-0 gauge. GBA is pure
            # reprojection: on a map whose observation mass is still
            # consistent with the pre-closure drift, an unpinned GBA's
            # optimum is the drifted shape and it UNWINDS the essential-
            # graph correction (measured: closure-2 of the two-lap
            # fixture 0.15 -> 0.23 m unpinned; the only counter-force,
            # post-fuse seam observations, is tens of points vs the full
            # odometry mass). The pinned pair holds the seam — the pair's
            # relative pose was just verified by Horn-RANSAC + Sim3 GN +
            # the >=40-match widen gate, making it the best-attested
            # geometry in the map. `_gba_fixed` rides resume slices too.
            K = m.max_kf
            self._gba_fixed = jnp.zeros(K, bool).at[kf_cur].set(
                True).at[kf_loop].set(True)
            total = self.cfg.loop.global_ba_iters
            base = min(10, total)
            m, done1 = global_ba_interruptible(
                self.cfg, m, iters=base, fixed_extra=self._gba_fixed)
            m, done2 = global_ba_interruptible(
                self.cfg, m, iters=total - base,
                should_abort=self.should_abort_gba,
                fixed_extra=self._gba_fixed)
            self.last_gba_iters = done1 + done2
            self.gba_remaining = total - self.last_gba_iters
        return m, sim_opt

    def continue_gba(self, m: ms.MapState, budget: int | None = None):
        """Resume an aborted global BA (the reference re-spawns GBA after
        the preempting work drains, LoopClosing.cc:645-749 under the map
        mutex). `budget` bounds this resume slice and runs it without the
        abort hook — guaranteed forward progress even while keyframes
        keep arriving. Returns the updated map, or None if nothing was
        pending."""
        if self.gba_remaining <= 0:
            return None
        from ..optim.global_ba import global_ba_interruptible

        if budget is not None:
            iters = min(budget, self.gba_remaining)
            m, done = global_ba_interruptible(
                self.cfg, m, iters=iters, fixed_extra=self._gba_fixed)
        else:
            m, done = global_ba_interruptible(
                self.cfg, m, iters=self.gba_remaining,
                should_abort=self.should_abort_gba,
                fixed_extra=self._gba_fixed)
        self.gba_remaining -= done
        return m
