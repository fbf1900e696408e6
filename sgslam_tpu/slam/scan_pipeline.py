"""Fully on-device chunked SLAM: N frames per dispatch — the ONE complete
real-time configuration (tracking + dynamic rejection + mapping back-end +
loop closing + relocalization + semantic mapping).

Why this exists: the per-call dispatch overhead over the axon TPU tunnel
(~25-35 ms) dwarfs the per-frame device work, so any host-driven per-frame
dispatch caps below real time. Here the per-frame pipeline — batched 2-D
detection, batched ORB extraction, batched semantic+geometric dynamic
rejection, and a lax.scan of the sequential tracking core — is ONE jitted
program per chunk, and the host drains results only every `fetch_every`
chunks as ONE small packed transfer.

Architecture notes (measured on the chip, see bench.py / tools/bench_sweep):

  * The MAP IS NOT part of the scan carry. A `lax.cond`'s identity branch
    must copy every carried array, so threading the ~40 MB MapState through
    a per-frame keyframe cond costs more than all the tracking math
    combined. Instead the scan reads the map as a loop-invariant input and
    only FLAGS keyframe frames; the first flagged frame of a chunk is
    selected ON DEVICE into a `pending` tuple that the NEXT chunk's program
    applies (insert + the full LocalMapping maintenance pass) before
    tracking starts. Tracking therefore consumes the map as-of-the-last-
    completed back-end pass — exactly the reference's Tracking/LocalMapping
    thread decoupling (System.cc:145-174), with a bounded one-chunk
    staleness, and the host never touches feature blocks.
  * Per-chunk results are packed into ONE [chunk+1, 9] array (pose, inlier
    count, keyframe flag per frame + a stats row), so draining k chunks is
    a single device_get of k small buffers — every separate host read of a
    device value is a tunnel round trip.
  * Loop closing, relocalization, and semantic mapping run at drain time on
    the host around jitted stages, behind tracking by at most
    `fetch_every` chunks — the role of the reference's LoopClosing /
    PointcloudMapping threads (LoopClosing.cc:57-88,
    PointcloudMapping.cc:197-247) with queues replaced by the drain
    boundary. Trajectory frames are recorded relative to their reference
    keyframe, so loop/GBA corrections retro-correct the full trajectory at
    export (System::SaveTrajectoryTUM contract, System.cc:424-453).
  * Everything batched (detection convs, extraction, rejection) runs
    vmapped over the chunk — wide, MXU/VPU-friendly shapes — and only the
    irreducibly sequential part (pose tracking) runs in the scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..mapstate import mapstate as ms
from ..semantic import dynamic as dyn_mod
from ..semantic.dynamic import Boxes
from . import tracking


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackCarry:
    Tcw: jax.Array           # [7] last pose
    velocity: jax.Array      # [7]
    since_kf: jax.Array      # [] i32 frames since last keyframe
    ref_matches: jax.Array   # [] i32 inlier count at the last keyframe
    frame_id: jax.Array      # [] i32
    prev_feats: object       # Features of the previous frame (pre-cull)
    prev_boxes: object       # Boxes: previous frame's dynamic regions
    key: jax.Array           # PRNG for F-matrix RANSAC


def insert_and_maintain_body(cfg: SlamConfig, m: ms.MapState, feats, Tcw,
                             frame_id, matched):
    """Keyframe insertion + the full LocalMapping pass (trace-time body)."""
    kf_id = m.next_kf
    m = ms.insert_keyframe(cfg.camera, cfg.orb.scale_factor, m, feats,
                           Tcw, frame_id, matched,
                           cfg.close_depth_threshold)
    return jax.lax.cond(
        kf_id >= 2,
        lambda mm: tracking.process_new_keyframe(cfg, mm, kf_id),
        lambda mm: mm, m)


insert_and_maintain = partial(jax.jit, static_argnums=(0,),
                              donate_argnums=(1,))(insert_and_maintain_body)


def make_track_chunk(cfg: SlamConfig, detector=None, semantic: bool = False,
                     stereo: bool = False, only_tracking: bool = False):
    """Build the jitted per-chunk program.

    Returns fn(det_params, m, carry, grays, depths, pending) ->
      (m', carry', packed [c+1,9], pending_out, feats_last, kf_dyn_boxes,
       kf_obj_boxes)
    where packed rows are [pose(7), n_inliers, need_kf] per frame plus a
    final stats row [next_kf, next_pt, 0...]; pending_out is the first
    flagged keyframe of this chunk (selected on device), to be fed back as
    `pending` of the next chunk; kf_*_boxes are that frame's detections
    (for the semantic mapper); feats_last is the last frame's culled
    feature block (for host-side relocalization on tracking loss).
    det_params is ignored when detector is None (pass None).
    stereo=True interprets (grays, depths) as the rectified (left, right)
    image pair and fills depth by epipolar SAD search instead
    (extract_frame_stereo) — the stereo mode on the real-time path.
    only_tracking=True freezes the map: no frame is ever flagged as a
    keyframe, so the pending-apply branch never fires (localization-only
    mode, System::ActivateLocalizationMode, System.cc:345-355).
    """
    t = cfg.tracker
    W, H = cfg.camera.width, cfg.camera.height
    B = cfg.detector.max_boxes

    if detector is not None:
        from ..models.detector import decode_boxes, nms_topk

        model = detector.model
        anchors = detector.anchors
        dcfg = detector.cfg

        def detect_batch(params, grays):
            imgs = jax.image.resize(
                grays, (grays.shape[0], dcfg.input_size, dcfg.input_size),
                "linear")
            rgb = jnp.repeat(imgs[..., None], 3, axis=-1)
            box_pred, logits = model.apply(params, rgb)

            def one(bp, lg):
                boxes = decode_boxes(bp, anchors)
                probs = jax.nn.softmax(lg, axis=-1)
                cls = jnp.argmax(probs[:, 1:], axis=-1).astype(
                    jnp.int32) + 1
                score = jnp.max(probs[:, 1:], axis=-1)
                low = jnp.where(cls == dcfg.person_class,
                                dcfg.dynamic_conf_threshold,
                                dcfg.conf_threshold)
                score = jnp.where(score > low, score, 0.0)
                idx, ok = nms_topk(boxes, score, cls, dcfg.max_boxes)
                px = jnp.clip(boxes[idx], 0.0, 1.0) * jnp.array(
                    [W, H, W, H], jnp.float32)
                is_person = cls[idx] == dcfg.person_class
                keep = ok & (score[idx] > 0)
                cull = Boxes(px, cls[idx], score[idx], keep & is_person
                             & (score[idx]
                                > dcfg.person_box_conf_for_culling))
                dyn = Boxes(px, cls[idx], score[idx], keep & is_person)
                # non-person detections above the standard confidence gate
                # feed the 3-D semantic-object pipeline
                # (Detector2D.cc:85-86 -> mvObjects2D)
                obj = Boxes(px, cls[idx], score[idx], keep & ~is_person
                            & (score[idx] > dcfg.conf_threshold))
                return cull, dyn, obj

            return jax.vmap(one)(box_pred, logits)

    def chunk_fn(det_params, m, carry: TrackCarry, grays, depths, pending):
        """pending = (flag, feats, pose, frame_id, matched): at most one
        keyframe flagged by the PREVIOUS chunk, applied (insert + the full
        LocalMapping maintenance pass) inside this program before tracking
        starts — merging the back-end into the same dispatch. The identity
        branch of this once-per-chunk cond costs one map copy, unlike the
        per-frame cond the old in-scan design paid."""
        p_flag, p_feats, p_pose, p_fid, p_matched = pending
        m = jax.lax.cond(
            p_flag,
            lambda mm: insert_and_maintain_body(cfg, mm, p_feats, p_pose,
                                                p_fid, p_matched),
            lambda mm: mm, m)

        n = grays.shape[0]
        # ---- batched per-frame stages (wide, parallel) ----
        if stereo:
            feats = jax.vmap(
                lambda gl, gr: tracking.extract_frame_stereo(cfg, gl, gr))(
                grays, depths)
        else:
            feats = jax.vmap(
                lambda g, d: tracking.extract_frame(cfg, g, d))(grays,
                                                                depths)

        if detector is not None:
            cull_boxes, dyn_boxes, obj_boxes = detect_batch(det_params,
                                                            grays)
        else:
            cull_boxes = dyn_boxes = obj_boxes = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (n,) + x.shape),
                Boxes.empty(B))

        if semantic:
            # previous-frame feature blocks: shift by one, carry seeds i=0
            prev = jax.tree.map(
                lambda last, cur: jnp.concatenate([last[None], cur[:-1]]),
                carry.prev_feats, feats)
            prev_boxes = jax.tree.map(
                lambda last, cur: jnp.concatenate([last[None], cur[:-1]]),
                carry.prev_boxes, dyn_boxes)
            keys = jax.random.split(carry.key, n + 1)

            def reject_one(f, pxy, plv, pang, pdesc, pval, cull_b, prev_b,
                           k):
                prev_xy, status = dyn_mod.match_prev_frame(
                    cfg.matcher, cfg.orb.scale_factor, f,
                    pxy, plv, pang, pdesc, pval,
                    radius=cfg.dynamic.match_radius)
                keep, _, _ = dyn_mod.reject_dynamic_matched(
                    cfg.dynamic, f.xy_raw, f.valid, prev_xy, status,
                    cull_b, prev_b, k)
                return keep

            keep = jax.vmap(reject_one)(
                feats, prev.xy_raw, prev.level, prev.angle, prev.desc,
                prev.valid, cull_boxes, prev_boxes, keys[1:])
            feats_culled = jax.vmap(dyn_mod.apply_keep_mask)(feats, keep)
            new_key = keys[0]
        else:
            feats_culled = feats
            new_key = carry.key

        # ---- sequential tracking core (map is loop-INVARIANT) ----
        def body(c, xs):
            f = xs
            Tcw_pred = se3.se3_compose(c[1], c[0])
            Tcw, matched, n_inl, tc, uc = tracking.track_step(
                cfg, m, f, Tcw_pred)
            ok = n_inl >= t.min_inliers_local_map
            Tcw = jnp.where(ok, Tcw, Tcw_pred)
            since = c[2] + 1
            ref = c[3]
            need_close = (tc < 100) & (uc > 70)
            c1 = since >= t.max_frames_between_kf
            # KF need is RELATIVE to the reference keyframe's match count
            # (Tracking.cc:1085-1113: mnMatchesInliers < nRefMatches*ratio)
            c2 = ((n_inl < ref.astype(jnp.float32) * t.kf_tracked_ratio)
                  | need_close)
            need_kf = ok & (c1 | (c2 & (n_inl > 15)))
            if only_tracking:
                need_kf = jnp.zeros_like(need_kf)
            vel = se3.se3_compose(Tcw, se3.se3_inverse(c[0]))
            out = (Tcw, n_inl, matched, need_kf)
            return (Tcw, vel, jnp.where(need_kf, 0, since),
                    jnp.where(need_kf, n_inl, ref)), out

        (Tcw, vel, since, ref), outs = jax.lax.scan(
            body, (carry.Tcw, carry.velocity, carry.since_kf,
                   carry.ref_matches), feats_culled)
        poses, n_inl, matched, need_kf = outs

        last_feats = jax.tree.map(lambda x: x[-1], feats)
        last_boxes = jax.tree.map(lambda x: x[-1], dyn_boxes)
        carry2 = TrackCarry(Tcw=Tcw, velocity=vel, since_kf=since,
                            ref_matches=ref,
                            frame_id=carry.frame_id + n,
                            prev_feats=last_feats, prev_boxes=last_boxes,
                            key=new_key)

        # ---- on-device pending-keyframe selection (first flagged frame) —
        # the host never inspects feature blocks
        flag = jnp.any(need_kf)
        i_kf = jnp.argmax(need_kf)                # first True
        pending_out = (
            flag,
            jax.tree.map(lambda x: x[i_kf], feats_culled),
            poses[i_kf],
            carry.frame_id + i_kf.astype(jnp.int32),
            matched[i_kf],
        )
        kf_dyn = jax.tree.map(lambda x: x[i_kf], dyn_boxes)
        kf_obj = jax.tree.map(lambda x: x[i_kf], obj_boxes)

        # ---- ONE packed result array: [pose(7), n_inl, need_kf] per frame
        # + stats row [next_kf, next_pt, 0...]
        rows = jnp.concatenate(
            [poses, n_inl.astype(jnp.float32)[:, None],
             need_kf.astype(jnp.float32)[:, None]], axis=1)
        stats = jnp.zeros((1, 9), jnp.float32).at[0, 0].set(
            m.next_kf.astype(jnp.float32)).at[0, 1].set(
            m.next_pt.astype(jnp.float32))
        packed = jnp.concatenate([rows, stats], axis=0)

        feats_last = jax.tree.map(lambda x: x[-1], feats_culled)
        return (m, carry2, packed, pending_out, feats_last, kf_dyn, kf_obj)

    return jax.jit(chunk_fn, donate_argnums=(1,))


@jax.jit
def _export_traj(poses, ref_pose_ins, ref_pose_now):
    """Re-anchor recorded frame poses to the CURRENT keyframe poses:
    T = (T_frame o inv(T_ref_at_insertion)) o T_ref_now — frames recorded
    before a loop closure / BA come out corrected (System.cc:424-453)."""
    return jax.vmap(lambda p, ri, rn: se3.se3_compose(
        se3.se3_compose(p, se3.se3_inverse(ri)), rn))(
        poses, ref_pose_ins, ref_pose_now)


@dataclasses.dataclass
class _KfEvent:
    """A chunk flagged a keyframe; its slot id becomes known when a later
    chunk's stats row shows the insertion (the pending apply)."""

    pose: np.ndarray          # tracked pose at the flagged frame
    gray: object              # device array [H,W] (mapper input)
    depth: object
    dyn_boxes: object         # Boxes (device)
    obj_boxes: object         # Boxes (device)


class _ChunkRunnerBase:
    """Host facade: bootstrap per-frame, then one dispatch per chunk with
    results drained every `fetch_every` chunks in one packed transfer.
    Loop closing / relocalization / semantic mapping fire at drain time."""

    semantic = False
    stereo = False

    def __init__(self, cfg: SlamConfig, detector=None, chunk: int = 8,
                 pipeline_depth: int = 0, fetch_every: int | None = None,
                 loop=None, mapper=None, only_tracking: bool = False):
        self.cfg = cfg
        self.chunk = chunk
        self.fetch_every = (fetch_every if fetch_every is not None
                            else pipeline_depth + 1)
        self.detector = detector
        self.loop = loop                  # LoopCloser | None
        self.mapper = mapper              # SemanticMapper | None
        self.only_tracking = only_tracking
        if self.stereo and mapper is not None:
            # the stereo chunk program carries the RIGHT IMAGE where the
            # RGB-D program carries metric depth; SemanticMapper would
            # back-project intensity values as meters (silent garbage)
            raise ValueError(
                "stereo chunked tracking cannot drive the SemanticMapper: "
                "keyframe events carry the right image, not a depth map — "
                "run RGB-D, or map from an external depth source")
        if loop is not None:
            # GBA-abort producer (the mbStopGBA role): a queued keyframe
            # event preempts a running post-loop global BA; the remainder
            # resumes at an idle drain via continue_gba below
            loop.should_abort_gba = lambda: bool(self._kf_events)
            # candidate inspection lags one keyframe so its host fetch
            # overlaps device work (no per-KF tunnel round trip)
            loop.deferred = True
        self.inner = tracking.Tracker(cfg)
        self.inner.only_tracking = only_tracking
        self._frontend = dyn_mod.SemanticFrontend(cfg)
        if loop is not None:
            self.inner.on_compaction = loop.remap_keyframes
        self._fn = make_track_chunk(cfg, detector, semantic=self.semantic,
                                    stereo=self.stereo,
                                    only_tracking=only_tracking)
        self._carry = None
        self._pending_dev = None          # device pending tuple
        self._pending_proto = None
        self._inflight: list = []         # dispatched, not-yet-fetched
        self._kf_events: list[_KfEvent] = []
        self._next_kf_host = 0
        self._ref_slot = -1               # current reference KF slot
        self._ref_pose_ins = np.asarray(se3.se3_identity())
        self._want_compact = False
        self._world_corrected = False
        self.loops_closed = 0
        self.relocs = 0
        # raw per-frame poses + reference-KF anchors for retro-correction
        self.trajectory: list[np.ndarray] = []
        self._traj_ref: list[int] = []
        self._traj_refpose: list[np.ndarray] = []
        self.n_inliers_hist: list[int] = []
        # per-frame LOST flags aligned with `trajectory` (Tracking.h:93-99
        # state semantics): a frame whose inlier count collapsed coasted on
        # the motion model — exporters can mask the affected segment
        self.frame_lost: list[bool] = []

    # -- bootstrap: per-frame path until the map initializes --
    def bootstrap(self, gray, depth):
        """For stereo runners, (gray, depth) is the (left, right) pair."""
        gray = jnp.asarray(gray)
        if self.stereo:
            feats = tracking.extract_frame_stereo(self.cfg, gray,
                                                  jnp.asarray(depth))
        else:
            feats = tracking.extract_frame(self.cfg, gray, depth)
        feats_raw = feats
        dyn_b = Boxes.empty(self.cfg.detector.max_boxes)
        if self.semantic and self.detector is not None:
            rgb = jnp.repeat(gray[..., None], 3, axis=-1)
            _, cull_b, dyn_b, _ = self.detector.detect(
                rgb, self.cfg.camera.width, self.cfg.camera.height)
            # shared init-frame + per-frame semantic cull (ONE
            # implementation with the System path)
            feats = self._frontend.cull(
                gray, feats, cull_b,
                map_initialized=self.inner.state != "NOT_INITIALIZED")
        self._frontend.push(gray, feats_raw, dyn_b)
        self.inner.process(gray, None if self.stereo else depth,
                           feats=feats)
        # localization-only resume: the restored map starts LOST; recover
        # through the keyframe database (Tracking::Relocalization role)
        if self.inner.state == "LOST" and self.loop is not None:
            T, n = self.loop.relocalize(self.inner.map, feats)
            if T is not None:
                self.inner.force_pose(T)
                self.relocs += 1
        self.trajectory.append(np.asarray(self.inner.Tcw))
        self._traj_ref.append(-1)
        self._traj_refpose.append(np.asarray(se3.se3_identity()))
        self.frame_lost.append(self.inner.state == "LOST")
        if self.inner.kf_inserted and self.loop is not None:
            self.loop.on_keyframe(self.inner.map, self.inner.last_kf_id)
        if self.inner.state == "OK":
            # (re)sync the chunk state — bootstrap may be called repeatedly
            ref = (self.inner.n_inliers_hist[-1]
                   if self.inner.n_inliers_hist else 200)
            self._carry = TrackCarry(
                Tcw=jnp.asarray(self.inner.Tcw),
                velocity=jnp.asarray(self.inner.velocity),
                since_kf=jnp.asarray(
                    self.inner.frame_id - 1 - self.inner.last_kf_frame_id,
                    jnp.int32),
                ref_matches=jnp.asarray(max(ref, 30), jnp.int32),
                frame_id=jnp.asarray(self.inner.frame_id, jnp.int32),
                prev_feats=feats_raw, prev_boxes=dyn_b,
                key=jax.random.PRNGKey(7))
            self._map = self.inner.map
            self._pending_dev = self._empty_pending()
            self._next_kf_host = int(np.asarray(self._map.next_kf))
            self._ref_slot = self.inner.last_kf_id
            self._ref_pose_ins = np.asarray(
                self._map.kf_pose[self._ref_slot])
        return self.inner.state == "OK"

    def _empty_pending(self):
        if self._pending_proto is None:
            f = jax.tree.map(
                lambda x: jnp.zeros_like(x), self._carry.prev_feats)
            self._pending_proto = (
                jnp.asarray(False), f, jnp.zeros(7, jnp.float32),
                jnp.zeros((), jnp.int32),
                jnp.full((self.cfg.orb.max_keypoints,), -1, jnp.int32))
        return self._pending_proto

    def process_chunk(self, grays, depths):
        """grays/depths [chunk, H, W]. Results are drained (trajectory,
        keyframe events, loop closing, mapping, relocalization) every
        `fetch_every` chunks; call flush() for the tail."""
        assert self._carry is not None, "bootstrap first"
        if self._want_compact:
            self._compact_now()
        params = self.detector.params if self.detector is not None else None
        out = self._fn(params, self._map, self._carry, grays, depths,
                       self._pending_dev)
        (self._map, self._carry, packed, pending_out, feats_last,
         kf_dyn, kf_obj) = out
        self._pending_dev = pending_out
        self._inflight.append((packed, feats_last, kf_dyn, kf_obj,
                               grays, depths))
        if len(self._inflight) >= self.fetch_every:
            self._drain_all()

    # ------------------------------------------------------------------
    def _drain_all(self):
        if not self._inflight:
            return
        recs = self._inflight
        self._inflight = []
        # ONE packed transfer for everything the host must look at
        packed_np = jax.device_get([r[0] for r in recs])
        window_lost = False
        for (packed, feats_last, kf_dyn, kf_obj, grays, depths), pk in zip(
                recs, packed_np):
            c = pk.shape[0] - 1
            poses = pk[:c, :7]
            n_inl = pk[:c, 7].astype(int)
            need = pk[:c, 8] > 0.5
            lost = n_inl < self.cfg.tracker.min_inliers_local_map
            self.frame_lost.extend(lost.tolist())
            window_lost = window_lost or bool(lost.any())
            next_kf = int(pk[c, 0])
            # the pending of an EARLIER chunk was applied at this chunk's
            # start: resolve its slot id and fire loop closing + mapping
            if next_kf > self._next_kf_host and self._kf_events:
                ev = self._kf_events.pop(0)
                self._on_keyframe_inserted(next_kf - 1, ev)
            self._next_kf_host = max(self._next_kf_host, next_kf)
            # record frames against the current reference keyframe
            self.trajectory.extend(list(poses))
            self._traj_ref.extend([self._ref_slot] * c)
            self._traj_refpose.extend([self._ref_pose_ins] * c)
            self.n_inliers_hist.extend(n_inl.tolist())
            # queue this chunk's flagged keyframe (applied next chunk)
            flagged = np.nonzero(need)[0]
            if flagged.size:
                i = int(flagged[0])
                self._kf_events.append(_KfEvent(
                    pose=poses[i], gray=grays[i], depth=depths[i],
                    dyn_boxes=kf_dyn, obj_boxes=kf_obj))
            self._maybe_compact(next_kf, int(pk[c, 1]))
        if self._world_corrected:
            # a loop correction re-anchored the world mid-window: frames
            # of FUTURE chunks are tracked in the corrected world, so the
            # reference anchor must move to the ref KF's corrected pose
            # (frames of this window, already recorded above, keep the
            # old-world anchor their raw poses are consistent with)
            self._world_corrected = False
            if self._ref_slot >= 0:
                self._ref_pose_ins = np.asarray(
                    self._map.kf_pose[self._ref_slot])
        # idle drain: resume an aborted post-loop global BA (the reference
        # re-runs GBA once the preempting keyframe work drains)
        if (self.loop is not None and not self._kf_events
                and self.loop.gba_remaining > 0):
            m2 = self.loop.continue_gba(self._map)
            if m2 is not None:
                self._map = m2
        # tracking loss ANYWHERE in the drained window -> relocalize
        # (Tracking.h:93-99 LOST semantics: a mid-window collapse that
        # coasts back above the gate left a corrupted-pose segment — the
        # frames are flagged in `frame_lost` and the live pose re-anchors
        # through the keyframe database; host fallback of
        # Tracking::Relocalization)
        if self.loop is not None and window_lost:
            self._try_relocalize(recs[-1][1])

    def _on_keyframe_inserted(self, kf_id: int, ev: _KfEvent):
        self._ref_slot = kf_id
        self._ref_pose_ins = ev.pose
        if self.mapper is not None:
            self.mapper.insert_keyframe(ev.gray, ev.depth,
                                        jnp.asarray(ev.pose),
                                        ev.dyn_boxes, ev.obj_boxes)
        if self.loop is not None:
            corrected = self.loop.on_keyframe(self._map, kf_id)
            self._install_correction(corrected)

    def _install_correction(self, corrected):
        """Adopt a loop-corrected map and re-anchor the live tracking
        state through the correction delta of the loop keyframe:
        T' = T o inv(T_kf_old) o T_kf_new (velocity is invariant under
        the world re-anchoring)."""
        if corrected is None:
            return
        self.loops_closed += 1
        self._world_corrected = True
        _, old_pose, new_pose = self.loop.last_correction
        self._map = corrected
        delta = se3.se3_compose(se3.se3_inverse(old_pose), new_pose)
        self._carry = dataclasses.replace(
            self._carry, Tcw=se3.se3_compose(self._carry.Tcw, delta))
        p = self._pending_dev
        if bool(np.asarray(p[0])):
            self._pending_dev = (
                p[0], p[1], se3.se3_compose(p[2], delta), p[3], p[4])

    def _try_relocalize(self, feats_last):
        T, n = self.loop.relocalize(self._map, feats_last)
        if T is not None:
            self.relocs += 1
            self._carry = dataclasses.replace(
                self._carry, Tcw=jnp.asarray(T),
                velocity=se3.se3_identity())

    def flush(self):
        """Drain in-flight chunks, apply the queued keyframe, resolve any
        deferred loop detection."""
        self._drain_all()
        if self._pending_dev is None:
            return
        flag, f, pose, fid, matched = self._pending_dev
        if bool(np.asarray(flag)):
            self._map = insert_and_maintain(self.cfg, self._map, f, pose,
                                            fid, matched)
            self._pending_dev = self._empty_pending()
            nk = int(np.asarray(self._map.next_kf))
            if self._kf_events:
                ev = self._kf_events.pop(0)
                self._on_keyframe_inserted(nk - 1, ev)
            self._next_kf_host = nk
        if self.loop is not None:
            self._install_correction(self.loop.flush(self._map))
            if self._world_corrected:
                self._world_corrected = False
                if self._ref_slot >= 0:
                    self._ref_pose_ins = np.asarray(
                        self._map.kf_pose[self._ref_slot])

    flush_keyframes = flush

    def process_tail(self, grays, depths):
        """Process a trailing partial chunk (< chunk frames): pad with the
        last frame to the static chunk length, run normally, then drop the
        padded rows from every recorded per-frame output — the sequence
        tail is tracked instead of silently discarded."""
        k = int(grays.shape[0])
        if k == 0:
            return
        pad = self.chunk - k
        if pad > 0:
            grays = jnp.concatenate(
                [jnp.asarray(grays),
                 jnp.repeat(jnp.asarray(grays)[-1:], pad, 0)])
            depths = jnp.concatenate(
                [jnp.asarray(depths),
                 jnp.repeat(jnp.asarray(depths)[-1:], pad, 0)])
        self.process_chunk(grays, depths)
        self.flush()
        if pad > 0:
            for lst in (self.trajectory, self._traj_ref,
                        self._traj_refpose, self.n_inliers_hist,
                        self.frame_lost):
                del lst[-pad:]

    def lost_mask(self) -> np.ndarray:
        """Per-frame LOST flags aligned with poses_cw()."""
        return np.asarray(self.frame_lost, bool)

    # -- map checkpoint / resume on the real-time path (System
    #    save/load_checkpoint parity; the reference's TODO System.h:121-123)
    def save_checkpoint(self, path: str):
        from ..io import checkpoint as ckpt

        self.flush()
        extra = {}
        if self.loop is not None:
            extra["bow_db"] = np.asarray(self.loop.bow_db)
            extra["db_valid"] = np.asarray(self.loop.db_valid)
        ckpt.save_map(path, self.map, extra)

    def load_checkpoint(self, path: str):
        """Restore a saved map before tracking starts; the bootstrap
        relocalizes against the restored keyframe database. Combine with
        only_tracking=True for localization-only mode."""
        from ..io import checkpoint as ckpt

        assert self._carry is None, "load_checkpoint before any tracking"
        m, extra = ckpt.load_map(path)
        self.inner.map = m
        self.inner.n_kf = int(np.asarray(m.kf_valid).sum())
        self.inner.last_kf_id = int(np.asarray(m.next_kf)) - 1
        self.inner.state = "LOST"
        if self.loop is not None and "bow_db" in extra:
            self.loop.bow_db = jnp.asarray(extra["bow_db"])
            self.loop.db_valid = jnp.asarray(extra["db_valid"])

    def _maybe_compact(self, next_kf: int, next_pt: int):
        m = self._map
        margin_kf = 2 * self.fetch_every + 4
        if (next_kf >= m.max_kf - margin_kf
                or next_pt >= m.max_pt - 4096):
            # actual compaction runs at the next dispatch boundary, when
            # in-flight chunks (whose matched ids compaction would remap)
            # can be drained first
            self._want_compact = True

    def _compact_now(self):
        from ..mapstate import maintenance as mt

        self._want_compact = False
        self.flush()
        kf_valid = np.asarray(self._map.kf_valid)
        kf_pose = np.asarray(self._map.kf_pose)
        m2, kf_map, _ = mt.compact_map(self._map)
        self._map = m2
        kf_map_np = np.asarray(kf_map)
        # remap trajectory anchors; bake absolute poses for culled anchors
        baked = {}
        for i, ref in enumerate(self._traj_ref):
            if ref < 0:
                continue
            if kf_valid[ref]:
                self._traj_ref[i] = int(kf_map_np[ref])
            else:
                if ref not in baked:
                    baked[ref] = kf_pose[ref]
                T_abs = np.asarray(_export_traj(
                    jnp.asarray(self.trajectory[i])[None],
                    jnp.asarray(self._traj_refpose[i])[None],
                    jnp.asarray(baked[ref])[None]))[0]
                self._traj_ref[i] = -1
                self.trajectory[i] = T_abs
        if self._ref_slot >= 0 and kf_valid[self._ref_slot]:
            self._ref_slot = int(kf_map_np[self._ref_slot])
        else:
            self._ref_slot = -1
        if self.loop is not None:
            self.loop.remap_keyframes(kf_map, kf_valid)

    @property
    def map(self):
        if self._carry is not None:
            self.flush_keyframes()
            return self._map
        return self.inner.map

    @property
    def n_kf(self):
        return int(np.asarray(self.map.kf_valid).sum())

    def poses_cw(self) -> np.ndarray:
        self.flush()
        if not self.trajectory:
            return np.zeros((0, 7), np.float32)
        raw = np.stack(self.trajectory)
        refs = np.asarray(self._traj_ref)
        if not (refs >= 0).any():
            return raw
        refp = np.stack(self._traj_refpose)
        kf_now = np.asarray(self.map.kf_pose)[np.maximum(refs, 0)]
        out = np.asarray(_export_traj(jnp.asarray(raw), jnp.asarray(refp),
                                      jnp.asarray(kf_now)))
        return np.where((refs >= 0)[:, None], out, raw)


class ChunkedTracker(_ChunkRunnerBase):
    """Geometry-only chunked SLAM (no detector, no dynamic rejection)."""

    semantic = False

    def __init__(self, cfg: SlamConfig, chunk: int = 8,
                 pipeline_depth: int = 0, fetch_every: int | None = None,
                 loop=None, mapper=None, **kw):
        super().__init__(cfg, detector=None, chunk=chunk,
                         pipeline_depth=pipeline_depth,
                         fetch_every=fetch_every, loop=loop, mapper=mapper,
                         **kw)


class ChunkedSemanticTracker(_ChunkRunnerBase):
    """Full semantic pipeline at one dispatch per chunk."""

    semantic = True

    def __init__(self, cfg: SlamConfig, detector, chunk: int = 8,
                 pipeline_depth: int = 0, fetch_every: int | None = None,
                 loop=None, mapper=None, **kw):
        super().__init__(cfg, detector=detector, chunk=chunk,
                         pipeline_depth=pipeline_depth,
                         fetch_every=fetch_every, loop=loop, mapper=mapper,
                         **kw)


class ChunkedStereoTracker(_ChunkRunnerBase):
    """Rectified-stereo chunked SLAM: process_chunk takes (lefts, rights)
    [chunk, H, W] pairs; depth comes from the in-chunk epipolar SAD search
    (the stereo Frame constructor on the real-time path)."""

    semantic = False
    stereo = True

    def __init__(self, cfg: SlamConfig, chunk: int = 8,
                 pipeline_depth: int = 0, fetch_every: int | None = None,
                 loop=None, mapper=None, **kw):
        super().__init__(cfg, detector=None, chunk=chunk,
                         pipeline_depth=pipeline_depth,
                         fetch_every=fetch_every, loop=loop, mapper=mapper,
                         **kw)


class ChunkedSemanticStereoTracker(_ChunkRunnerBase):
    """Semantic + stereo on the real-time path: the detector and the
    dynamic-feature cull run on the LEFT image while depth comes from the
    epipolar SAD search — the stereo analogue of the reference's
    TrackStereo with the Detector2D hand-shake (System.cc:190-239)."""

    semantic = True
    stereo = True

    def __init__(self, cfg: SlamConfig, detector, chunk: int = 8,
                 pipeline_depth: int = 0, fetch_every: int | None = None,
                 loop=None, mapper=None, **kw):
        super().__init__(cfg, detector=detector, chunk=chunk,
                         pipeline_depth=pipeline_depth,
                         fetch_every=fetch_every, loop=loop, mapper=mapper,
                         **kw)
