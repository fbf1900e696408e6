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
    only FLAGS keyframe frames; the first flagged frame is then inserted
    (insert + the full LocalMapping maintenance pass) INSIDE the same
    chunk program, and the frames after it are RE-TRACKED against the
    updated map in a second scan pass — one map-copying `lax.cond` per
    chunk, zero keyframe latency. (An earlier design deferred the
    insertion to the next chunk's program; the one-chunk staleness made
    inliers sawtooth to zero under fast rotation — ~4 deg/frame kills a
    map that is 4 frames stale — which the per-frame reference pipeline
    never exhibits, System.cc:145-174.)
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
    # maintenance from the SECOND keyframe on (slot id >= 1), matching the
    # per-frame Tracker's n_kf >= 2 gate — skipping the first triangulation
    # pass starves the early map of ~100 points and the deficit compounds
    return jax.lax.cond(
        kf_id >= 1,
        lambda mm: tracking.process_new_keyframe(cfg, mm, kf_id),
        lambda mm: mm, m)


def make_track_chunk(cfg: SlamConfig, detector=None, semantic: bool = False,
                     stereo: bool = False, only_tracking: bool = False):
    """Build the jitted per-chunk program.

    Returns fn(det_params, m, carry, grays, depths) ->
      (m', carry', packed [c+1,9], feats_last, kf_dyn_boxes, kf_obj_boxes)
    where packed rows are [pose(7), n_inliers, is_kf] per frame plus a
    final stats row [next_kf, next_pt, kf_flag, i_kf, 0...]. The first
    flagged keyframe of a chunk is inserted IN-CHUNK (insert + the full
    LocalMapping maintenance pass) and the frames after it are re-tracked
    against the updated map. kf_*_boxes are the keyframe frame's
    detections (for the semantic mapper); feats_last is the last frame's
    culled feature block (for host-side relocalization on tracking loss).
    det_params is ignored when detector is None (pass None).
    stereo=True interprets (grays, depths) as the rectified (left, right)
    image pair and fills depth by epipolar SAD search instead
    (extract_frame_stereo) — the stereo mode on the real-time path.
    only_tracking=True freezes the map: no frame is ever flagged as a
    keyframe, so the insertion branch never fires (localization-only
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

    def chunk_fn(det_params, m, carry: TrackCarry, grays, depths,
                 n_live=None):
        """One chunk = batched frontend + sequential tracking + (when a
        frame flags a keyframe) in-chunk insertion + re-track of the
        remaining frames, all in one dispatch. The once-per-chunk
        keyframe cond costs one map copy on its identity branch — the
        price of keeping the map out of the scan carry.

        n_live (i32 scalar, default = chunk length) suppresses keyframe
        flagging for frames at index >= n_live: a padded tail chunk's
        duplicate frames must never insert a spurious keyframe."""
        n = grays.shape[0]
        if n_live is None:
            n_live = n
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
        def make_body(mm, allow_kf: bool):
            def body(c, xs):
                f, j = xs
                Tcw_pred = se3.se3_compose(c[1], c[0])
                Tcw, matched, n_inl, tc, uc = tracking.track_step(
                    cfg, mm, f, Tcw_pred)
                ok = n_inl >= t.min_inliers_local_map
                Tcw = jnp.where(ok, Tcw, Tcw_pred)
                since = c[2] + 1
                ref = c[3]
                need_close = (tc < 100) & (uc > 70)
                c1 = since >= t.max_frames_between_kf
                # KF need is RELATIVE to the reference keyframe's matches
                # (Tracking.cc:1085-1113: inliers < nRefMatches*ratio)
                c2 = ((n_inl < ref.astype(jnp.float32) * t.kf_tracked_ratio)
                      | need_close)
                need_kf = ok & (c1 | (c2 & (n_inl > 15))) & (j < n_live)
                if only_tracking or not allow_kf:
                    need_kf = jnp.zeros_like(need_kf)
                vel = se3.se3_compose(Tcw, se3.se3_inverse(c[0]))
                c_out = (Tcw, vel, jnp.where(need_kf, 0, since),
                         jnp.where(need_kf, n_inl, ref))
                return c_out, (Tcw, n_inl, matched, need_kf, c_out)
            return body

        c0 = (carry.Tcw, carry.velocity, carry.since_kf, carry.ref_matches)

        def retrack(mm, pin_idx, prev, allow_kf: bool):
            """Re-run tracking against an updated map for the frames AFTER
            `pin_idx` only: a `lax.while_loop` starts at the keyframe
            frame's recorded state and walks the suffix, so the re-track
            costs (n - pin - 1) track_steps instead of a full masked
            chunk scan. Frames at or before `pin_idx` keep the previous
            pass's results with need=False (their keyframe was consumed
            by the insertion)."""
            trk = make_body(mm, allow_kf)
            outs0 = (prev[0], prev[1], prev[2], jnp.zeros_like(prev[3]),
                     prev[4])
            c_start = jax.tree.map(lambda x: x[pin_idx], prev[4])

            def body(s):
                j, c, outs = s
                f = jax.tree.map(lambda x: x[j], feats_culled)
                c_out, out = trk(c, (f, j))
                outs = jax.tree.map(lambda o, v: o.at[j].set(v), outs, out)
                return (j + 1, c_out, outs)

            _, c_fin, outs = jax.lax.while_loop(
                lambda s: s[0] < n, body, (pin_idx + 1, c_start, outs0))
            return c_fin, outs

        def insert_at(mm, outs, idx):
            kf_feats = jax.tree.map(lambda x: x[idx], feats_culled)
            return insert_and_maintain_body(
                cfg, mm, kf_feats, outs[0][idx],
                carry.frame_id + idx, outs[2][idx])

        # ---- pass 1: track the chunk against the incoming map
        c1_final, outs1 = jax.lax.scan(make_body(m, True), c0,
                                       (feats_culled, jnp.arange(n)))
        flag1 = jnp.any(outs1[3])
        i1 = jnp.argmax(outs1[3]).astype(jnp.int32)   # first flagged frame

        # ---- in-chunk keyframe application + re-track (up to TWO rounds):
        # the flagged frame is inserted NOW (insert + full LocalMapping
        # maintenance) and later frames re-run against the updated map —
        # the per-frame path's zero-latency insertion cadence. The second
        # round exists because under fast rotation one keyframe per chunk
        # is not enough: the re-tracked frames may legitimately need the
        # NEXT keyframe within the same chunk.
        def with_kf1(mm):
            m2 = insert_at(mm, outs1, i1)
            c2_final, outs2 = retrack(m2, i1, outs1, allow_kf=True)
            flag2 = jnp.any(outs2[3])
            i2 = jnp.argmax(outs2[3]).astype(jnp.int32)

            def with_kf2(mm2):
                m3 = insert_at(mm2, outs2, i2)
                c3_final, outs3 = retrack(m3, i2, outs2, allow_kf=False)
                return m3, c3_final, outs3

            def no_kf2(mm2):
                return mm2, c2_final, outs2

            m3, c_fin, outs_fin = jax.lax.cond(flag2, with_kf2, no_kf2, m2)
            return m3, c_fin, outs_fin, flag2, i2

        def no_kf1(mm):
            return (mm, c1_final, outs1, jnp.asarray(False),
                    jnp.zeros((), jnp.int32))

        m, c_final, outs, flag2, i2 = jax.lax.cond(
            flag1, with_kf1, no_kf1, m)
        poses, n_inl, matched = outs[0], outs[1], outs[2]

        last_feats = jax.tree.map(lambda x: x[-1], feats)
        last_boxes = jax.tree.map(lambda x: x[-1], dyn_boxes)
        carry2 = TrackCarry(Tcw=c_final[0], velocity=c_final[1],
                            since_kf=c_final[2], ref_matches=c_final[3],
                            frame_id=carry.frame_id + n,
                            prev_feats=last_feats, prev_boxes=last_boxes,
                            key=new_key)

        kf_dyn = jax.tree.map(lambda x: jnp.stack([x[i1], x[i2]]),
                              dyn_boxes)
        kf_obj = jax.tree.map(lambda x: jnp.stack([x[i1], x[i2]]),
                              obj_boxes)

        # ---- ONE packed result array: [pose(7), n_inl, is_kf] per frame
        # + stats row [next_kf, next_pt, n_kf_inserted, i1, i2, 0...]
        n_ins = flag1.astype(jnp.float32) + flag2.astype(jnp.float32)
        is_kf = (((jnp.arange(n) == i1) & flag1)
                 | ((jnp.arange(n) == i2) & flag2))
        rows = jnp.concatenate(
            [poses, n_inl.astype(jnp.float32)[:, None],
             is_kf.astype(jnp.float32)[:, None]], axis=1)
        stats = jnp.zeros((1, 9), jnp.float32).at[0, 0].set(
            m.next_kf.astype(jnp.float32)).at[0, 1].set(
            m.next_pt.astype(jnp.float32)).at[0, 2].set(
            n_ins).at[0, 3].set(i1.astype(jnp.float32)).at[0, 4].set(
            i2.astype(jnp.float32))
        packed = jnp.concatenate([rows, stats], axis=0)

        feats_last = jax.tree.map(lambda x: x[-1], feats_culled)
        return (m, carry2, packed, feats_last, kf_dyn, kf_obj)

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
    """A keyframe inserted in-chunk; the drain fires loop closing and
    semantic mapping for it (the reference's LocalMapping->LoopClosing /
    PointcloudMapping queue hand-offs)."""

    pose: np.ndarray          # tracked pose at the keyframe frame
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
            # GBA-abort producer (the mbStopGBA role): a keyframe event
            # still waiting in the current drain window preempts a running
            # post-loop global BA; the remainder resumes at an idle drain
            # via continue_gba below
            loop.should_abort_gba = lambda: self._events_waiting > 0
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
        self._inflight: list = []         # dispatched, not-yet-fetched
        self._events_waiting = 0          # KF events left in this drain
        self._next_kf_host = 0
        self._ref_slot = -1               # current reference KF slot
        self._ref_pose_ins = np.asarray(se3.se3_identity())
        self._want_compact = False
        self._world_corrected = False
        # first frame whose recorded pose predates a correction installed
        # this window (the closure keyframe's frame id): the drain replays
        # the seam frames against the corrected map before finalizing
        self._seam_frame = -1
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
            corrected = self.loop.on_keyframe(self.inner.map,
                                              self.inner.last_kf_id)
            if corrected is not None:
                # bootstrap still runs the per-frame tracker: install the
                # correction the way the System path does
                self.inner.map = corrected
                self.inner.Tcw = corrected.kf_pose[self.inner.last_kf_id]
                self.inner.last_Tcw = self.inner.Tcw
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
            self._next_kf_host = int(np.asarray(self._map.next_kf))
            self._ref_slot = self.inner.last_kf_id
            self._ref_pose_ins = np.asarray(
                self._map.kf_pose[self._ref_slot])
        return self.inner.state == "OK"

    def process_chunk(self, grays, depths, n_live: int | None = None):
        """grays/depths [chunk, H, W]. Results are drained (trajectory,
        keyframe events, loop closing, mapping, relocalization) every
        `fetch_every` chunks; call flush() for the tail. n_live < chunk
        (process_tail) suppresses keyframe flagging on the padded rows."""
        assert self._carry is not None, "bootstrap first"
        if self._want_compact:
            self._compact_now()
        params = self.detector.params if self.detector is not None else None
        out = self._fn(params, self._map, self._carry, grays, depths,
                       jnp.asarray(self.chunk if n_live is None else n_live,
                                   jnp.int32))
        (self._map, self._carry, packed, feats_last, kf_dyn, kf_obj) = out
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
        win_start = len(self.trajectory)
        # ONE packed transfer for everything the host must look at
        packed_np = jax.device_get([r[0] for r in recs])
        tail_lost = False
        # GBA-abort producer input: keyframe events still queued behind the
        # one being processed ("a keyframe is waiting", mbStopGBA role)
        self._events_waiting = sum(int(pk[pk.shape[0] - 1, 2])
                                   for pk in packed_np)
        for (packed, feats_last, kf_dyn, kf_obj, grays, depths), pk in zip(
                recs, packed_np):
            c = pk.shape[0] - 1
            poses = pk[:c, :7]
            n_inl = pk[:c, 7].astype(int)
            lost = n_inl < self.cfg.tracker.min_inliers_local_map
            self.frame_lost.extend(lost.tolist())
            tail_lost = bool(lost[-1])
            next_kf = int(pk[c, 0])
            n_ins = int(pk[c, 2])
            kf_at = [(int(pk[c, 3 + w]), next_kf - n_ins + w, w)
                     for w in range(n_ins)]
            # keyframes were inserted IN-CHUNK: frames up to each anchor
            # to the reference keyframe current at that point, frames
            # after it to the newly inserted one
            prev_end = 0
            for idx, slot, w in kf_at:
                seg = idx + 1 - prev_end
                self.trajectory.extend(list(poses[prev_end:idx + 1]))
                self._traj_ref.extend([self._ref_slot] * seg)
                self._traj_refpose.extend([self._ref_pose_ins] * seg)
                prev_end = idx + 1
                self._events_waiting -= 1
                ev = _KfEvent(
                    pose=poses[idx], gray=grays[idx], depth=depths[idx],
                    dyn_boxes=jax.tree.map(lambda x: x[w], kf_dyn),
                    obj_boxes=jax.tree.map(lambda x: x[w], kf_obj))
                self._on_keyframe_inserted(slot, ev)
            self.trajectory.extend(list(poses[prev_end:]))
            self._traj_ref.extend([self._ref_slot] * (c - prev_end))
            self._traj_refpose.extend([self._ref_pose_ins] * (c - prev_end))
            self._next_kf_host = max(self._next_kf_host, next_kf)
            self.n_inliers_hist.extend(n_inl.tolist())
            self._maybe_compact(next_kf, int(pk[c, 1]))
        if self._world_corrected:
            # a loop correction re-anchored the world mid-window: the live
            # carry and the reference anchor move to the corrected world
            # for FUTURE chunks (frames of this window, already recorded
            # above, keep the old-world anchor their raw poses are
            # consistent with)
            self._reanchor_after_corrections()
            # ... and the SEAM frames (tracked on the pre-fusion duplicated
            # revisit structure) are re-tracked against the corrected map
            # while the window's images are still in hand
            tl = self._replay_seam(recs, win_start)
            if tl is not None:
                tail_lost = tl
        self._seam_frame = -1
        # resume an aborted post-loop global BA: the full remainder on an
        # idle drain, a bounded non-abortable slice otherwise — GBA makes
        # guaranteed progress even when keyframes keep arriving (the
        # reference's GBA thread runs concurrently with tracking)
        if self.loop is not None and self.loop.gba_remaining > 0:
            idle = self._events_waiting == 0
            m2 = self.loop.continue_gba(self._map,
                                        budget=None if idle else 4)
            if m2 is not None:
                self._map = m2
        # relocalize only when tracking is STILL lost at the window's tail
        # frame (Tracking.h:93-99: the reference relocalizes while
        # state==LOST, not retroactively). A mid-window dip that recovered
        # by the last frame keeps its healthy live pose — the affected
        # frames stay flagged in `frame_lost` for exporters — whereas a
        # PnP override here would clobber a good pose and zero velocity on
        # every transient occlusion.
        if self.loop is not None and tail_lost:
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
        """Adopt a loop-corrected map. The live carry is NOT touched here:
        the essential graph corrects every keyframe differently, and the
        carry is relative to the NEWEST keyframe of the drain window —
        which may not even be known yet while events of this window are
        still being processed. `_reanchor_after_corrections` applies the
        carry delta once, at the window end, through the final reference
        keyframe's insertion-time vs corrected pose."""
        if corrected is None:
            return
        self.loops_closed += 1
        self._world_corrected = True
        self._map = corrected
        # seam start = the closure keyframe's frame: frames tracked at or
        # after it used the PRE-fusion duplicated revisit structure, so
        # their recorded poses mix the two copies (measured up to ~0.16 m
        # relative error on a 0.03 m-class sequence) — the window-end
        # replay re-tracks them on the corrected map
        if self.loop is not None and self.loop.loops_closed:
            cur_slot = self.loop.loops_closed[-1][0]
            f0 = int(np.asarray(corrected.kf_frame_id[cur_slot]))
            self._seam_frame = (f0 if self._seam_frame < 0
                                else min(self._seam_frame, f0))

    def _reanchor_after_corrections(self):
        """Window-end carry re-anchoring after >=1 loop corrections:
        T' = T o inv(T_ref_at_insertion) o T_ref_now. All device tracking
        of the drained window ran in the pre-correction world (the world
        the reference keyframe was inserted in), so the composition is
        exact even across multiple corrections (velocity is invariant
        under the re-anchoring)."""
        self._world_corrected = False
        if self._ref_slot < 0:
            return
        ref_now = self._map.kf_pose[self._ref_slot]
        delta = se3.se3_compose(
            se3.se3_inverse(jnp.asarray(self._ref_pose_ins)), ref_now)
        self._carry = dataclasses.replace(
            self._carry, Tcw=se3.se3_compose(self._carry.Tcw, delta))
        self._ref_pose_ins = np.asarray(ref_now)

    def _replay_seam(self, recs, win_start: int):
        """Re-track the post-closure seam frames on the corrected map.

        Frames tracked at or after the closure keyframe associated against
        the PRE-fusion map, where the revisited structure exists twice
        (the drifted original + the fresh duplicates); their poses mix the
        two copies and no rigid re-anchoring can fix that (measured up to
        ~0.16 m relative error with healthy inlier counts). The per-frame
        reference path avoids this by closing immediately; the chunked
        path can do one better — the drain still HOLDS the window's
        images, so the seam frames are simply re-run through the chunk
        program against the corrected+fused map (keyframe flagging
        suppressed), replacing their recorded poses, inlier counts, and
        anchors, and refreshing the live carry. Cost: at most
        `fetch_every` extra chunk dispatches per loop closure.

        Returns the replayed tail frame's lost flag when the replay
        reached the window's end, else None.
        """
        if self._seam_frame < 0:
            return None
        c = self.chunk
        n_frames = len(self.trajectory) - win_start
        replay_from = max(self._seam_frame, win_start)
        k0 = max((replay_from - win_start) // c, 0)
        b0 = win_start + k0 * c
        if b0 < 2:
            return None     # no pre-seam pose to seed the carry from
        kf_pose_np = np.asarray(self._map.kf_pose)
        kf_valid_np = np.asarray(self._map.kf_valid)

        def corrected_pose(f):
            """Recorded pose of frame f, re-anchored into the corrected
            world (exact for pre-seam frames)."""
            T = jnp.asarray(self.trajectory[f])
            ref = self._traj_ref[f]
            if ref < 0 or not kf_valid_np[ref]:
                return T
            ri = jnp.asarray(self._traj_refpose[f])
            rn = jnp.asarray(kf_pose_np[ref])
            return se3.se3_compose(
                se3.se3_compose(T, se3.se3_inverse(ri)), rn)

        T1 = corrected_pose(b0 - 1)
        T2 = corrected_pose(b0 - 2)
        carry = TrackCarry(
            Tcw=T1,
            velocity=se3.se3_compose(T1, se3.se3_inverse(T2)),
            # keyframe flagging is suppressed (n_live=0), so the KF-policy
            # fields are inert during the replay; the live values are
            # restored onto the final carry below
            since_kf=jnp.asarray(0, jnp.int32),
            ref_matches=jnp.asarray(200, jnp.int32),
            frame_id=jnp.asarray(b0, jnp.int32),
            # chunk k0-1's last culled features stand in for the raw block
            # (only the FIRST replayed frame's dynamic-rejection flow uses
            # it; the culled set differs from raw by the removed dynamic
            # features, which are exactly the ones flow should not use)
            prev_feats=recs[k0 - 1][1] if k0 > 0 else recs[k0][1],
            prev_boxes=Boxes.empty(self.cfg.detector.max_boxes),
            key=jax.random.PRNGKey(b0))
        params = self.detector.params if self.detector is not None else None
        m = jax.tree.map(jnp.copy, self._map)   # the chunk fn donates it
        outs = []
        for k in range(k0, len(recs)):
            m, carry, packed, feats_last, _, _ = self._fn(
                params, m, carry, recs[k][4], recs[k][5],
                jnp.asarray(0, jnp.int32))
            outs.append(packed)
        outs = jax.device_get(outs)

        ref_slot = self._ref_slot
        ref_now = (np.asarray(kf_pose_np[ref_slot]) if ref_slot >= 0
                   else np.asarray(se3.se3_identity()))
        hist_off = len(self.trajectory) - len(self.n_inliers_hist)
        tail_lost = None
        for k, pk in zip(range(k0, len(recs)), outs):
            cc = pk.shape[0] - 1
            base = win_start + k * c
            for j in range(cc):
                f = base + j
                if f < replay_from or f >= len(self.trajectory):
                    continue
                self.trajectory[f] = pk[j, :7].astype(np.float32)
                self._traj_ref[f] = ref_slot
                self._traj_refpose[f] = ref_now
                inl = int(pk[j, 7])
                lost = inl < self.cfg.tracker.min_inliers_local_map
                self.n_inliers_hist[f - hist_off] = inl
                self.frame_lost[f] = lost
                if f == win_start + n_frames - 1:
                    tail_lost = lost
        # the replayed carry is the corrected-world live state (fresher
        # than the rigid re-anchoring); keep the real KF-policy counters
        self._carry = dataclasses.replace(
            carry, since_kf=self._carry.since_kf,
            ref_matches=self._carry.ref_matches)
        return tail_lost

    def _try_relocalize(self, feats_last):
        T, n = self.loop.relocalize(self._map, feats_last)
        if T is not None:
            self.relocs += 1
            self._carry = dataclasses.replace(
                self._carry, Tcw=jnp.asarray(T),
                velocity=se3.se3_identity())

    def flush(self):
        """Drain in-flight chunks and resolve any deferred loop
        detection (keyframes are applied in-chunk; nothing else pends)."""
        self._drain_all()
        if self._carry is None:
            return
        if self.loop is not None:
            self._install_correction(self.loop.flush(self._map))
            if self._world_corrected:
                self._reanchor_after_corrections()
            # a correction at flush time has no in-hand window to replay
            self._seam_frame = -1

    flush_keyframes = flush

    def process_tail(self, grays, depths):
        """Process a trailing partial chunk (< chunk frames): pad with the
        last frame to the static chunk length, run normally (keyframe
        flagging suppressed on the padded rows via n_live), then drop the
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
        self.process_chunk(grays, depths, n_live=k)
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
