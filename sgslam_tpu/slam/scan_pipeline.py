"""Fully on-device chunked SLAM: N frames per dispatch.

Why this exists: the per-call dispatch overhead over the axon TPU tunnel
(~25-35 ms) dwarfs the per-frame device work, so any host-driven per-frame
dispatch caps below real time. Here the per-frame pipeline — batched 2-D
detection, batched ORB extraction, batched semantic+geometric dynamic
rejection, and a lax.scan of the sequential tracking core — is ONE jitted
program per chunk.

Architecture notes (measured on the chip, see bench.py):

  * The MAP IS NOT part of the scan carry. A `lax.cond`'s identity branch
    must copy every carried array, so threading the ~40 MB MapState through
    a per-frame keyframe cond costs more than all the tracking math
    combined. Instead the scan reads the map as a loop-invariant input and
    only FLAGS keyframe frames; the host applies insert + the back-end
    maintenance pass (point culling, triangulation, fusion, local BA,
    KF culling) in separate donated (in-place) dispatches after the chunk.
    Tracking therefore consumes the map as-of-the-last-completed back-end
    pass — exactly the reference's Tracking/LocalMapping thread decoupling
    (System.cc:145-174), with a bounded one-chunk staleness.
  * Frame-to-frame correspondences for dynamic rejection use windowed ORB
    matching (MXU Hamming), not per-keypoint LK gathers — see
    semantic/dynamic.match_prev_frame.
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


def make_track_chunk(cfg: SlamConfig, detector=None, semantic: bool = False):
    """Build the jitted per-chunk program.

    Returns fn(det_params, m, carry, grays, depths) ->
      (carry', poses [c,7], n_inl [c], matched [c,N], need_kf [c],
       feats_culled (batched pytree), dyn_boxes (batched)).
    det_params is ignored when detector is None (pass None).
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
                return cull, dyn

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
        feats = jax.vmap(
            lambda g, d: tracking.extract_frame(cfg, g, d))(grays, depths)

        if detector is not None:
            cull_boxes, dyn_boxes = detect_batch(det_params, grays)
        else:
            cull_boxes = dyn_boxes = jax.tree.map(
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
        # scalars the host needs each chunk, packed into the ONE fetched
        # array (every separate host read is a tunnel round trip)
        stats = jnp.stack([m.next_kf, m.next_pt]).astype(jnp.int32)
        return m, carry2, poses, n_inl, matched, need_kf, feats_culled, stats

    return jax.jit(chunk_fn, donate_argnums=(1,))


class _ChunkRunnerBase:
    """Shared host facade: bootstrap per-frame, then one dispatch per chunk
    + deferred donated keyframe insertion (the LocalMapping decoupling)."""

    semantic = False

    def __init__(self, cfg: SlamConfig, detector=None, chunk: int = 8,
                 pipeline_depth: int = 0):
        self.cfg = cfg
        self.chunk = chunk
        self.pipeline_depth = pipeline_depth
        self.detector = detector
        self.inner = tracking.Tracker(cfg)
        self._fn = make_track_chunk(cfg, detector, semantic=self.semantic)
        self._carry = None
        self._pending: list = []       # keyframes queued for insertion
        self._pending_proto = None
        self._inflight: list = []      # dispatched, not-yet-fetched chunks
        self._want_compact = False
        self.trajectory: list[np.ndarray] = []
        self.n_inliers_hist: list[int] = []

    # -- bootstrap: per-frame path until the map initializes --
    def bootstrap(self, gray, depth):
        gray = jnp.asarray(gray)
        feats = tracking.extract_frame(self.cfg, gray, depth)
        cull_b = dyn_b = Boxes.empty(self.cfg.detector.max_boxes)
        if self.semantic and self.detector is not None:
            rgb = jnp.repeat(gray[..., None], 3, axis=-1)
            _, cull_b, dyn_b, _ = self.detector.detect(
                rgb, self.cfg.camera.width, self.cfg.camera.height)
            if self.inner.state == "NOT_INITIALIZED":
                # semantic-only cull before the first keyframe exists
                inside = dyn_mod.in_any_box(
                    feats.xy_raw, cull_b, jnp.ones_like(cull_b.valid))
                feats = dyn_mod.apply_keep_mask(feats, ~inside)
            prev = getattr(self, "_boot_prev", None)
            if prev is not None:
                self._boot_key, sub = jax.random.split(self._boot_key)
                prev_xy, status = dyn_mod.match_prev_frame(
                    self.cfg.matcher, self.cfg.orb.scale_factor, feats,
                    prev.xy_raw, prev.level, prev.angle, prev.desc,
                    prev.valid, radius=self.cfg.dynamic.match_radius)
                keep, _, _ = dyn_mod.reject_dynamic_matched(
                    self.cfg.dynamic, feats.xy_raw, feats.valid, prev_xy,
                    status, cull_b, self._boot_prev_boxes, sub)
                feats = dyn_mod.apply_keep_mask(feats, keep)
            else:
                self._boot_key = jax.random.PRNGKey(3)

        feats_raw = tracking.extract_frame(self.cfg, gray, depth)
        self._boot_prev = feats_raw
        self._boot_prev_boxes = dyn_b
        self.inner.process(gray, depth, feats=feats)
        self.trajectory.append(np.asarray(self.inner.Tcw))
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
        """grays/depths [chunk, H, W] -> poses of the chunk whose results
        were DRAINED this call (one chunk stays in flight: the host fetch
        of chunk k overlaps the device execution of chunk k+1), or None on
        the very first call. Call flush()/poses_cw() for the tail."""
        assert self._carry is not None, "bootstrap first"
        if self._want_compact:
            self._compact_now()
        params = self.detector.params if self.detector is not None else None
        frame0 = int(self._carry.frame_id)
        # at most one queued keyframe is applied inside the chunk program
        pending = (self._pending.pop(0) if self._pending
                   else self._empty_pending())
        out = self._fn(params, self._map, self._carry, grays, depths,
                       pending)
        self._map, self._carry = out[0], out[1]
        self._inflight.append((frame0, out[2:]))
        if len(self._inflight) > self.pipeline_depth:
            return self._drain_one()
        return None

    def _drain_one(self):
        frame0, (poses, n_inl, matched, need_kf, feats,
                 stats) = self._inflight.pop(0)
        # ONE packed transfer for everything the host must look at
        poses_np, n_inl_np, flags, st = jax.device_get(
            (poses, n_inl, need_kf, stats))
        # queue keyframes this chunk flagged; later chunks apply them
        # (the reference's Tracking->LocalMapping queue, System.cc:145-174)
        for i in np.nonzero(flags)[0]:
            f_i = jax.tree.map(lambda x: x[i], feats)
            self._pending.append(
                (jnp.asarray(True), f_i, poses[i],
                 jnp.asarray(frame0 + int(i), jnp.int32), matched[i]))
        self.trajectory.extend(list(poses_np))
        self.n_inliers_hist.extend(n_inl_np.astype(int).tolist())
        self._maybe_compact(int(st[0]), int(st[1]))
        return poses_np

    def flush(self):
        """Drain in-flight chunks and apply queued keyframes."""
        while self._inflight:
            self._drain_one()
        while self._pending:
            flag, f, pose, fid, matched = self._pending.pop(0)
            self._map = insert_and_maintain(self.cfg, self._map, f, pose,
                                            fid, matched)

    flush_keyframes = flush

    def _maybe_compact(self, next_kf: int, next_pt: int):
        m = self._map
        if (next_kf >= m.max_kf - 2 * self.chunk - 4
                or next_pt >= m.max_pt - 4096):
            # actual compaction runs at the next dispatch boundary, when
            # in-flight chunks (whose matched ids compaction would remap)
            # can be drained first
            self._want_compact = True

    def _compact_now(self):
        from ..mapstate import maintenance as mt

        self._want_compact = False
        self.flush()
        m2, _, _ = mt.compact_map(self._map)
        self._map = m2

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
        return np.stack(self.trajectory)


class ChunkedTracker(_ChunkRunnerBase):
    """Geometry-only chunked SLAM (no detector, no dynamic rejection)."""

    semantic = False

    def __init__(self, cfg: SlamConfig, chunk: int = 8,
                 pipeline_depth: int = 0):
        super().__init__(cfg, detector=None, chunk=chunk,
                         pipeline_depth=pipeline_depth)


class ChunkedSemanticTracker(_ChunkRunnerBase):
    """Full semantic pipeline at one dispatch per chunk."""

    semantic = True

    def __init__(self, cfg: SlamConfig, detector, chunk: int = 8,
                 pipeline_depth: int = 0):
        super().__init__(cfg, detector=detector, chunk=chunk,
                         pipeline_depth=pipeline_depth)
