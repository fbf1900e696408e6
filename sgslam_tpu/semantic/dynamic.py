"""Semantic + geometric dynamic-feature rejection — SG-SLAM's core novelty,
as one fused jitted program.

Contract of Frame::RmDynamicPointWithSemanticAndGeometry
(/root/reference/src/sg-slam/src/Frame.cc:430-612):
  1. LK optical flow current -> previous frame for every keypoint (:445);
  2. drop correspondences inside the previous frame's dynamic boxes before
     estimating geometry (:454-467);
  3. RANSAC fundamental matrix from the purged correspondences (:469-472);
  4. per-keypoint epipolar distance test with threshold 0.2 px inside a
     detected person box and 1.0 px outside (:563-597);
  5. abort the cull if fewer than 10% of the feature budget survives
     (:599-604).

Differences from the reference, by design: no blocking wait on a detector
thread (:478-481) — the caller passes the latest completed detection's boxes
(the reference effectively uses the previous frame's boxes on the mapping
path already); erase() becomes a keep-mask over the fixed-capacity feature
set.

Boxes are fixed-capacity [B,4] (x1, y1, x2, y2) with a validity mask.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import DynamicConfig
from ..geometry import epipolar
from ..ops import flow as flow_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Boxes:
    """Fixed-capacity 2-D detection boxes (Detector2D output contract)."""

    xyxy: jax.Array    # [B,4] float32 (x1,y1,x2,y2)
    cls: jax.Array     # [B] int32 VOC class id
    score: jax.Array   # [B] float32
    valid: jax.Array   # [B] bool

    @staticmethod
    def empty(capacity: int = 32) -> "Boxes":
        return Boxes(xyxy=jnp.zeros((capacity, 4), jnp.float32),
                     cls=jnp.zeros(capacity, jnp.int32),
                     score=jnp.zeros(capacity, jnp.float32),
                     valid=jnp.zeros(capacity, bool))


def in_any_box(xy, boxes: Boxes, box_mask):
    """xy [N,2] inside any (masked) box -> [N] bool.

    Contract of Frame::isInDynamicRegion (Frame.cc:629-652).
    """
    x, y = xy[..., 0:1], xy[..., 1:2]                     # [N,1]
    b = boxes.xyxy[None]                                  # [1,B,4]
    inside = ((x >= b[..., 0]) & (x <= b[..., 2])
              & (y >= b[..., 1]) & (y <= b[..., 3]))
    return jnp.any(inside & (boxes.valid & box_mask)[None, :], axis=-1)


@partial(jax.jit, static_argnums=(0,))
def reject_dynamic(cfg: DynamicConfig, gray_cur, gray_prev, kp_xy, kp_valid,
                   person_boxes: Boxes, prev_dynamic_boxes: Boxes, key):
    """Returns (keep_mask [N], n_flow_matches, n_inliers_F).

    kp_xy: current-frame keypoint coords (raw pixel space, level 0).
    person_boxes: current-frame person detections (cull threshold 0.2 px
    inside). prev_dynamic_boxes: previous-frame dynamic regions (excluded
    from F estimation).
    """
    # 1. flow current -> previous
    prev_xy, status = flow_mod.lk_flow(
        gray_cur, gray_prev, kp_xy, kp_valid,
        levels=cfg.flow_levels, window=cfg.flow_window, iters=cfg.flow_iters)

    # 2. purge flow correspondences inside previous dynamic boxes
    all_boxes = jnp.ones(prev_dynamic_boxes.valid.shape[0], bool)
    in_prev_dyn = in_any_box(prev_xy, prev_dynamic_boxes, all_boxes)
    for_f = status & ~in_prev_dyn

    # 3. fundamental matrix RANSAC on the purged set
    F, inl, n_inl = epipolar.ransac_fundamental(
        kp_xy, prev_xy, for_f, key,
        iters=cfg.ransac_iters, thresh=cfg.ransac_thresh)

    # 4. epipolar test: current kp vs its flow match in the previous frame
    dist = epipolar.epipolar_distance(F, kp_xy, prev_xy)
    in_person = in_any_box(kp_xy, person_boxes, jnp.ones_like(
        person_boxes.valid))
    thresh = jnp.where(in_person, cfg.epi_dist_in_box, cfg.epi_dist_outside)
    is_dynamic = status & (dist > thresh)

    keep = kp_valid & ~is_dynamic
    # 5. survivor floor: keep everything if the cull is too aggressive
    n_total = jnp.sum(kp_valid.astype(jnp.int32))
    n_keep = jnp.sum(keep.astype(jnp.int32))
    too_aggressive = n_keep < (cfg.min_survivor_ratio
                               * n_total.astype(jnp.float32))
    keep = jnp.where(too_aggressive, kp_valid, keep)
    return keep, jnp.sum(status.astype(jnp.int32)), n_inl


def match_prev_frame(matcher_cfg, scale_factor: float, feats_cur,
                     prev_xy, prev_level, prev_angle, prev_desc, prev_valid,
                     radius: float = 24.0):
    """Frame-to-frame correspondences by windowed ORB matching.

    TPU-first replacement for the LK optical flow at Frame.cc:445: the
    reference chases per-keypoint image patches (cheap scalar code on CPU,
    gather-bound on TPU — ~250 ms/frame); descriptor matching is one masked
    Hamming matrix (MXU/VPU, sub-ms) and yields the same contract — a
    previous-frame position per current keypoint + a validity status —
    with rotation-consistency filtering on top.

    Returns (prev_xy_of_cur [N,2], status [N] bool).
    """
    from ..matching import search

    N = feats_cur.xy_raw.shape[0]
    idx, ok, dist = search.search_by_projection(
        feats_cur.xy_raw, jnp.full(N, radius), feats_cur.level,
        feats_cur.desc, feats_cur.valid,
        prev_xy, prev_level, prev_desc, prev_valid,
        level_window=1, max_dist=matcher_cfg.th_low,
        scale_factor=scale_factor)
    ok = search.resolve_duplicate_targets(idx, ok, dist,
                                          prev_xy.shape[0])
    if matcher_cfg.check_orientation:
        dtheta = feats_cur.angle - prev_angle[idx]
        ok = search.rotation_consistency(dtheta, ok,
                                         matcher_cfg.histo_length)
    return prev_xy[idx], ok


def reject_dynamic_matched(cfg: DynamicConfig, kp_xy, kp_valid,
                           prev_xy, status,
                           person_boxes: Boxes,
                           prev_dynamic_boxes: Boxes, key):
    """Dynamic rejection on precomputed frame-to-frame correspondences
    (steps 2-5 of Frame::RmDynamicPointWithSemanticAndGeometry; step 1 —
    correspondence search — is `match_prev_frame` or `lk_flow`).

    Returns (keep_mask [N], n_corr, n_inliers_F).
    """
    all_boxes = jnp.ones(prev_dynamic_boxes.valid.shape[0], bool)
    in_prev_dyn = in_any_box(prev_xy, prev_dynamic_boxes, all_boxes)
    for_f = status & ~in_prev_dyn

    F, inl, n_inl = epipolar.ransac_fundamental(
        kp_xy, prev_xy, for_f, key,
        iters=cfg.ransac_iters, thresh=cfg.ransac_thresh)

    dist = epipolar.epipolar_distance(F, kp_xy, prev_xy)
    in_person = in_any_box(kp_xy, person_boxes,
                           jnp.ones_like(person_boxes.valid))
    thresh = jnp.where(in_person, cfg.epi_dist_in_box, cfg.epi_dist_outside)
    is_dynamic = status & (dist > thresh)
    if cfg.cull_unmatched_in_box:
        # stronger than the reference (which only culls points whose flow
        # succeeded, Frame.cc:563-597): a keypoint inside a confident
        # person box with NO frame-to-frame correspondence is either on a
        # fast mover (correspondence left the search window) or
        # unmatchable — both useless for mapping
        is_dynamic = is_dynamic | (~status & in_person)

    keep = kp_valid & ~is_dynamic
    n_total = jnp.sum(kp_valid.astype(jnp.int32))
    n_keep = jnp.sum(keep.astype(jnp.int32))
    too_aggressive = n_keep < (cfg.min_survivor_ratio
                               * n_total.astype(jnp.float32))
    keep = jnp.where(too_aggressive, kp_valid, keep)
    return keep, jnp.sum(status.astype(jnp.int32)), n_inl


def apply_keep_mask(feats, keep):
    """Culling = masking (replaces the reference's descriptor-row erase)."""
    return dataclasses.replace(feats, valid=feats.valid & keep)


class SemanticFrontend:
    """Per-frame dynamic-rejection state machine shared by the System path
    and the chunked runner's bootstrap: previous-frame features/boxes/gray
    + the PRNG for F-RANSAC, with the reference's init-frame semantic-only
    cull (no flow geometry before the first keyframe) and the full
    semantic+geometric cull afterwards (Frame.cc:430-612). One
    implementation, two callers — keeping the init-frame semantics in a
    single place."""

    def __init__(self, cfg, seed: int = 3):
        self.cfg = cfg
        self.prev_feats = None
        self.prev_gray = None
        self.prev_boxes = Boxes.empty(cfg.detector.max_boxes)
        self._key = jax.random.PRNGKey(seed)

    def cull(self, gray, feats, person_cull_boxes: Boxes,
             map_initialized: bool):
        """Returns the culled feature block for tracking. Call `push`
        afterwards with the PRE-cull features + this frame's dynamic boxes
        (the next frame's match target)."""
        cfg = self.cfg
        if not map_initialized:
            # initialization frames have no flow geometry yet: cull purely
            # by the person boxes so the FIRST keyframe's map contains no
            # moving points. The 10% survivor floor (Frame.cc:599-604)
            # applies here too: a false-positive box covering the frame
            # must not block initialization forever.
            inside = in_any_box(feats.xy_raw, person_cull_boxes,
                                jnp.ones_like(person_cull_boxes.valid))
            keep0 = feats.valid & ~inside
            n_total = jnp.sum(feats.valid.astype(jnp.int32))
            floor = (cfg.dynamic.min_survivor_ratio
                     * n_total.astype(jnp.float32))
            too_aggressive = jnp.sum(keep0.astype(jnp.int32)) < floor
            feats = apply_keep_mask(
                feats, jnp.where(too_aggressive, feats.valid, keep0))
        if self.prev_feats is None:
            return feats
        self._key, sub = jax.random.split(self._key)
        if cfg.dynamic.use_lk_flow:
            keep, _, _ = reject_dynamic(
                cfg.dynamic, gray, self.prev_gray, feats.xy_raw,
                feats.valid, person_cull_boxes, self.prev_boxes, sub)
        else:
            p = self.prev_feats
            prev_xy, status = match_prev_frame(
                cfg.matcher, cfg.orb.scale_factor, feats,
                p.xy_raw, p.level, p.angle, p.desc, p.valid,
                radius=cfg.dynamic.match_radius)
            keep, _, _ = reject_dynamic_matched(
                cfg.dynamic, feats.xy_raw, feats.valid, prev_xy, status,
                person_cull_boxes, self.prev_boxes, sub)
        return apply_keep_mask(feats, keep)

    def push(self, gray, feats_raw, dynamic_boxes: Boxes):
        self.prev_gray = gray
        self.prev_feats = feats_raw
        self.prev_boxes = dynamic_boxes
