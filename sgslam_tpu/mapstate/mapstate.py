"""The map as a fixed-capacity array-of-structs pytree.

TPU-first redesign of the reference's pointer-graph map model — Map (global
KF/point registries + mutexes, /root/reference/src/sg-slam/src/Map.cc),
KeyFrame (covisibility graph + per-KF feature arrays, src/KeyFrame.cc),
MapPoint (observations, descriptor, normal/depth stats, src/MapPoint.cc) —
as flat arrays with validity masks (SURVEY.md §7):

  keyframes : pose [K,7], per-KF feature blocks [K,N,...], obs tables [K,N]
  points    : position [P,3], descriptor, normal, distance band, counters

There are no locks and no erase(): culling clears validity bits; allocation
takes the first invalid slots (free-list as argsort over the mask). The
covisibility graph is never stored — it is one (K x P) @ (P x K) incidence
matmul away (an MXU-friendly segment reduction replacing
KeyFrame::UpdateConnections, KeyFrame.cc:290).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import MapCapacity
from ..geometry import se3
from ..ops.orb import Features

NO_POINT = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapState:
    # --- keyframes ---
    kf_pose: jax.Array        # [K,7] Tcw (world->camera)
    kf_valid: jax.Array       # [K] bool
    kf_frame_id: jax.Array    # [K] i32 source frame index (timestamp key)
    # per-KF frozen feature block (the KF's Frame snapshot)
    kf_feat_xy: jax.Array     # [K,N,2] f32 undistorted coords
    kf_feat_uvr: jax.Array    # [K,N] f32 pseudo-stereo right u (<0 mono)
    kf_feat_depth: jax.Array  # [K,N] f32
    kf_feat_level: jax.Array  # [K,N] i32
    kf_feat_angle: jax.Array  # [K,N] f32
    kf_feat_desc: jax.Array   # [K,N,8] u32
    kf_feat_valid: jax.Array  # [K,N] bool
    kf_obs_point: jax.Array   # [K,N] i32 feature slot -> point id (NO_POINT)
    # --- points ---
    pt_pos: jax.Array         # [P,3] f32 world position
    pt_valid: jax.Array       # [P] bool
    pt_desc: jax.Array        # [P,8] u32 representative descriptor
    pt_normal: jax.Array      # [P,3] f32 mean viewing direction
    pt_min_dist: jax.Array    # [P] f32 scale-invariance band
    pt_max_dist: jax.Array    # [P] f32
    pt_visible: jax.Array     # [P] i32 times predicted visible
    pt_found: jax.Array       # [P] i32 times actually matched
    pt_first_kf: jax.Array    # [P] i32 creating keyframe
    # --- counters ---
    next_kf: jax.Array        # scalar i32
    next_pt: jax.Array        # scalar i32

    @property
    def max_kf(self):
        return self.kf_pose.shape[0]

    @property
    def max_pt(self):
        return self.pt_pos.shape[0]

    @property
    def n_feat(self):
        return self.kf_feat_xy.shape[1]


def empty_map(cap: MapCapacity, n_feat: int) -> MapState:
    K, P, N = cap.max_keyframes, cap.max_points, n_feat
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_pose=jnp.tile(se3.se3_identity()[None], (K, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, i32),
        kf_feat_xy=jnp.zeros((K, N, 2), f32),
        kf_feat_uvr=jnp.full((K, N), -1.0, f32),
        kf_feat_depth=jnp.full((K, N), -1.0, f32),
        kf_feat_level=jnp.zeros((K, N), i32),
        kf_feat_angle=jnp.zeros((K, N), f32),
        kf_feat_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs_point=jnp.full((K, N), NO_POINT, i32),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_valid=jnp.zeros(P, bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_min_dist=jnp.zeros(P, f32),
        pt_max_dist=jnp.full(P, 1e9, f32),
        pt_visible=jnp.zeros(P, i32),
        pt_found=jnp.zeros(P, i32),
        pt_first_kf=jnp.full(P, -1, i32),
        next_kf=jnp.zeros((), i32),
        next_pt=jnp.zeros((), i32),
    )


# ---------------------------------------------------------------------------
# Covisibility (replaces KeyFrame::UpdateConnections / GetBestCovisibility*)
# ---------------------------------------------------------------------------

def incidence_matrix(m: MapState, dtype=jnp.float32):
    """[K, P] 1.0 where keyframe k observes point p."""
    K, P = m.max_kf, m.max_pt
    k_idx = jnp.broadcast_to(jnp.arange(K)[:, None], m.kf_obs_point.shape)
    obs = m.kf_obs_point
    ok = (obs >= 0) & m.kf_valid[:, None]
    flat_k = jnp.where(ok, k_idx, 0).reshape(-1)
    flat_p = jnp.where(ok, obs, P).reshape(-1)  # invalid -> spare column
    inc = jnp.zeros((K, P + 1), dtype)
    inc = inc.at[flat_k, flat_p].add(jnp.where(ok.reshape(-1), 1.0, 0.0))
    return jnp.minimum(inc[:, :P], 1.0)


def covisibility_rows(m: MapState, kf_ids, min_weight: int = 15):
    """[Q, K] shared-point counts between query keyframes and all others,
    zero-diagonal, thresholded — the per-row form of `covisibility` for
    hot paths that need a handful of rows without materializing (or
    fetching) the full [K, K] matrix."""
    P = m.max_pt

    def one(q):
        obs_q = m.kf_obs_point[q]                       # [N]
        member = jnp.zeros(P + 1, jnp.float32).at[
            jnp.where(obs_q >= 0, obs_q, P)].set(
            jnp.where(obs_q >= 0, 1.0, 0.0))
        obs = jnp.where(m.kf_obs_point >= 0, m.kf_obs_point, P)
        row = jnp.sum(member[obs], axis=1)              # [K]
        row = row * m.kf_valid * m.kf_valid[q]
        row = row.at[q].set(0.0)
        return jnp.where(row >= min_weight, row, 0.0)

    return jax.vmap(one)(kf_ids)


def covisibility(m: MapState, min_weight: int = 15):
    """[K, K] shared-point counts, zero-diagonal, thresholded.

    Contract of KeyFrame::UpdateConnections (weight >= 15 edges,
    KeyFrame.cc:290) as one incidence matmul (MXU).
    """
    inc = incidence_matrix(m)
    w = inc @ inc.T
    w = w * (1.0 - jnp.eye(m.max_kf, dtype=w.dtype))
    w = jnp.where(w >= min_weight, w, 0.0)
    return w


# ---------------------------------------------------------------------------
# Keyframe insertion (replaces Tracking::CreateNewKeyFrame +
# LocalMapping::ProcessNewKeyFrame)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1), static_argnames=("max_new_points",))
def insert_keyframe(cam, scale_factor: float, m: MapState, feats: Features,
                    Tcw, frame_id, matched_point_ids,
                    close_depth, max_new_points: int = 256) -> MapState:
    """Append a keyframe; wire matched observations; create new map points
    from unmatched close-depth features.

    Contract of Tracking::CreateNewKeyFrame (Tracking.cc:1179-1248: create
    MapPoints from depth, nearest-first, for unmatched close features) +
    LocalMapping::ProcessNewKeyFrame (observation wiring) + the new points'
    MapPoint::UpdateNormalAndDepth stats (MapPoint.cc:330). All scatter ops;
    capacity overflow drops the lowest-priority new points.

    matched_point_ids: [N] i32 point id per feature slot (NO_POINT if none)
    — output of tracking's local-map association for this frame.
    """
    from ..geometry import camera as cam_mod

    k = m.next_kf  # sequential KF slots (culling clears validity only)

    # ---- new map points from unmatched features with depth
    unmatched = (matched_point_ids == NO_POINT) & feats.valid
    cand = unmatched & (feats.depth > 0)
    # nearest-first priority; keep all close points, and far ones until the
    # first 100 slots are filled (CreateNewKeyFrame loop, Tracking.cc:1224-44:
    # `if z < thDepth || nPoints < 100`)
    prio = jnp.where(cand, -feats.depth, -jnp.inf)
    top_prio, top_slot = jax.lax.top_k(prio, max_new_points)
    is_close = -top_prio < close_depth
    rank = jnp.arange(max_new_points)
    new_ok = jnp.isfinite(top_prio) & (is_close | (rank < 100))
    new_ids = m.next_pt + jnp.cumsum(new_ok.astype(jnp.int32)) - 1
    new_ok = new_ok & (new_ids < m.max_pt)
    new_ids = jnp.where(new_ok, new_ids, m.max_pt)  # spare row for drops

    # world positions from depth backprojection
    Twc = se3.se3_inverse(Tcw)
    p_cam = cam_mod.backproject(cam, feats.xy[top_slot],
                                feats.depth[top_slot])
    p_w = se3.se3_apply(Twc[None], p_cam)

    # scale-invariance band + normal (MapPoint::UpdateNormalAndDepth)
    cam_center = Twc[4:7]
    dvec = p_w - cam_center[None]
    dist = jnp.linalg.norm(dvec, axis=-1)
    normal = dvec / jnp.maximum(dist, 1e-6)[:, None]
    lv = feats.level[top_slot].astype(jnp.float32)
    level_scale = scale_factor ** lv
    max_d = dist * level_scale
    n_levels_scale = scale_factor ** 7  # 8 levels
    min_d = max_d / n_levels_scale

    pt_pos = m.pt_pos.at[new_ids].set(p_w, mode="drop")
    pt_valid = m.pt_valid.at[new_ids].set(new_ok, mode="drop")
    pt_desc = m.pt_desc.at[new_ids].set(feats.desc[top_slot], mode="drop")
    pt_normal = m.pt_normal.at[new_ids].set(normal, mode="drop")
    pt_min = m.pt_min_dist.at[new_ids].set(min_d, mode="drop")
    pt_max = m.pt_max_dist.at[new_ids].set(max_d, mode="drop")
    pt_first = m.pt_first_kf.at[new_ids].set(k, mode="drop")

    # ---- observation table: matched points + the new ones
    obs_row = matched_point_ids
    new_pt_for_slot = jnp.full((m.n_feat,), NO_POINT, jnp.int32).at[
        top_slot].set(jnp.where(new_ok, new_ids, NO_POINT).astype(jnp.int32))
    obs_row = jnp.where(obs_row == NO_POINT, new_pt_for_slot, obs_row)

    # representative-descriptor refresh (MapPoint::
    # ComputeDistinctiveDescriptors, MapPoint.cc:242: re-pick after new
    # observations). Running form: adopt the newly observed descriptor
    # when it has drifted far from the stored representative — keeps the
    # descriptor tracking the point's current appearance without gathering
    # every historic observation.
    from ..matching.hamming import hamming_pairs

    matched_desc = feats.desc  # row i describes feature i
    mp_safe = jnp.where(matched_point_ids >= 0, matched_point_ids, 0)
    drift = hamming_pairs(matched_desc, m.pt_desc[mp_safe])
    adopt = (matched_point_ids >= 0) & (drift > 40)
    pt_desc = pt_desc.at[
        jnp.where(adopt, matched_point_ids, m.max_pt)].set(
        matched_desc, mode="drop")

    # found/visible counters (MapPoint::IncreaseVisible/IncreaseFound,
    # MapPoint.cc:120-140): visible = predicted in this KF's frustum,
    # found = actually matched — their ratio drives MapPointCulling.
    was_matched = matched_point_ids >= 0
    mp = jnp.where(was_matched, matched_point_ids, m.max_pt)
    pt_found = m.pt_found.at[mp].add(1, mode="drop")
    pc_all = se3.se3_apply(Tcw[None], m.pt_pos)
    uv_all = cam_mod.project(cam, pc_all)
    in_frustum = (m.pt_valid & (pc_all[:, 2] > 0.1)
                  & (uv_all[:, 0] >= 0) & (uv_all[:, 0] < cam.width)
                  & (uv_all[:, 1] >= 0) & (uv_all[:, 1] < cam.height))
    pt_visible = m.pt_visible + in_frustum.astype(jnp.int32)
    # matched points count as visible even if the refined pose moved them
    # out of frame
    pt_visible = jnp.maximum(
        pt_visible,
        m.pt_visible.at[mp].add(1, mode="drop"))

    return dataclasses.replace(
        m,
        kf_pose=m.kf_pose.at[k].set(Tcw, mode="drop"),
        kf_valid=m.kf_valid.at[k].set(True, mode="drop"),
        kf_frame_id=m.kf_frame_id.at[k].set(frame_id, mode="drop"),
        kf_feat_xy=m.kf_feat_xy.at[k].set(feats.xy, mode="drop"),
        kf_feat_uvr=m.kf_feat_uvr.at[k].set(feats.u_right, mode="drop"),
        kf_feat_depth=m.kf_feat_depth.at[k].set(feats.depth, mode="drop"),
        kf_feat_level=m.kf_feat_level.at[k].set(feats.level, mode="drop"),
        kf_feat_angle=m.kf_feat_angle.at[k].set(feats.angle, mode="drop"),
        kf_feat_desc=m.kf_feat_desc.at[k].set(feats.desc, mode="drop"),
        kf_feat_valid=m.kf_feat_valid.at[k].set(feats.valid, mode="drop"),
        kf_obs_point=m.kf_obs_point.at[k].set(
            jnp.where(feats.valid, obs_row, NO_POINT), mode="drop"),
        pt_pos=pt_pos, pt_valid=pt_valid, pt_desc=pt_desc,
        pt_normal=pt_normal, pt_min_dist=pt_min, pt_max_dist=pt_max,
        pt_first_kf=pt_first, pt_found=pt_found, pt_visible=pt_visible,
        next_kf=m.next_kf + 1,
        next_pt=jnp.minimum(m.next_pt + jnp.sum(new_ok.astype(jnp.int32)),
                            m.max_pt),
    )
