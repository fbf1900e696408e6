"""Map maintenance: point culling, keyframe culling, duplicate fusion,
epipolar triangulation of new points.

Replaces the rest of LocalMapping (/root/reference/src/sg-slam/src/
LocalMapping.cc): MapPointCulling (:170-205), KeyFrameCulling (:632-696),
SearchInNeighbors + ORBmatcher::Fuse (:454-534; ORBmatcher.cc:829,981), and
CreateNewMapPoints' epipolar triangulation (:207-453) — all as masked array
passes over the fixed-capacity map (erase = clearing validity bits;
merge = observation rewrites).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera, project, backproject
from ..matching import search
from ..matching.hamming import hamming_matrix, MAX_DIST
from .mapstate import NO_POINT, MapState, incidence_matrix


@jax.jit
def cull_map_points(m: MapState) -> MapState:
    """MapPointCulling contract: drop points whose found/visible ratio is
    below 0.25, or that stay nearly unobserved after creation."""
    obs_count = jnp.zeros(m.max_pt + 1, jnp.int32).at[
        jnp.where(m.kf_obs_point >= 0, m.kf_obs_point, m.max_pt).reshape(-1)
    ].add((m.kf_obs_point >= 0).reshape(-1).astype(jnp.int32))[:m.max_pt]

    ratio = (m.pt_found.astype(jnp.float32)
             / jnp.maximum(m.pt_visible.astype(jnp.float32), 1.0))
    seen_enough = jnp.where(m.pt_visible >= 4, ratio >= 0.25, True)
    # points created >=2 KFs ago need >=2 keyframe observations
    age = m.next_kf - m.pt_first_kf
    obs_ok = jnp.where(age >= 3, obs_count >= 2, True)
    keep = m.pt_valid & seen_enough & obs_ok
    return dataclasses.replace(m, pt_valid=keep)


@partial(jax.jit, static_argnames=("max_culls",))
def cull_keyframes(m: MapState, protect_last: int = 2,
                   max_culls: int = 3) -> MapState:
    """KeyFrameCulling contract (LocalMapping.cc:632-696): a keyframe is
    redundant if >= 90% of its observed points are seen by >= 3 other
    keyframes. Greedy sweep: up to `max_culls` keyframes per call, with
    observation counts RECOMPUTED after each cull (exactly the reference's
    erase-as-you-iterate semantics — culling two mutually-redundant
    keyframes in one masked pass could strand their shared points)."""

    def one_cull(_, m):
        obs = m.kf_obs_point
        has = obs >= 0
        obs_count = jnp.zeros(m.max_pt + 1, jnp.int32).at[
            jnp.where(has, obs, m.max_pt).reshape(-1)
        ].add(has.reshape(-1).astype(jnp.int32))[:m.max_pt]

        cnt = obs_count[jnp.where(has, obs, 0)]          # [K,N]
        redundant_obs = has & (cnt >= 4)                 # >=3 others + self
        n_obs = jnp.sum(has, axis=1)
        n_red = jnp.sum(redundant_obs, axis=1)
        redundant = (n_red.astype(jnp.float32)
                     >= 0.9 * jnp.maximum(n_obs.astype(jnp.float32), 1.0))
        # never cull KF 0 or the newest `protect_last`
        ids = jnp.arange(m.max_kf)
        protected = (ids == 0) | (ids >= m.next_kf - protect_last)
        cullable = m.kf_valid & redundant & ~protected
        first_cull = jnp.argmax(cullable)
        do_cull = jnp.any(cullable)
        kf_valid = m.kf_valid.at[first_cull].set(
            jnp.where(do_cull, False, m.kf_valid[first_cull]))
        obs_new = jnp.where((ids[:, None] == first_cull) & do_cull,
                            NO_POINT, m.kf_obs_point)
        return dataclasses.replace(m, kf_valid=kf_valid,
                                   kf_obs_point=obs_new)

    return jax.lax.fori_loop(0, max_culls, one_cull, m)


@jax.jit
def prev_valid_kf(m: MapState, kf_id):
    """Largest valid keyframe slot strictly before `kf_id` (-1 if none)."""
    slot = jnp.arange(m.max_kf, dtype=jnp.int32)
    prio = jnp.where(m.kf_valid & (slot < kf_id), slot, -1)
    return jnp.max(prio)


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_candidates", "radius"))
def fuse_duplicates(cam: Camera, m: MapState, kf_id,
                    scale_factor: float = 1.2,
                    max_candidates: int = 4096,
                    radius: float = 3.0) -> MapState:
    """Fuse contract (ORBmatcher::Fuse, ORBmatcher.cc:829 via
    LocalMapping::SearchInNeighbors, LocalMapping.cc:454-534): project map
    points into KF `kf_id`; when a projected point matches a feature already
    bound to a different point, merge into the better-observed point
    (rewriting observations everywhere); when it matches an unbound feature,
    add the observation.

    Candidates are frustum-culled to `max_candidates` first so the Hamming
    matrix stays [L, N] instead of [P, N] — this runs inside the per-KF scan.
    """
    Tcw = m.kf_pose[kf_id]
    pc_all = se3.se3_apply(Tcw[None], m.pt_pos)
    uv_all = project(cam, pc_all)
    in_view = (m.pt_valid & (pc_all[:, 2] > 0.1)
               & (uv_all[:, 0] >= 0) & (uv_all[:, 0] < cam.width)
               & (uv_all[:, 1] >= 0) & (uv_all[:, 1] < cam.height))
    prio = jnp.where(in_view, 1e6 + m.pt_found.astype(jnp.float32), -jnp.inf)
    top_p, cand = jax.lax.top_k(prio, max_candidates)     # [L] global pids
    cand_ok = jnp.isfinite(top_p)
    uv = uv_all[cand]

    # windowed descriptor match candidate point -> feature of this KF
    L = max_candidates
    idx, okm, dist = search.search_by_projection(
        uv, jnp.full(L, radius), jnp.zeros(L, jnp.int32),
        m.pt_desc[cand], cand_ok,
        m.kf_feat_xy[kf_id], m.kf_feat_level[kf_id],
        m.kf_feat_desc[kf_id], m.kf_feat_valid[kf_id],
        level_window=7, max_dist=50, scale_factor=scale_factor)
    okm = search.resolve_duplicate_targets(idx, okm, dist, m.n_feat)
    okm = okm & cand_ok

    bound = m.kf_obs_point[kf_id][idx]               # existing pid or -1
    pid = jnp.where(cand_ok, cand, m.max_pt)         # [L] global ids
    # merge: same feature claimed by projected point and an existing one ->
    # keep the point with more keyframe observations, invalidate the other
    obs_count = jnp.zeros(m.max_pt + 1, jnp.int32).at[
        jnp.where(m.kf_obs_point >= 0, m.kf_obs_point,
                  m.max_pt).reshape(-1)
    ].add((m.kf_obs_point >= 0).reshape(-1).astype(jnp.int32))

    conflict = okm & (bound >= 0) & (bound != pid)
    keep_existing = (obs_count[jnp.where(bound >= 0, bound, 0)]
                     >= obs_count[pid])
    loser = jnp.where(conflict & keep_existing, pid,
                      jnp.where(conflict, bound, -1))
    winner = jnp.where(conflict & keep_existing, bound,
                       jnp.where(conflict, pid, -1))
    # invalidate losers; rewrite ALL observations loser -> winner
    lose_mask = jnp.zeros(m.max_pt + 1, bool).at[
        jnp.where(loser >= 0, loser, m.max_pt)].set(True)[:m.max_pt]
    remap = jnp.arange(m.max_pt + 1, dtype=jnp.int32)
    remap = remap.at[jnp.where(loser >= 0, loser, m.max_pt)].set(
        jnp.where(winner >= 0, winner, 0).astype(jnp.int32))
    remap = remap.at[m.max_pt].set(m.max_pt)
    obs = m.kf_obs_point
    obs_new = jnp.where(obs >= 0, remap[jnp.where(obs >= 0, obs, 0)], obs)
    pt_valid = m.pt_valid & ~lose_mask

    # bind unbound features to the projected point
    new_bind = okm & (bound == NO_POINT) & pt_valid[jnp.clip(pid, 0,
                                                             m.max_pt - 1)]
    slot = jnp.where(new_bind, idx, m.n_feat)
    row_new = jnp.full(m.n_feat + 1, NO_POINT, jnp.int32).at[:m.n_feat].set(
        obs_new[kf_id]).at[slot].set(
        jnp.where(new_bind, pid, NO_POINT).astype(jnp.int32),
        mode="drop")[:m.n_feat]
    obs_new = obs_new.at[kf_id].set(row_new)
    return dataclasses.replace(m, pt_valid=pt_valid, kf_obs_point=obs_new)


@partial(jax.jit, static_argnums=(0,), static_argnames=("max_new",))
def triangulate_new_points(cam: Camera, m: MapState, kf_a, kf_b,
                           scale_factor: float = 1.2,
                           max_new: int = 128) -> MapState:
    """CreateNewMapPoints contract (epipolar triangulation between two
    keyframes): match unbound features along descriptor distance, DLT-
    triangulate, check cheirality / parallax / reprojection, insert.

    RGB-D creates most points from depth; this adds the far points the
    depth sensor misses (and is the mono/stereo path's workhorse).
    """
    desc_a = m.kf_feat_desc[kf_a]
    desc_b = m.kf_feat_desc[kf_b]
    free_a = m.kf_feat_valid[kf_a] & (m.kf_obs_point[kf_a] == NO_POINT)
    free_b = m.kf_feat_valid[kf_b] & (m.kf_obs_point[kf_b] == NO_POINT)
    from ..config import MatcherConfig

    idx, ok, dist = search.match_by_descriptor(
        desc_a, free_a, desc_b, free_b, MatcherConfig(), mutual=True)
    # rotation-consistency histogram (ORBmatcher.cc:1603-1646): matched
    # keypoints between two views of a rigid scene share one dominant
    # orientation delta; matches in minority bins are outliers.
    dtheta = m.kf_feat_angle[kf_a] - m.kf_feat_angle[kf_b][idx]
    ok = search.rotation_consistency(dtheta, ok)

    Ta = m.kf_pose[kf_a]
    Tb = m.kf_pose[kf_b]
    # rays in world frame
    Twa = se3.se3_inverse(Ta)
    Twb = se3.se3_inverse(Tb)
    uva = m.kf_feat_xy[kf_a]
    uvb = m.kf_feat_xy[kf_b][idx]

    def norm_ray(uv):
        return jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                          (uv[:, 1] - cam.cy) / cam.fy,
                          jnp.ones_like(uv[:, 0])], -1)

    ra = se3.quat_rotate(Twa[None, :4], norm_ray(uva))
    rb = se3.quat_rotate(Twb[None, :4], norm_ray(uvb))
    oa = Twa[4:7]
    ob = Twb[4:7]

    # midpoint triangulation (closed form, batched)
    w = jnp.sum(ra * rb, -1)
    d2a = jnp.sum(ra * ra, -1)
    d2b = jnp.sum(rb * rb, -1)
    dd = oa[None] - ob[None]
    denom = d2a * d2b - w * w
    sa = (w * jnp.sum(rb * dd, -1) - d2b * jnp.sum(ra * dd, -1)) / \
        jnp.maximum(denom, 1e-9)
    sb = (d2a * jnp.sum(rb * dd, -1) - w * jnp.sum(ra * dd, -1)) / \
        jnp.maximum(denom, 1e-9)
    pw = 0.5 * ((oa[None] + sa[:, None] * ra) + (ob[None] + sb[:, None] * rb))

    # checks: parallax, cheirality, reprojection
    cosp = w / jnp.sqrt(jnp.maximum(d2a * d2b, 1e-12))
    pca = se3.se3_apply(Ta[None], pw)
    pcb = se3.se3_apply(Tb[None], pw)
    err_a = jnp.sum((project(cam, pca) - uva) ** 2, -1)
    err_b = jnp.sum((project(cam, pcb) - uvb) ** 2, -1)
    good = (ok & (cosp < 0.9998) & (pca[:, 2] > 0.05) & (pcb[:, 2] > 0.05)
            & (err_a < 5.991) & (err_b < 5.991) & (denom > 1e-9))

    # allocate up to max_new
    prio = jnp.where(good, -dist.astype(jnp.float32), -jnp.inf)
    top_p, slots = jax.lax.top_k(prio, max_new)
    sel_ok = jnp.isfinite(top_p)
    new_ids = m.next_pt + jnp.cumsum(sel_ok.astype(jnp.int32)) - 1
    sel_ok = sel_ok & (new_ids < m.max_pt)
    new_ids = jnp.where(sel_ok, new_ids, m.max_pt)

    pw_sel = pw[slots]
    cam_center = Twa[4:7]
    dvec = pw_sel - cam_center[None]
    dist_w = jnp.linalg.norm(dvec, axis=-1)
    normal = dvec / jnp.maximum(dist_w, 1e-6)[:, None]
    lv = m.kf_feat_level[kf_a][slots].astype(jnp.float32)
    max_d = dist_w * scale_factor ** lv
    min_d = max_d / scale_factor ** 7

    mm = dataclasses.replace(
        m,
        pt_pos=m.pt_pos.at[new_ids].set(pw_sel, mode="drop"),
        pt_valid=m.pt_valid.at[new_ids].set(sel_ok, mode="drop"),
        pt_desc=m.pt_desc.at[new_ids].set(desc_a[slots], mode="drop"),
        pt_normal=m.pt_normal.at[new_ids].set(normal, mode="drop"),
        pt_min_dist=m.pt_min_dist.at[new_ids].set(min_d, mode="drop"),
        pt_max_dist=m.pt_max_dist.at[new_ids].set(max_d, mode="drop"),
        pt_first_kf=m.pt_first_kf.at[new_ids].set(kf_a, mode="drop"),
        next_pt=jnp.minimum(m.next_pt + jnp.sum(sel_ok.astype(jnp.int32)),
                            m.max_pt))
    # wire observations in both keyframes
    row_a = mm.kf_obs_point[kf_a]
    slot_a = jnp.where(sel_ok, slots, mm.n_feat)
    row_a = jnp.concatenate([row_a, jnp.full((1,), NO_POINT, jnp.int32)]
                            ).at[slot_a].set(
        jnp.where(sel_ok, new_ids, NO_POINT).astype(jnp.int32),
        mode="drop")[:mm.n_feat]
    row_b = mm.kf_obs_point[kf_b]
    slot_b = jnp.where(sel_ok, idx[slots], mm.n_feat)
    row_b = jnp.concatenate([row_b, jnp.full((1,), NO_POINT, jnp.int32)]
                            ).at[slot_b].set(
        jnp.where(sel_ok, new_ids, NO_POINT).astype(jnp.int32),
        mode="drop")[:mm.n_feat]
    obs = mm.kf_obs_point.at[kf_a].set(row_a).at[kf_b].set(row_b)
    return dataclasses.replace(mm, kf_obs_point=obs)


@jax.jit
def compact_map(m: MapState):
    """Repack valid keyframes and points to the front of their arrays,
    preserving insertion order, and remap all cross-references.

    The fixed-capacity map allocates monotonically (insert_keyframe writes
    slot `next_kf`; culling only clears validity bits), so a long run
    eventually exhausts slots even when the LIVE count is bounded by
    KeyFrameCulling / MapPointCulling. Compaction is the free-list: the host
    calls it when `next_kf`/`next_pt` nears capacity. This is the analogue
    of the reference's pointer-graph erase (Map.cc:63-116 EraseKeyFrame /
    EraseMapPoint actually free memory; we free slots in bulk instead).

    Returns (m', kf_new_of_old [K], pt_new_of_old [P]) — old slot -> new
    slot maps (useful entries only where the old slot was valid).
    """
    K, P = m.max_kf, m.max_pt
    kf_slot = jnp.arange(K, dtype=jnp.int32)
    pt_slot = jnp.arange(P, dtype=jnp.int32)
    # stable partition: valid slots first, in slot order
    kf_order = jnp.argsort(jnp.where(m.kf_valid, kf_slot, K + kf_slot))
    pt_order = jnp.argsort(jnp.where(m.pt_valid, pt_slot, P + pt_slot))
    kf_new_of_old = jnp.argsort(kf_order).astype(jnp.int32)
    pt_new_of_old = jnp.argsort(pt_order).astype(jnp.int32)
    n_kf = jnp.sum(m.kf_valid.astype(jnp.int32))
    n_pt = jnp.sum(m.pt_valid.astype(jnp.int32))

    def take_kf(x):
        return x[kf_order]

    def take_pt(x):
        return x[pt_order]

    # remap observation point ids through the point permutation; entries
    # pointing at invalid points become NO_POINT
    obs = take_kf(m.kf_obs_point)
    obs_safe = jnp.where(obs >= 0, obs, 0)
    obs_new = jnp.where((obs >= 0) & m.pt_valid[obs_safe],
                        pt_new_of_old[obs_safe], NO_POINT)
    first = take_pt(m.pt_first_kf)
    first_safe = jnp.where(first >= 0, first, 0)
    first_new = jnp.where((first >= 0) & m.kf_valid[first_safe],
                          kf_new_of_old[first_safe], -1)

    m2 = MapState(
        kf_pose=take_kf(m.kf_pose),
        kf_valid=take_kf(m.kf_valid),
        kf_frame_id=take_kf(m.kf_frame_id),
        kf_feat_xy=take_kf(m.kf_feat_xy),
        kf_feat_uvr=take_kf(m.kf_feat_uvr),
        kf_feat_depth=take_kf(m.kf_feat_depth),
        kf_feat_level=take_kf(m.kf_feat_level),
        kf_feat_angle=take_kf(m.kf_feat_angle),
        kf_feat_desc=take_kf(m.kf_feat_desc),
        kf_feat_valid=take_kf(m.kf_feat_valid),
        kf_obs_point=obs_new,
        pt_pos=take_pt(m.pt_pos),
        pt_valid=take_pt(m.pt_valid),
        pt_desc=take_pt(m.pt_desc),
        pt_normal=take_pt(m.pt_normal),
        pt_min_dist=take_pt(m.pt_min_dist),
        pt_max_dist=take_pt(m.pt_max_dist),
        pt_visible=take_pt(m.pt_visible),
        pt_found=take_pt(m.pt_found),
        pt_first_kf=first_new,
        next_kf=n_kf,
        next_pt=n_pt,
    )
    return m2, kf_new_of_old, pt_new_of_old
