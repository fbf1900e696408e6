"""Local-map queries for tracking: frustum culling, scale prediction,
local point selection, and BA-window assembly.

Replaces Frame::isInFrustum (/root/reference/src/sg-slam/src/Frame.cc:296-352),
MapPoint::PredictScale (src/MapPoint.cc:385-418), Tracking::UpdateLocalMap/
SearchLocalPoints (src/Tracking.cc:1277-1459) and the window-gathering
preamble of Optimizer::LocalBundleAdjustment (src/Optimizer.cc:456-546) —
as masked top-k selections over the flat map arrays.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera, in_image, project
from ..optim.local_ba import BAProblem
from .mapstate import NO_POINT, MapState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LocalPoints:
    """Fixed-capacity set of candidate map points for frame association."""

    ids: jax.Array        # [L] i32 global point ids
    pos: jax.Array        # [L,3]
    desc: jax.Array       # [L,8] u32
    proj_uv: jax.Array    # [L,2] predicted pixel coords
    pred_level: jax.Array  # [L] i32
    radius: jax.Array     # [L] f32 search radius factor (px at level 0)
    valid: jax.Array      # [L] bool


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("capacity", "scale_factor"))
def select_local_points(cam: Camera, m: MapState, Tcw,
                        scale_factor: float = 1.2,
                        capacity: int = 4096) -> LocalPoints:
    """Frustum-cull all map points against the predicted pose and keep the
    best `capacity` (by found-count) as association candidates.

    Folds Frame::isInFrustum's gates — positive depth, in-image projection,
    distance within the scale-invariance band, viewing angle vs normal
    (cos > 0.5), predicted octave — into one masked pass over [P].
    """
    pc = se3.se3_apply(Tcw[None], m.pt_pos)
    z = pc[..., 2]
    uv = project(cam, pc)
    Twc = se3.se3_inverse(Tcw)
    cam_center = Twc[4:7]
    dvec = m.pt_pos - cam_center[None]
    dist = jnp.linalg.norm(dvec, axis=-1)
    view_cos = jnp.sum(dvec * m.pt_normal, axis=-1) / jnp.maximum(dist, 1e-6)

    ok = (m.pt_valid & (z > 0.1) & in_image(cam, uv)
          & (dist >= 0.8 * m.pt_min_dist) & (dist <= 1.3 * m.pt_max_dist)
          & (view_cos > 0.5))

    # predicted pyramid level (MapPoint::PredictScale)
    ratio = jnp.maximum(m.pt_max_dist, 1e-6) / jnp.maximum(dist, 1e-6)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-6))
                 / math.log(scale_factor)).astype(jnp.int32), 0, 7)
    # search radius by viewing angle (ORBmatcher::RadiusByViewingCos,
    # ORBmatcher.cc:131): 2.5 if cos > 0.998 else 4.0
    radius = jnp.where(view_cos > 0.998, 2.5, 4.0)

    prio = jnp.where(ok, 1e6 + m.pt_found.astype(jnp.float32), -jnp.inf)
    top_p, top_i = jax.lax.top_k(prio, capacity)
    sel_ok = jnp.isfinite(top_p)
    return LocalPoints(
        ids=jnp.where(sel_ok, top_i, NO_POINT).astype(jnp.int32),
        pos=m.pt_pos[top_i],
        desc=m.pt_desc[top_i],
        proj_uv=uv[top_i],
        pred_level=pred_level[top_i],
        radius=radius[top_i],
        valid=sel_ok,
    )


@partial(jax.jit, static_argnames=("window", "n_fixed"))
def ba_window(m: MapState, center_kf, cov, window: int = 8, n_fixed: int = 8):
    """Select the local-BA keyframe window around `center_kf`.

    Reference contract (Optimizer.cc:456-504): optimized set = the KF +
    covisible KFs; fixed set = other KFs observing the window's points.
    Here: top (window-1) covisible KFs + center are optimized; the next
    `n_fixed` covisible KFs are fixed anchors. Returns (kf_ids [W+F],
    opt_mask [W+F]); invalid slots get id -1.
    """
    w_center = cov[center_kf]                     # [K]
    w_center = w_center.at[center_kf].set(jnp.inf)  # center always first
    top_w, top_i = jax.lax.top_k(w_center, window + n_fixed)
    ok = top_w > 0
    ids = jnp.where(ok, top_i, -1).astype(jnp.int32)
    opt_mask = (jnp.arange(window + n_fixed) < window) & ok
    # gauge: if no fixed KFs exist (early map), fix the oldest in-window KF
    any_fixed = jnp.any(ok & ~opt_mask)
    oldest_pos = jnp.argmin(jnp.where(ok, ids, 10 ** 9))
    opt_mask = jnp.where(any_fixed, opt_mask,
                         opt_mask.at[oldest_pos].set(False))
    return ids, opt_mask


@partial(jax.jit, static_argnames=("window", "n_fixed"))
def ba_window_temporal(m: MapState, center_kf, window: int = 8,
                       n_fixed: int = 4):
    """Temporal local-BA window: the most recent `window` VALID keyframes
    (at or before `center_kf`) optimized, the `n_fixed` before them fixed.

    Hot-path substitute for the covisibility-ranked window: computing the
    full covisibility matrix costs a [K, P] incidence scatter (~100 ms on
    TPU), while sequential keyframes ARE the covisible set for an RGB-D
    camera walking a scene. Loop-closure paths still use `ba_window`.
    Culled slots (kf_valid = False) are skipped, so the window stays
    meaningful after KeyFrameCulling.
    """
    W = window + n_fixed
    slot = jnp.arange(m.max_kf, dtype=jnp.int32)
    prio = jnp.where(m.kf_valid & (slot <= center_kf), slot, -1)
    top = jax.lax.top_k(prio, W)[0]         # descending recency
    ok = top >= 0
    ids = jnp.where(ok, top, -1)
    opt_mask = (jnp.arange(W) < window) & ok
    any_fixed = jnp.any(ok & ~opt_mask)
    oldest_pos = jnp.argmin(jnp.where(ok, ids, 10 ** 9))
    opt_mask = jnp.where(any_fixed, opt_mask,
                         opt_mask.at[oldest_pos].set(False))
    return ids, opt_mask


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_points", "scale_factor"))
def build_ba_problem(cam: Camera, m: MapState, kf_ids, opt_mask,
                     max_points: int = 4096,
                     scale_factor: float = 1.2) -> tuple[BAProblem, jax.Array]:
    """Assemble the fixed-capacity BAProblem for a KF window.

    Observations = every (window KF, feature) pair whose obs table entry
    points at a selected local point. Returns (problem, point_ids [PL]).
    """
    W = kf_ids.shape[0]
    N = m.n_feat
    kf_ok = kf_ids >= 0
    kf_safe = jnp.where(kf_ok, kf_ids, 0)

    obs_pt_global = jnp.where(kf_ok[:, None], m.kf_obs_point[kf_safe],
                              NO_POINT)                      # [W,N]

    # select up to max_points distinct points observed in the window,
    # preferring points with many in-window observations
    P = m.max_pt
    counts = jnp.zeros(P + 1, jnp.int32).at[
        jnp.where(obs_pt_global >= 0, obs_pt_global, P).reshape(-1)].add(1)
    counts = counts[:P] * m.pt_valid.astype(jnp.int32)
    top_c, pt_ids = jax.lax.top_k(counts, max_points)
    pt_ok = top_c > 0
    # global pid -> local index lookup
    local_of = jnp.full(P + 1, -1, jnp.int32).at[
        jnp.where(pt_ok, pt_ids, P)].set(
        jnp.arange(max_points, dtype=jnp.int32))

    obs_local = local_of[jnp.where(obs_pt_global >= 0, obs_pt_global, P)]
    obs_valid = (obs_local >= 0) & kf_ok[:, None] & (obs_pt_global >= 0)

    # camera-major observation blocks [W, N] (BAProblem layout)
    uv = m.kf_feat_xy[kf_safe]                                # [W,N,2]
    ur = m.kf_feat_uvr[kf_safe]                               # [W,N]
    lv = m.kf_feat_level[kf_safe].astype(jnp.float32)
    inv_sigma2 = (1.0 / scale_factor ** 2) ** lv

    prob = BAProblem(
        poses=m.kf_pose[kf_safe],
        opt_mask=opt_mask & kf_ok,
        points=m.pt_pos[pt_ids],
        obs_pt=jnp.where(obs_valid, obs_local, 0),
        obs_uvr=jnp.concatenate([uv, ur[..., None]], -1),
        obs_w=inv_sigma2 * obs_valid.astype(jnp.float32),
    )
    return prob, jnp.where(pt_ok, pt_ids, NO_POINT).astype(jnp.int32)


@jax.jit
def writeback_ba(m: MapState, kf_ids, opt_mask, new_poses,
                 pt_ids, new_points, obs_inlier=None) -> MapState:
    """Scatter optimized poses/points back into the map."""
    kf_ok = (kf_ids >= 0) & opt_mask
    kf_slot = jnp.where(kf_ok, kf_ids, m.max_kf)
    kf_pose = m.kf_pose.at[kf_slot].set(new_poses, mode="drop")

    pt_ok = pt_ids >= 0
    pt_slot = jnp.where(pt_ok, pt_ids, m.max_pt)
    pt_pos = m.pt_pos.at[pt_slot].set(new_points, mode="drop")
    return dataclasses.replace(m, kf_pose=kf_pose, pt_pos=pt_pos)
