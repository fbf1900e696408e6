"""Monocular tracking mode: two-view initialization + scale-free tracking.

Contract of Tracking::MonocularInitialization + CreateInitialMapMonocular
(/root/reference/src/sg-slam/src/Tracking.cc:602-795): a reference frame is
kept until a frame with >=100 window matches arrives; parallel H/F RANSAC
model selection recovers R|t and triangulates the first points
(optim/initializer.initialize_mono); the initial map is rescaled so the
median scene depth is 1 (Tracking.cc:769-781: inverse-median-depth
scaling); both views become keyframes and tracking proceeds through the
SAME track_step / LocalMapping machinery as RGB-D — map growth comes
entirely from epipolar triangulation (mono features carry no depth, so
keyframe insertion creates no depth points and pose optimization uses the
2-dof mono residual throughout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..geometry import se3
from ..mapstate import mapstate as ms
from ..matching import search
from ..optim.initializer import initialize_mono
from . import tracking

NO_POINT = ms.NO_POINT


def _match_for_init(cfg: SlamConfig, ref, cur, window: float = 100.0):
    """Window-constrained mutual descriptor matching between the init
    reference frame and the current frame (ORBmatcher::
    SearchForInitialization, ORBmatcher.cc:407). Returns (idx, ok): for
    current feature i, ref feature idx[i]."""
    idx, ok, dist = search.match_by_descriptor(
        cur.desc, cur.valid, ref.desc, ref.valid, cfg.matcher,
        max_dist=cfg.matcher.th_low, mutual=True)
    d = cur.xy - ref.xy[idx]
    ok = ok & (jnp.abs(d[:, 0]) < window) & (jnp.abs(d[:, 1]) < window)
    if cfg.matcher.check_orientation:
        dtheta = cur.angle - ref.angle[idx]
        ok = search.rotation_consistency(dtheta, ok,
                                         cfg.matcher.histo_length)
    return idx, ok


def bootstrap_mono_map(cfg: SlamConfig, feats_ref, feats_cur, ref_frame_id,
                       cur_frame_id, T21, points, good, match_idx):
    """Build the initial monocular map (CreateInitialMapMonocular,
    Tracking.cc:724-795): rescale to inverse median depth, allocate the
    triangulated points, insert both views as keyframes with wired
    observations. Returns (map, Tcw_cur_scaled)."""
    z = jnp.where(good, points[:, 2], jnp.nan)
    med = jnp.nanmedian(z)
    s = 1.0 / jnp.maximum(med, 1e-6)
    pts = points * s
    T21s = jnp.concatenate([T21[:4], T21[4:7] * s])

    m = ms.empty_map(cfg.capacity, cfg.orb.max_keypoints)
    N = feats_cur.capacity
    pid = jnp.cumsum(good.astype(jnp.int32)) - 1
    pid = jnp.where(good, pid, -1)
    n_new = jnp.sum(good.astype(jnp.int32))
    slot = jnp.where(good, pid, m.max_pt)

    # scale-invariance band + viewing normal from the reference view
    # (MapPoint::UpdateNormalAndDepth); KF0 sits at the origin
    dist = jnp.linalg.norm(pts, axis=-1)
    normal = pts / jnp.maximum(dist, 1e-6)[:, None]
    lv = feats_ref.level[match_idx].astype(jnp.float32)
    max_d = dist * cfg.orb.scale_factor ** lv
    min_d = max_d / cfg.orb.scale_factor ** (cfg.orb.n_levels - 1)

    m = dataclasses.replace(
        m,
        pt_pos=m.pt_pos.at[slot].set(pts, mode="drop"),
        pt_valid=m.pt_valid.at[slot].set(good, mode="drop"),
        pt_desc=m.pt_desc.at[slot].set(feats_cur.desc, mode="drop"),
        pt_normal=m.pt_normal.at[slot].set(normal, mode="drop"),
        pt_min_dist=m.pt_min_dist.at[slot].set(min_d, mode="drop"),
        pt_max_dist=m.pt_max_dist.at[slot].set(max_d, mode="drop"),
        pt_first_kf=m.pt_first_kf.at[slot].set(0, mode="drop"),
        next_pt=n_new)

    # observation wiring: current feature i <-> point pid[i] <-> ref
    # feature match_idx[i]
    matched_ref = jnp.full((N,), NO_POINT, jnp.int32).at[
        jnp.where(good, match_idx, N)].set(jnp.where(good, pid, NO_POINT),
                                           mode="drop")
    matched_cur = jnp.where(good, pid, NO_POINT)

    m = ms.insert_keyframe(cfg.camera, cfg.orb.scale_factor, m, feats_ref,
                           se3.se3_identity(), ref_frame_id, matched_ref,
                           cfg.close_depth_threshold)
    m = ms.insert_keyframe(cfg.camera, cfg.orb.scale_factor, m, feats_cur,
                           T21s, cur_frame_id, matched_cur,
                           cfg.close_depth_threshold)
    return m, T21s


class MonoTracker(tracking.Tracker):
    """Monocular front end over the shared Tracker state machine."""

    MIN_INIT_MATCHES = 100          # Tracking.cc:640-648

    def __init__(self, cfg: SlamConfig, **kw):
        super().__init__(cfg, **kw)
        self._init_ref = None
        self._init_ref_frame_id = -1
        self._init_key = jax.random.PRNGKey(17)

    def process_mono(self, gray) -> np.ndarray:
        feats = tracking.extract_frame_mono(self.cfg, jnp.asarray(gray))
        if self.state == "NOT_INITIALIZED":
            self._try_initialize(feats)
            self._record()
            self.frame_id += 1
            return np.asarray(self.Tcw)
        return self.process(gray, None, feats=feats)

    def _try_initialize(self, feats):
        n_kp = int(jnp.sum(feats.valid))
        if self._init_ref is None:
            if n_kp >= self.MIN_INIT_MATCHES:
                self._init_ref = feats
                self._init_ref_frame_id = self.frame_id
            return
        idx, ok = _match_for_init(self.cfg, self._init_ref, feats)
        n_match = int(jnp.sum(ok))
        if n_match < self.MIN_INIT_MATCHES:
            # too little overlap: re-seat the reference (Tracking.cc:644)
            self._init_ref = feats if n_kp >= self.MIN_INIT_MATCHES else None
            self._init_ref_frame_id = self.frame_id
            return
        self._init_key, sub = jax.random.split(self._init_key)
        init = initialize_mono(self.cfg.camera, self._init_ref.xy[idx],
                               feats.xy, ok, sub)
        if not bool(init["ok"]):
            return
        good = init["good"] & ok
        if int(jnp.sum(good)) < 50:
            return
        # parallax acceptance: a near-zero baseline passes the H/F vote but
        # triangulates a poorly conditioned map (the reference's CheckRT
        # demands >1deg parallax per good point, Initializer.cc:~850);
        # demand a median triangulation angle worth initializing on
        C2 = -se3.quat_rotate(se3.quat_conj(init["T21"][:4]),
                              init["T21"][4:7])
        r1 = init["points"]
        r2 = init["points"] - C2[None]
        cosang = (jnp.sum(r1 * r2, -1)
                  / jnp.maximum(jnp.linalg.norm(r1, axis=-1)
                                * jnp.linalg.norm(r2, axis=-1), 1e-9))
        ang = jnp.degrees(jnp.arccos(jnp.clip(
            jnp.where(good, cosang, jnp.nan), -1.0, 1.0)))
        if float(jnp.nanmedian(ang)) < 2.5:
            return
        m, T21s = bootstrap_mono_map(
            self.cfg, self._init_ref, feats, self._init_ref_frame_id,
            self.frame_id, init["T21"], init["points"], good, idx)
        self.map = m
        self.n_kf = 2
        self.last_kf_id = 1
        self.last_kf_frame_id = self.frame_id
        self.Tcw = T21s
        self.last_Tcw = T21s
        self.velocity = se3.se3_identity()
        self.state = "OK"
        self._init_ref = None
