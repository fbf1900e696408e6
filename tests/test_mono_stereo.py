"""Monocular two-view initialization (Initializer.cc contract) and stereo
SAD matching (Frame::ComputeStereoMatches contract) on synthetic scenes
with exact ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.matching import search
from sgslam_tpu.ops import orb as orb_mod
from sgslam_tpu.ops import stereo
from sgslam_tpu.optim import initializer

CFG = config.synthetic_config(width=320, height=240)
ORB = config.OrbConfig(n_features=500, max_keypoints=512)


def _matched_pairs(g1, g2):
    f1 = orb_mod.extract(g1, ORB, CFG.camera)
    f2 = orb_mod.extract(g2, ORB, CFG.camera)
    idx, ok, _ = search.match_by_descriptor(
        f1.desc, f1.valid, f2.desc, f2.valid, config.MatcherConfig(),
        mutual=True)
    return f1.xy_raw, f2.xy_raw[idx], ok & f1.valid


def test_mono_init_general_motion():
    """Translation + rotation viewing full 3-D structure: F must win and
    the recovered pose must match ground truth up to scale."""
    T1_wc = se3.se3_identity()
    xi = jnp.asarray([0.25, 0.04, 0.05, 0.01, 0.06, 0.005], jnp.float32)
    T2_wc = se3.se3_exp(xi)
    g1, _ = synthetic.render_frame(CFG.camera, T1_wc)
    g2, _ = synthetic.render_frame(CFG.camera, T2_wc)
    p1, p2, ok = _matched_pairs(g1, g2)
    out = initializer.initialize_mono(CFG.camera, p1, p2, ok,
                                      jax.random.PRNGKey(0))
    assert bool(out["ok"]), f"init failed (rh={float(out['rh']):.2f})"
    # ground-truth relative pose 1 -> 2
    T21_gt = se3.se3_compose(se3.se3_inverse(T2_wc), T1_wc)
    T21 = np.asarray(out["T21"])
    # rotation error
    dq = se3.quat_mul(se3.quat_conj(jnp.asarray(T21[:4])), T21_gt[:4])
    ang = 2.0 * np.degrees(np.arccos(np.clip(abs(float(dq[0])), -1, 1)))
    assert ang < 2.0, f"rotation error {ang:.2f} deg"
    # translation DIRECTION error (mono scale is free)
    t_gt = np.asarray(T21_gt[4:7])
    t_est = T21[4:7]
    cos = abs(np.dot(t_gt, t_est)
              / max(np.linalg.norm(t_gt) * np.linalg.norm(t_est), 1e-9))
    # unrefined hypothesize-and-verify estimate (the reference polishes
    # with full BA right after initialization)
    assert cos > 0.97, f"translation direction cos {cos:.3f}"
    # enough triangulated support
    assert int(np.asarray(out["good"]).sum()) > 60


def test_mono_init_planar_scene_selects_homography():
    """Camera staring at the flat back wall: the homography score must
    dominate (RH > 0.40), the reference's planar-degeneracy guard."""
    wall_only = (synthetic.ROOM[0],)       # back wall plane alone
    T1_wc = se3.se3_identity()
    T2_wc = se3.se3_exp(jnp.asarray([0.18, 0.02, 0.0, 0.0, 0.03, 0.0],
                                    jnp.float32))
    g1, _ = synthetic.render_frame(CFG.camera, T1_wc, planes=wall_only)
    g2, _ = synthetic.render_frame(CFG.camera, T2_wc, planes=wall_only)
    p1, p2, ok = _matched_pairs(g1, g2)
    out = initializer.initialize_mono(CFG.camera, p1, p2, ok,
                                      jax.random.PRNGKey(1))
    assert float(out["rh"]) > 0.40, f"rh={float(out['rh']):.2f}"
    assert bool(out["used_H"])


def test_mono_init_rejects_garbage_matches(rng):
    """Random correspondences must not produce an accepted initialization."""
    p1 = jnp.asarray(rng.uniform([0, 0], [320, 240],
                                 size=(300, 2)).astype(np.float32))
    p2 = jnp.asarray(rng.uniform([0, 0], [320, 240],
                                 size=(300, 2)).astype(np.float32))
    out = initializer.initialize_mono(CFG.camera, p1, p2,
                                      jnp.ones(300, bool),
                                      jax.random.PRNGKey(2))
    assert not bool(out["ok"])


def test_stereo_match_depth():
    """Rectified synthetic pair: SAD matching must recover metric depth.

    Uses a 30 cm baseline (KITTI-class) so scene disparities are ~20 px —
    at the TUM-style 7.6 cm pseudo-baseline the synthetic room's 3.5 m
    walls give < 6 px of disparity and subpixel noise dominates."""
    import dataclasses

    cam = dataclasses.replace(CFG.camera, bf=80.0)
    baseline = cam.bf / cam.fx
    T_l = se3.se3_identity()
    # right camera displaced +baseline along camera x
    T_r = se3.se3_make(jnp.asarray([1.0, 0.0, 0.0, 0.0]),
                       jnp.asarray([baseline, 0.0, 0.0]))
    g_l, d_l = synthetic.render_frame(cam, T_l)
    g_r, _ = synthetic.render_frame(cam, T_r)
    feats = orb_mod.extract(g_l, ORB, cam)
    u_right, depth, ok = stereo.stereo_match(cam, g_l, g_r, feats.xy_raw,
                                             feats.level, feats.valid)
    ok = np.asarray(ok)
    assert ok.sum() > 150, f"only {ok.sum()} stereo matches"
    xy = np.clip(np.asarray(feats.xy_raw).astype(int), 0, [319, 239])
    gt = np.asarray(d_l)[xy[:, 1], xy[:, 0]]
    est = np.asarray(depth)
    rel = np.abs(est[ok] - gt[ok]) / np.maximum(gt[ok], 1e-6)
    assert np.median(rel) < 0.03, f"median depth error {np.median(rel):.3f}"
    # disparity sign convention: u_right < u_left for valid matches
    assert (np.asarray(u_right)[ok] < np.asarray(feats.xy_raw)[ok, 0]).all()


PIPE_CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)


def test_stereo_pipeline_e2e():
    """Full stereo tracking mode (System::TrackStereo contract): rectified
    pairs in, trajectory out, ATE at RGB-D level — no depth image anywhere."""
    from sgslam_tpu.eval import ate
    from sgslam_tpu.slam.system import System

    N = 24
    seq = synthetic.SyntheticSequence(PIPE_CFG.camera, n_frames=N)
    s = System(PIPE_CFG, enable_semantic=False, enable_mapping=False,
               enable_loop=False)
    for i in range(N):
        gl, gr, _ = seq.frame_stereo(i)
        s.track_stereo(gl, gr)
    assert s.state == "OK"
    assert s.tracker.n_kf >= 2
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in s.tracker.poses_cw()])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i)) for i in range(N)])
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    assert rmse < 0.06, f"stereo pipeline ATE {rmse:.4f}"


def test_mono_pipeline_e2e():
    """Full monocular mode (Tracking::MonocularInitialization +
    CreateInitialMapMonocular, Tracking.cc:602-795): scale-free two-view
    bootstrap, triangulation-driven map growth, Sim(3)-aligned ATE."""
    from sgslam_tpu.eval import ate
    from sgslam_tpu.slam.mono import MonoTracker

    # mono relies on triangulation alone for map growth, so keyframes come
    # densely (the reference's mono NeedNewKeyFrame is likewise far more
    # permissive than RGB-D's, Tracking.cc:1040-1113)
    mono_cfg = config.synthetic_config(
        width=320, height=240,
        orb=config.OrbConfig(n_features=600, max_keypoints=640),
        tracker=config.TrackerConfig(max_frames_between_kf=2,
                                     depth_threshold_factor=70.0),
        capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                    local_window=4, local_points=1024),
    )
    N = 30
    seq = synthetic.SyntheticSequence(mono_cfg.camera, n_frames=N)
    tr = MonoTracker(mono_cfg)
    init_frame = None
    for i in range(N):
        g, _ = seq.frame(i)
        tr.process_mono(g)
        if init_frame is None and tr.state == "OK":
            init_frame = i
    assert tr.state == "OK", "monocular tracking lost"
    assert init_frame is not None and init_frame < 15, init_frame
    assert tr.n_kf >= 2
    # map grows by triangulation alone (no depth sensor anywhere)
    assert int(np.asarray(tr.map.pt_valid).sum()) > 150
    est = tr.poses_cw()[init_frame:]
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i))
                      for i in range(init_frame, N)])
    # scale is unobservable in mono: Sim(3)-aligned ATE
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc, with_scale=True)
    span = np.linalg.norm(gt_wc[:, 4:7].max(0) - gt_wc[:, 4:7].min(0))
    assert rmse < 0.06 * max(span, 1.0), (
        f"mono pipeline Sim3-aligned ATE {rmse:.4f} over span {span:.2f}")
