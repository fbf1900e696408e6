"""Global bundle adjustment + corrected-trajectory reconstruction.

Covers the contracts of Optimizer::GlobalBundleAdjustemnt
(/root/reference/src/sg-slam/src/Optimizer.cc:41-237) and
System::SaveTrajectoryTUM's relative-pose reconstruction (System.cc:424-453).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.optim.global_ba import global_ba_step
from sgslam_tpu.slam import tracking

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    tracker=config.TrackerConfig(max_frames_between_kf=5,
                                 depth_threshold_factor=70.0),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)


@pytest.fixture(scope="module")
def tracked():
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=16)
    tr = tracking.Tracker(CFG)
    for i in range(len(seq)):
        gray, depth = seq.frame(i)
        tr.process(gray, depth)
    assert tr.state == "OK" and tr.n_kf >= 3
    return tr


def _pose_err(a, b):
    d = jax.vmap(lambda x, y: se3.se3_log(
        se3.se3_compose(x, se3.se3_inverse(y))))(a, b)
    return np.linalg.norm(np.asarray(d), axis=1)


def _consistent_map(C=6, P=400):
    """MapState whose observations are EXACT projections — the global BA
    optimum is the constructing ground truth."""
    from sgslam_tpu.geometry import camera as cam_mod
    from sgslam_tpu.mapstate import mapstate as ms

    cam = CFG.camera
    rng = np.random.default_rng(11)
    m = ms.empty_map(CFG.capacity, CFG.orb.max_keypoints)
    xi = jnp.asarray((0.15 * np.arange(C)[:, None]
                      * np.array([[1, 0.2, 0.1, 0.05, 0.1, 0.02]])
                      ).astype(np.float32))
    poses = jax.vmap(se3.se3_exp)(xi)
    pts = jnp.asarray(rng.uniform([-1.5, -1.2, 2.0], [1.5, 1.2, 5.0],
                                  size=(P, 3)).astype(np.float32))
    N = m.n_feat
    obs_pt = np.full((m.max_kf, N), -1, np.int32)
    for c in range(C):
        obs_pt[c, :P] = rng.permutation(P)
    obs_pt = jnp.asarray(obs_pt)
    pc = jax.vmap(lambda T, ids: se3.se3_apply(T[None], pts[ids]))(
        poses, obs_pt[:C])
    uvr = jax.vmap(lambda x: cam_mod.project_stereo(cam, x))(pc)  # [C,N,3]

    kf_feat_xy = m.kf_feat_xy.at[:C].set(uvr[..., :2])
    kf_feat_uvr = m.kf_feat_uvr.at[:C].set(uvr[..., 2])
    kf_feat_valid = m.kf_feat_valid.at[:C, :P].set(True)
    return dataclasses.replace(
        m,
        kf_pose=m.kf_pose.at[:C].set(poses),
        kf_valid=m.kf_valid.at[:C].set(True),
        kf_feat_xy=kf_feat_xy, kf_feat_uvr=kf_feat_uvr,
        kf_feat_valid=kf_feat_valid,
        kf_obs_point=jnp.where(kf_feat_valid, obs_pt, -1),
        pt_pos=m.pt_pos.at[:P].set(pts),
        pt_valid=m.pt_valid.at[:P].set(True),
        next_kf=jnp.asarray(C, jnp.int32),
        next_pt=jnp.asarray(P, jnp.int32)), C, P


def test_global_ba_recovers_perturbed_map():
    m, C, P = _consistent_map()
    rng = np.random.default_rng(3)
    gt_pose, gt_pts = m.kf_pose, m.pt_pos
    xi = 0.01 * rng.normal(size=(m.max_kf, 6)).astype(np.float32)
    xi[0] = 0.0
    noisy_pose = jax.vmap(se3.se3_compose)(
        jax.vmap(se3.se3_exp)(jnp.asarray(xi)), gt_pose)
    noisy_pts = gt_pts + jnp.asarray(
        0.02 * rng.normal(size=gt_pts.shape).astype(np.float32))
    noisy = dataclasses.replace(m, kf_pose=noisy_pose, pt_pos=noisy_pts)

    out = global_ba_step(CFG, noisy, iters=10)
    before = _pose_err(noisy_pose[:C], gt_pose[:C])
    after = _pose_err(out.kf_pose[:C], gt_pose[:C])
    assert after.max() < 1e-3, (before, after)
    # gauge keyframe untouched
    np.testing.assert_allclose(np.asarray(out.kf_pose[0]),
                               np.asarray(gt_pose[0]))
    # points recovered too
    pt_err = np.linalg.norm(np.asarray(out.pt_pos[:P] - gt_pts[:P]), axis=1)
    assert np.median(pt_err) < 5e-3


def test_trajectory_follows_keyframe_correction(tracked):
    """Moving the keyframes must retroactively move the full trajectory
    (relative-pose reconstruction, System.cc:424-453)."""
    tr = tracked
    base = tr.poses_cw().copy()

    # rigidly shift the whole map: Tcw' = Tcw o inv(G)  (world moved by G)
    G = se3.se3_exp(jnp.asarray([0.05, -0.02, 0.04, 0.3, -0.1, 0.2],
                                jnp.float32))
    old_map = tr.map
    new_kf_pose = jax.vmap(
        lambda T: se3.se3_compose(T, se3.se3_inverse(G)))(old_map.kf_pose)
    tr.map = dataclasses.replace(old_map, kf_pose=new_kf_pose)
    try:
        moved = tr.poses_cw()
    finally:
        tr.map = old_map

    refs = np.asarray(tr.traj_ref_kf)
    exp = np.stack([
        np.asarray(se3.se3_compose(jnp.asarray(b), se3.se3_inverse(G)))
        for b in base])
    np.testing.assert_allclose(moved[refs >= 0], exp[refs >= 0],
                               atol=1e-5)
    # frames recorded before the first KF stay raw
    if (refs < 0).any():
        np.testing.assert_allclose(moved[refs < 0], base[refs < 0])


def test_global_ba_interruptible(tracked):
    """Cooperative cancellation (mbStopGBA contract): the abort hook stops
    the solve between slices, completed slices are kept."""
    from sgslam_tpu.optim.global_ba import global_ba_interruptible

    m = tracked.map
    calls = {"n": 0}

    def abort_after_first():
        calls["n"] += 1
        return True          # abort at the first poll

    out, done = global_ba_interruptible(CFG, m, iters=10, slice_iters=2,
                                        should_abort=abort_after_first)
    assert done == 2 and calls["n"] == 1
    assert bool(jnp.all(jnp.isfinite(out.kf_pose)))
    # without an abort hook the full budget runs
    out2, done2 = global_ba_interruptible(CFG, m, iters=4, slice_iters=2)
    assert done2 == 4


def test_gba_abort_producer_and_resume():
    """A keyframe arriving during GBA preempts it (the mbStopGBA producer,
    LoopClosing.cc:410-423); the aborted map stays consistent and the
    remainder resumes via continue_gba once the preempting work drains."""
    from sgslam_tpu.slam.loop_closing import LoopCloser

    m0, _, _ = _consistent_map()
    key = jax.random.PRNGKey(5)
    m_noisy = dataclasses.replace(
        m0, pt_pos=m0.pt_pos + 0.01 * jax.random.normal(key,
                                                        m0.pt_pos.shape))
    lc = LoopCloser(CFG)
    lc.should_abort_gba = lambda: True       # a keyframe is always waiting
    from sgslam_tpu.optim.global_ba import global_ba_interruptible

    m1, done = global_ba_interruptible(CFG, m_noisy, iters=10,
                                       should_abort=lc.should_abort_gba)
    lc.gba_remaining = 10 - done
    assert 0 < done < 10, done               # preempted mid-run
    # every completed slice is kept: the aborted map is finite and already
    # closer to the unperturbed points than the noisy start
    assert bool(jnp.all(jnp.isfinite(m1.kf_pose)))
    assert bool(jnp.all(jnp.isfinite(m1.pt_pos)))
    err0 = float(jnp.abs(jnp.where(m0.pt_valid[:, None],
                                   m_noisy.pt_pos - m0.pt_pos, 0)).max())
    err1 = float(jnp.abs(jnp.where(m0.pt_valid[:, None],
                                   m1.pt_pos - m0.pt_pos, 0)).max())
    assert err1 < err0

    # the preempting work drains -> resume completes the remaining slices
    lc.should_abort_gba = lambda: False
    m2 = lc.continue_gba(m1)
    assert m2 is not None and lc.gba_remaining == 0
    assert lc.continue_gba(m2) is None       # nothing left
    assert bool(jnp.all(jnp.isfinite(m2.pt_pos)))
