"""End-to-end SLAM on a synthetic RGB-D sequence: the accuracy gate that
replaces the reference's dataset-only validation (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.eval import ate
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.slam import tracking

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)


@pytest.fixture(scope="module")
def run_result():
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=30)
    tr = tracking.Tracker(CFG)
    for i in range(len(seq)):
        gray, depth = seq.frame(i)
        tr.process(gray, depth)
    est_cw = tr.poses_cw()
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in est_cw])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i))
                      for i in range(len(seq))])
    return tr, est_wc, gt_wc


def test_tracker_initializes_and_tracks(run_result):
    tr, est_wc, gt_wc = run_result
    assert tr.state == "OK"
    assert tr.n_kf >= 2, "should have inserted several keyframes"
    assert min(tr.n_inliers_hist) > 30, (
        f"inliers collapsed: {min(tr.n_inliers_hist)}")


def test_trajectory_ate(run_result):
    tr, est_wc, gt_wc = run_result
    rmse, _, err = ate.ate_rmse(est_wc, gt_wc)
    # trajectory spans ~1.5m; demand cm-level ATE on this clean scene
    assert rmse < 0.05, f"ATE RMSE {rmse:.4f} m too high (errs {err.max():.4f})"


def test_map_populated(run_result):
    tr, _, _ = run_result
    m = tr.map
    assert int(m.pt_valid.sum()) > 200
    # KeyFrameCulling may drop redundant keyframes; all live slots are
    # among the inserted ones
    assert 2 <= int(m.kf_valid.sum()) <= tr.n_kf
    # observations wired
    assert int((m.kf_obs_point >= 0).sum()) > 200
