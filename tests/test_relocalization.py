"""Relocalization after a kidnap: the tracker is teleported mid-sequence;
it must declare LOST (inlier gate) and recover through the BoW -> PnP-RANSAC
-> 50-inlier relocalization path — the contract of Tracking::Relocalization
(/root/reference/src/sg-slam/src/Tracking.cc:1460-1621) with
KeyFrameDatabase::DetectRelocalizationCandidates."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.slam.system import System

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    tracker=config.TrackerConfig(max_frames_between_kf=4,
                                 depth_threshold_factor=70.0),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)
N_MAP = 44          # half the circuit, mapped normally
KIDNAP_TO = 6       # teleport back to this frame's viewpoint


@pytest.fixture(scope="module")
def kidnap_run():
    poses = synthetic.make_circuit_trajectory(88, loops=1.0)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=88,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=poses)
    s = System(CFG, enable_semantic=False, enable_mapping=False)
    for i in range(N_MAP):
        g, d = seq.frame(i)
        s.track_rgbd(g, d)
    assert s.state == "OK" and s.tracker.n_kf > 5
    # the map's own estimate at each revisited viewpoint: relocalization
    # must recover the pose IN THE MAP'S FRAME — drift accumulated over
    # the 44 mapped frames is a property of the map, not of reloc (same
    # rationale as test_checkpoint_resume)
    own_traj = s.tracker.poses_cw()

    # kidnap: feed frames from a viewpoint ~140 degrees away from where the
    # motion model predicts; windowed association must fail -> LOST
    states, errs = [], []
    for j in range(KIDNAP_TO, KIDNAP_TO + 4):
        g, d = seq.frame(j)
        Tcw = s.track_rgbd(g, d)
        states.append(s.state)
        errs.append(float(np.linalg.norm(
            np.asarray(Tcw)[4:7] - own_traj[j][4:7])))
    return s, states, errs


def test_relocalization_recovers(kidnap_run):
    s, states, errs = kidnap_run
    # recovery within the kidnap burst, and it sticks
    assert "OK" in states, f"never relocalized: {states}"
    assert states[-1] == "OK", f"did not stay relocalized: {states}"


def test_relocalized_pose_accurate(kidnap_run):
    s, states, errs = kidnap_run
    ok_errs = [e for st, e in zip(states, errs) if st == "OK"]
    assert ok_errs and min(ok_errs) < 0.04, (
        f"relocalized pose error too high: {errs} (states {states})")


def test_relocalize_rejects_weak_candidates():
    """With an empty keyframe database, relocalize must return no pose."""
    from sgslam_tpu.slam.loop_closing import LoopCloser
    from sgslam_tpu.slam import tracking
    from sgslam_tpu.mapstate import mapstate as ms

    lc = LoopCloser(CFG)
    m = ms.empty_map(CFG.capacity, CFG.orb.max_keypoints)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=2,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=synthetic.make_circuit_trajectory(2))
    g, d = seq.frame(0)
    feats = tracking.extract_frame(CFG, g, d)
    T, n = lc.relocalize(m, feats)
    assert T is None and n < CFG.tracker.min_inliers_after_reloc
