"""Checkpoint / resume: a mapped session saves its map + keyframe database;
a fresh System restores it in localization-only mode and relocalizes —
the capability the reference leaves as a TODO (System.h:121-123)."""

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


def test_checkpoint_save_load_localize(tmp_path):
    poses = synthetic.make_circuit_trajectory(40, loops=0.5)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=40,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=poses)
    s1 = System(CFG, enable_semantic=False, enable_mapping=False)
    for i in range(28):
        g, d = seq.frame(i)
        s1.track_rgbd(g, d)
    assert s1.state == "OK" and s1.tracker.n_kf >= 4
    ckpt = str(tmp_path / "map.npz")
    s1.save_checkpoint(ckpt)
    n_pts = int(np.asarray(s1.tracker.map.pt_valid).sum())

    # fresh process: restore, relocalize, track without inserting keyframes
    s2 = System(CFG, enable_semantic=False, enable_mapping=False)
    s2.load_checkpoint(ckpt, localization_only=True)
    m = s2.tracker.map
    assert int(np.asarray(m.pt_valid).sum()) == n_pts
    assert s2.tracker.only_tracking

    n_kf_before = int(np.asarray(m.next_kf))
    # reloc must recover the pose IN THE MAP'S FRAME — i.e. session 1's own
    # estimate at that viewpoint (map drift vs ground truth is a property of
    # the saved map, not of relocalization, and is tested elsewhere)
    s1_traj = s1.tracker.poses_cw()
    states = []
    errs = []
    for j in (10, 11, 12, 13):        # revisit mapped viewpoints
        g, d = seq.frame(j)
        Tcw = s2.track_rgbd(g, d)
        states.append(s2.state)
        errs.append(float(np.linalg.norm(
            np.asarray(Tcw)[4:7] - s1_traj[j][4:7])))
    assert states[-1] == "OK", f"never relocalized after resume: {states}"
    ok_errs = [e for st, e in zip(states, errs) if st == "OK"]
    assert min(ok_errs) < 0.04, f"resume-localization error: {errs}"
    # localization-only: the restored map gained no keyframes
    assert int(np.asarray(s2.tracker.map.next_kf)) == n_kf_before
