"""KeyFrame culling at scale: on a long loopy run with dense keyframe
insertion, the greedy cull sweep (LocalMapping::KeyFrameCulling contract,
LocalMapping.cc:632-696) must keep the redundant-keyframe fraction bounded
— redundancy may not accumulate just because insertion outpaces a
too-slow culler."""

import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.io import synthetic
from sgslam_tpu.slam.system import System

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    # dense insertion: a keyframe every <=2 frames on a triple circuit
    tracker=config.TrackerConfig(max_frames_between_kf=2,
                                 depth_threshold_factor=70.0),
    capacity=config.MapCapacity(max_keyframes=128, max_points=16384,
                                local_window=4, local_points=1024),
)
N = 210
LOOPS = 3.0


def _redundancy(m):
    """Fraction of valid KFs whose observed points are >=90% covered by
    >=3 OTHER keyframes (the cull criterion, evaluated post-hoc)."""
    obs = np.asarray(m.kf_obs_point)
    kf_valid = np.asarray(m.kf_valid)
    P = obs.max() + 1
    has = obs >= 0
    counts = np.zeros(P + 1, np.int64)
    np.add.at(counts, np.where(has, obs, P).reshape(-1),
              has.reshape(-1).astype(np.int64))
    n_red = 0
    n_tot = 0
    nkf = int(np.asarray(m.next_kf))
    for k in range(nkf):
        if not kf_valid[k]:
            continue
        o = obs[k][has[k]]
        if len(o) == 0:
            continue
        n_tot += 1
        if (counts[o] >= 4).mean() >= 0.9:
            n_red += 1
    return (n_red / max(n_tot, 1)), n_tot


def test_redundancy_stays_bounded_on_loopy_run():
    poses = synthetic.make_circuit_trajectory(N, loops=LOOPS)
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N,
                                      planes=synthetic.ROOM_CLOSED,
                                      poses=poses)
    s = System(CFG, enable_semantic=False, enable_loop=False,
               enable_mapping=False)
    for i in range(N):
        g, d = seq.frame(i)
        s.track_rgbd(g, d)
    assert s.state == "OK"
    m = s.tracker.map

    n_inserted = int(np.asarray(m.next_kf)) \
        + s.tracker.compactions * 0  # slots are monotonic absent compaction
    n_valid = int(np.asarray(m.kf_valid).sum())
    # the culler actually fired: repeated circuits make many KFs redundant
    assert n_valid < n_inserted, (n_valid, n_inserted)

    frac, n_tot = _redundancy(m)
    # the reference's greedy sweep leaves only transiently-redundant KFs
    # (protection window + last-insertion effects); a stalled culler on a
    # triple circuit would show >50% redundancy
    assert frac < 0.30, (
        f"redundant-KF fraction {frac:.2f} over {n_tot} keyframes — "
        f"culling is not keeping up with loopy insertion")
