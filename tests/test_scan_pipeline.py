import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.eval import ate
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.slam import scan_pipeline

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)


def test_chunked_tracking_matches_gt():
    n = 26
    chunk = 5
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=n)
    ct = scan_pipeline.ChunkedTracker(CFG, chunk=chunk)
    assert ct.bootstrap(*seq.frame(0))
    frames = [seq.frame(i) for i in range(1, n)]
    for c in range(5):
        g = jnp.stack([f[0] for f in frames[c * chunk:(c + 1) * chunk]])
        d = jnp.stack([f[1] for f in frames[c * chunk:(c + 1) * chunk]])
        ct.process_chunk(g, d)

    assert ct.n_kf >= 2, "scan body should insert keyframes on device"
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in ct.poses_cw()])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(i)) for i in range(n)])
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    assert rmse < 0.06, f"chunked ATE {rmse:.4f}"
    assert min(ct.n_inliers_hist) > 30
