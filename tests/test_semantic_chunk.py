"""The fully-fused semantic chunk (detector + dynamic rejection + tracking
+ mapping back-end inside ONE jitted scan, slam/scan_pipeline.
make_semantic_chunk) must deliver the same dynamic-scene robustness as the
per-frame System path — this is the bench.py hot path."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.eval import ate
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic
from sgslam_tpu.models.detector import Detector2D, default_detector_params
from sgslam_tpu.slam import scan_pipeline

CFG = config.synthetic_config(
    width=320, height=240,
    orb=config.OrbConfig(n_features=600, max_keypoints=640),
    capacity=config.MapCapacity(max_keyframes=64, max_points=8192,
                                local_window=4, local_points=1024),
)


def test_semantic_chunk_dynamic_scene():
    if default_detector_params() is None:
        pytest.skip("detector asset not built")
    N = 30
    chunk = 4
    seq = synthetic.SyntheticSequence(CFG.camera, n_frames=N, dynamic=True)
    det = Detector2D(CFG.detector)
    ct = scan_pipeline.ChunkedSemanticTracker(CFG, det, chunk=chunk)
    # per-frame bootstrap seeds a few keyframes before chunking starts
    # (deferred in-chunk insertion needs a viable starting map)
    n_boot = 6
    for i in range(n_boot):
        ct.bootstrap(*seq.frame(i))
    assert ct.inner.state == "OK"
    i = n_boot
    while i + chunk <= N:
        g = jnp.stack([seq.frame(j)[0] for j in range(i, i + chunk)])
        d = jnp.stack([seq.frame(j)[1] for j in range(i, i + chunk)])
        ct.process_chunk(g, d)
        i += chunk
    ct.flush()
    n_done = len(ct.trajectory)
    assert n_done >= N - chunk, n_done
    assert ct.n_kf >= 2
    est_wc = np.stack([np.asarray(se3.se3_inverse(jnp.asarray(p)))
                       for p in ct.poses_cw()])
    gt_wc = np.stack([np.asarray(seq.gt_pose_wc(j))
                      for j in range(n_done)])
    rmse, _, _ = ate.ate_rmse(est_wc, gt_wc)
    # the walking person must be rejected inside the scan: ATE stays at
    # static-scene level (compare test_system_dynamic's 0.09 gate)
    assert rmse < 0.09, f"semantic-chunk dynamic ATE {rmse:.3f}"
    assert min(ct.n_inliers_hist) > 20, min(ct.n_inliers_hist)
