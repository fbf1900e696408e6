import os

import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.eval import ate
from sgslam_tpu.geometry import se3
from sgslam_tpu.io import synthetic, trajectory


def test_synthetic_render_shapes_and_content():
    cfg = config.synthetic_config(width=160, height=120)
    seq = synthetic.SyntheticSequence(cfg.camera, n_frames=3)
    gray, depth = seq.frame(0)
    assert gray.shape == (120, 160) and depth.shape == (120, 160)
    g = np.asarray(gray)
    d = np.asarray(depth)
    assert 0.0 <= g.min() and g.max() <= 1.0
    assert g.std() > 0.05, "texture should have contrast"
    assert (d > 0).mean() > 0.99, "nearly all pixels should hit the room"
    assert d[d > 0].max() < 20.0


def test_synthetic_depth_consistent_with_geometry():
    # backproject pixel with rendered depth -> world point must lie on a plane
    cfg = config.synthetic_config(width=160, height=120)
    seq = synthetic.SyntheticSequence(cfg.camera, n_frames=2)
    gray, depth = seq.frame(1)
    from sgslam_tpu.geometry import camera as cam_mod

    T_wc = seq.gt_pose_wc(1)
    uv = jnp.asarray([[80.0, 20.0]])  # upper-middle pixel: back wall
    z = depth[20, 80]
    pw = se3.se3_apply(T_wc, cam_mod.backproject(cfg.camera, uv, z[None]))
    # Must lie on one of the room planes (back wall z=3.5, floor y=1, x=-2)
    res = min(abs(float(pw[0, 2]) - 3.5), abs(float(pw[0, 1]) - 1.0),
              abs(float(pw[0, 0]) + 2.0))
    assert res < 1e-2, f"backprojected point not on any plane: {pw}"


def test_dynamic_object_renders():
    cfg = config.synthetic_config(width=160, height=120)
    seq_s = synthetic.SyntheticSequence(cfg.camera, n_frames=2, dynamic=False)
    seq_d = synthetic.SyntheticSequence(cfg.camera, n_frames=2, dynamic=True)
    _, ds = seq_s.frame(0)
    _, dd = seq_d.frame(0)
    # object at z~2.4 in front of wall at 3.5 -> some depths decrease
    assert (np.asarray(ds) - np.asarray(dd) > 0.5).sum() > 50


def test_trajectory_tum_roundtrip(tmp_path, rng):
    n = 10
    poses_wc = np.stack([np.asarray(se3.se3_exp(
        jnp.asarray(0.3 * rng.normal(size=6).astype(np.float32))))
        for _ in range(n)])
    poses_cw = np.stack([np.asarray(se3.se3_inverse(p)) for p in poses_wc])
    ts = np.arange(n, dtype=np.float64)
    path = os.path.join(tmp_path, "traj.txt")
    trajectory.save_tum(path, ts, poses_cw)
    ts2, poses2_wc = trajectory.load_tum(path)
    np.testing.assert_allclose(ts, ts2)
    np.testing.assert_allclose(poses_wc[:, 4:], poses2_wc[:, 4:], atol=1e-5)
    # quaternions up to sign
    dot = np.abs((poses_wc[:, :4] * poses2_wc[:, :4]).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_ate_zero_for_rigid_transform(rng):
    # ATE must be ~0 when est = fixed transform of gt
    n = 50
    gt = np.stack([np.asarray(se3.se3_exp(jnp.asarray(
        (0.1 * i * np.array([1, 0, 0, 0, 0, 0.01])).astype(np.float32))))
        for i in range(n)])
    offset = se3.se3_exp(jnp.asarray([1.0, 2.0, -0.5, 0.3, 0.2, 0.1]))
    est = np.stack([np.asarray(se3.se3_compose(offset, jnp.asarray(p)))
                    for p in gt])
    rmse, _, _ = ate.ate_rmse(est, gt)
    assert rmse < 1e-5


def test_ate_detects_noise(rng):
    n = 50
    gt = np.zeros((n, 7), np.float32)
    gt[:, 0] = 1.0
    gt[:, 4] = np.linspace(0, 5, n)
    est = gt.copy()
    est[:, 4:7] += rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    rmse, _, _ = ate.ate_rmse(est, gt)
    assert 0.01 < rmse < 0.2


def test_rpe_identity():
    n = 20
    gt = np.zeros((n, 7), np.float32)
    gt[:, 0] = 1.0
    gt[:, 4] = np.linspace(0, 2, n)
    t_rmse, r_rmse = ate.rpe(gt, gt)
    assert t_rmse < 1e-6 and r_rmse < 1e-6
