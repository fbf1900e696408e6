import jax
import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.geometry import camera as cam_mod
from sgslam_tpu.geometry import se3
from sgslam_tpu.optim import local_ba


def make_problem(rng, C=4, P=128, N=256, noise=0.3, outlier_frac=0.0):
    cam = config.tum3_config().camera
    xi = jnp.asarray((0.2 * np.arange(C)[:, None]
                      * np.array([[1, 0.2, 0.1, 0.05, 0.1, 0.02]])
                      ).astype(np.float32))
    poses_gt = jax.vmap(se3.se3_exp)(xi)
    pts_gt = jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 6],
                                     size=(P, 3)).astype(np.float32))
    obs_pt = jnp.asarray(rng.integers(0, P, size=(C, N)), jnp.int32)
    pc = se3.se3_apply(poses_gt[:, None, :], pts_gt[obs_pt])
    uvr = np.array(cam_mod.project_stereo(cam, pc))
    uvr[..., :2] += rng.normal(scale=noise, size=uvr[..., :2].shape)
    n_out = int(outlier_frac * N)
    if n_out:
        uvr[:, :n_out, :2] += rng.uniform(20, 50, size=(C, n_out, 2))
    return cam, poses_gt, pts_gt, obs_pt, jnp.asarray(
        uvr.astype(np.float32))


def test_ba_converges(rng):
    cam, poses_gt, pts_gt, obs_pt, uvr = make_problem(rng)
    C, P = poses_gt.shape[0], pts_gt.shape[0]
    poses0 = jax.vmap(se3.se3_compose)(jax.vmap(se3.se3_exp)(
        jnp.asarray(0.03 * rng.normal(size=(C, 6)).astype(np.float32))),
        poses_gt)
    poses0 = poses0.at[0].set(poses_gt[0])
    pts0 = pts_gt + jnp.asarray(
        0.05 * rng.normal(size=(P, 3)).astype(np.float32))
    prob = local_ba.BAProblem(
        poses=poses0, opt_mask=jnp.asarray([False] + [True] * (C - 1)),
        points=pts0, obs_pt=obs_pt, obs_uvr=uvr,
        obs_w=jnp.ones(obs_pt.shape, jnp.float32))
    poses, pts, inl = local_ba.bundle_adjust(cam, prob)
    err = np.asarray(jax.vmap(lambda a, b: se3.se3_log(
        se3.se3_compose(a, se3.se3_inverse(b))))(poses, poses_gt))
    assert np.linalg.norm(err, axis=1).max() < 0.02
    assert float(np.asarray(inl).mean()) > 0.9


def test_ba_gates_outliers(rng):
    cam, poses_gt, pts_gt, obs_pt, uvr = make_problem(rng, outlier_frac=0.15)
    C, P = poses_gt.shape[0], pts_gt.shape[0]
    prob = local_ba.BAProblem(
        poses=poses_gt, opt_mask=jnp.asarray([False] + [True] * (C - 1)),
        points=pts_gt + 0.01, obs_pt=obs_pt, obs_uvr=uvr,
        obs_w=jnp.ones(obs_pt.shape, jnp.float32))
    poses, pts, inl = local_ba.bundle_adjust(cam, prob)
    inl = np.asarray(inl)
    assert inl[:, :38].mean() < 0.1, "outlier obs should be gated"
    err = np.asarray(jax.vmap(lambda a, b: se3.se3_log(
        se3.se3_compose(a, se3.se3_inverse(b))))(poses, poses_gt))
    assert np.linalg.norm(err, axis=1).max() < 0.02


def test_ba_respects_fixed_poses(rng):
    cam, poses_gt, pts_gt, obs_pt, uvr = make_problem(rng)
    C = poses_gt.shape[0]
    prob = local_ba.BAProblem(
        poses=poses_gt, opt_mask=jnp.zeros(C, bool),
        points=pts_gt, obs_pt=obs_pt, obs_uvr=uvr,
        obs_w=jnp.ones(obs_pt.shape, jnp.float32))
    poses, pts, _ = local_ba.bundle_adjust(cam, prob)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(poses_gt))


def test_inv3x3(rng):
    M = jnp.asarray(rng.normal(size=(32, 3, 3)).astype(np.float32))
    M = M @ jnp.swapaxes(M, -1, -2) + 0.1 * jnp.eye(3)
    inv = local_ba.inv3x3(M)
    eye = np.asarray(jnp.einsum("bij,bjk->bik", M, inv))
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)),
                               atol=1e-4)
