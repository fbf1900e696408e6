"""Distributed Schur-complement BA on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgslam_tpu import config
from sgslam_tpu.geometry import camera as cam_mod
from sgslam_tpu.geometry import se3
from sgslam_tpu.parallel import dist_ba


def make_problem(rng, C=4, P_total=64, obs_per_pt=4, noise=0.2):
    cam = config.tum3_config().camera
    # ground-truth poses along a small arc
    xi = jnp.asarray(
        (0.15 * np.arange(C)[:, None]
         * np.array([[1.0, 0.2, 0.1, 0.05, 0.1, 0.02]])).astype(np.float32))
    poses_gt = jax.vmap(se3.se3_exp)(xi)
    pts_gt = jnp.asarray(
        rng.uniform([-2, -2, 2.0], [2, 2, 6.0],
                    size=(P_total, 3)).astype(np.float32))

    obs_cam = np.tile(np.arange(obs_per_pt) % C, P_total)
    obs_pt_global = np.repeat(np.arange(P_total), obs_per_pt)
    pc = se3.se3_apply(poses_gt[obs_cam], pts_gt[obs_pt_global])
    uvr = np.array(cam_mod.project_stereo(cam, pc))
    uvr[:, :2] += rng.normal(scale=noise, size=uvr[:, :2].shape)
    return cam, poses_gt, pts_gt, obs_cam, obs_pt_global, jnp.asarray(
        uvr.astype(np.float32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_ba_converges(rng):
    n_kf_shards, n_pt_shards = 2, 4
    mesh = dist_ba.make_mesh(n_kf_shards, n_pt_shards)
    cam, poses_gt, pts_gt, obs_cam, obs_pt_g, obs_uvr = make_problem(rng)
    C, P_total = poses_gt.shape[0], pts_gt.shape[0]

    # perturb initial state
    poses0 = jax.vmap(se3.se3_exp)(jnp.asarray(
        0.05 * rng.normal(size=(C, 6)).astype(np.float32)))
    poses0 = jax.vmap(se3.se3_compose)(poses0, poses_gt)
    pts0 = pts_gt + jnp.asarray(
        0.05 * rng.normal(size=(P_total, 3)).astype(np.float32))
    opt_mask = jnp.asarray([False] + [True] * (C - 1))
    poses0 = poses0.at[0].set(poses_gt[0])  # gauge anchor

    # observations are already grouped by point => contiguous point-sharding
    # keeps each observation with its point's shard (the production layout)
    obs_w = jnp.ones(len(obs_cam), jnp.float32)
    per = P_total // n_pt_shards
    obs_pt_local = jnp.asarray(obs_pt_g % per, jnp.int32)

    sh = dist_ba.make_shardings(mesh)
    put = lambda x, s: jax.device_put(x, s)
    poses, points = dist_ba.distributed_ba(
        cam, mesh,
        put(poses0, sh["replicated"]), put(opt_mask, sh["replicated"]),
        put(pts0, sh["pt"]),
        put(jnp.asarray(obs_cam, jnp.int32), sh["pt"]),
        put(obs_pt_local, sh["pt"]),
        put(obs_uvr, sh["pt"]), put(obs_w, sh["pt"]), iters=15)

    err_pose = np.asarray(jax.vmap(
        lambda a, b: se3.se3_log(se3.se3_compose(a, se3.se3_inverse(b))))(
        poses, poses_gt))
    assert np.linalg.norm(err_pose, axis=1).max() < 5e-3, err_pose
    err_pts = np.linalg.norm(np.asarray(points - pts_gt), axis=1)
    assert np.median(err_pts) < 2e-2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dist_ba_matches_single_device(rng):
    """Sharded GN step == unsharded math (collectives are exact sums)."""
    mesh = dist_ba.make_mesh(2, 4)
    cam, poses_gt, pts_gt, obs_cam, obs_pt_g, obs_uvr = make_problem(
        rng, noise=0.0)
    C, P_total = poses_gt.shape[0], pts_gt.shape[0]
    opt_mask = jnp.asarray([False] + [True] * (C - 1))
    pts0 = pts_gt + 0.01
    obs_w = jnp.ones(len(obs_cam), jnp.float32)
    per = P_total // 4
    obs_pt_local = jnp.asarray(obs_pt_g % per, jnp.int32)

    sh = dist_ba.make_shardings(mesh)
    step = dist_ba.make_distributed_ba_step(cam, mesh, C)
    p1, x1, _ = step(jax.device_put(poses_gt, sh["replicated"]),
                  jax.device_put(opt_mask, sh["replicated"]),
                  jax.device_put(pts0, sh["pt"]),
                  jax.device_put(jnp.asarray(obs_cam, jnp.int32), sh["pt"]),
                  jax.device_put(obs_pt_local, sh["pt"]),
                  jax.device_put(obs_uvr, sh["pt"]),
                  jax.device_put(obs_w, sh["pt"]),
                  jax.device_put(jnp.asarray(1e-3), sh["replicated"]))

    mesh1 = dist_ba.make_mesh(1, 1, devices=jax.devices()[:1])
    sh1 = dist_ba.make_shardings(mesh1)
    step1 = dist_ba.make_distributed_ba_step(cam, mesh1, C)
    p2, x2, _ = step1(jax.device_put(poses_gt, sh1["replicated"]),
                   jax.device_put(opt_mask, sh1["replicated"]),
                   jax.device_put(pts0, sh1["pt"]),
                   jax.device_put(jnp.asarray(obs_cam, jnp.int32), sh1["pt"]),
                   jax.device_put(jnp.asarray(obs_pt_g, jnp.int32),
                                  sh1["pt"]),
                   jax.device_put(obs_uvr, sh1["pt"]),
                   jax.device_put(obs_w, sh1["pt"]),
                   jax.device_put(jnp.asarray(1e-3), sh1["replicated"]))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)
