import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.geometry import camera as cam_mod
from sgslam_tpu.geometry import se3
from sgslam_tpu.matching import hamming, search
from sgslam_tpu.optim import pose_opt


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint64)
                       .astype(np.uint32))


def flip_bits(rng, desc, nbits):
    d = np.asarray(desc).copy()
    for i in range(len(d)):
        for _ in range(nbits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            d[i, w] ^= np.uint32(1) << np.uint32(b)
    return jnp.asarray(d)


def test_hamming_matrix_vs_numpy(rng):
    a = rand_desc(rng, 32)
    b = rand_desc(rng, 48)
    d = np.asarray(hamming.hamming_matrix(a, b))
    an = np.unpackbits(np.ascontiguousarray(np.asarray(a)).view(np.uint8), axis=1)
    bn = np.unpackbits(np.ascontiguousarray(np.asarray(b)).view(np.uint8), axis=1)
    ref = (an[:, None, :] != bn[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d, ref)


def test_match_by_descriptor_recovers_permutation(rng):
    n = 128
    a = rand_desc(rng, n)
    perm = rng.permutation(n)
    b = flip_bits(rng, np.asarray(a)[perm], 5)  # noisy copies, permuted
    cfg = config.MatcherConfig()
    valid = jnp.ones(n, bool)
    idx, ok, dist = search.match_by_descriptor(a, valid, b, valid, cfg)
    ok = np.asarray(ok)
    assert ok.mean() > 0.95
    inv = np.empty(n, int)
    inv[perm] = np.arange(n)
    np.testing.assert_array_equal(np.asarray(idx)[ok], inv[ok])


def test_match_respects_validity(rng):
    n = 16
    a = rand_desc(rng, n)
    cfg = config.MatcherConfig()
    valid_q = jnp.ones(n, bool)
    valid_t = jnp.zeros(n, bool)
    _, ok, _ = search.match_by_descriptor(a, valid_q, a, valid_t, cfg)
    assert not bool(ok.any())


def test_search_by_projection_window(rng):
    """Candidates outside the spatial window must not match."""
    n = 64
    desc = rand_desc(rng, n)
    xy = jnp.asarray(rng.uniform(0, 500, size=(n, 2)).astype(np.float32))
    lv = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, bool)
    # queries = same entities, projected 3px away
    proj = xy + 3.0
    idx, ok, dist = search.search_by_projection(
        proj, jnp.full(n, 8.0), lv, desc, valid,
        xy, lv, desc, valid, level_window=1, max_dist=50, scale_factor=1.2)
    assert np.asarray(ok).mean() > 0.95
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(ok)],
                                  np.arange(n)[np.asarray(ok)])
    # shrink radius below the offset -> no matches
    _, ok2, _ = search.search_by_projection(
        proj, jnp.full(n, 1.0), lv, desc, valid,
        xy, lv, desc, valid, level_window=1, max_dist=50, scale_factor=1.2)
    assert not bool(ok2.any())


def test_rotation_consistency(rng):
    n = 200
    ok = jnp.ones(n, bool)
    dtheta = np.full(n, 0.1, np.float32)
    outliers = rng.choice(n, 20, replace=False)
    dtheta[outliers] = rng.uniform(1.0, 5.0, size=20)
    keep = np.asarray(search.rotation_consistency(jnp.asarray(dtheta), ok))
    inl = np.ones(n, bool)
    inl[outliers] = False
    assert keep[inl].all()
    assert keep[outliers].sum() <= 4  # a few may straddle kept bins


def test_resolve_duplicate_targets():
    idx = jnp.asarray([5, 5, 7, 2, 5], jnp.int32)
    ok = jnp.asarray([True, True, True, False, True])
    dist = jnp.asarray([30, 10, 20, 5, 10], jnp.int32)
    keep = np.asarray(search.resolve_duplicate_targets(idx, ok, dist, 10))
    # target 5 claimed by queries 0,1,4 -> query 1 wins (dist 10, first)
    np.testing.assert_array_equal(keep, [False, True, True, False, False])


def _make_pnp_problem(rng, n=200, noise=0.0, outlier_frac=0.0):
    cam = config.tum3_config().camera
    pw = rng.uniform([-2, -2, 1.0], [2, 2, 6.0], size=(n, 3)).astype(np.float32)
    T_gt = se3.se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.04, -0.03, 0.02],
                                   jnp.float32))
    pc = se3.se3_apply(T_gt[None], jnp.asarray(pw))
    uvr = cam_mod.project_stereo(cam, pc)
    obs = np.array(uvr)  # writable copy
    if noise > 0:
        obs[:, :2] += rng.normal(scale=noise, size=(n, 2))
        obs[:, 2] += rng.normal(scale=noise, size=n)
    n_out = int(outlier_frac * n)
    if n_out:
        obs[:n_out, :2] += rng.uniform(30, 80, size=(n_out, 2))
    return cam, jnp.asarray(pw), T_gt, jnp.asarray(obs.astype(np.float32))


def test_pose_optimization_converges(rng):
    cam, pw, T_gt, obs = _make_pnp_problem(rng, noise=0.3)
    T0 = se3.se3_identity()
    inv_s2 = jnp.ones(pw.shape[0])
    valid = jnp.ones(pw.shape[0], bool)
    T, inliers, n = pose_opt.pose_optimization(cam, T0, pw, obs, inv_s2, valid)
    err = np.asarray(se3.se3_log(se3.se3_compose(T, se3.se3_inverse(T_gt))))
    assert np.linalg.norm(err) < 0.01, f"pose error {err}"
    assert int(n) > 150


def test_pose_optimization_rejects_outliers(rng):
    cam, pw, T_gt, obs = _make_pnp_problem(rng, noise=0.3, outlier_frac=0.2)
    T0 = se3.se3_identity()
    inv_s2 = jnp.ones(pw.shape[0])
    valid = jnp.ones(pw.shape[0], bool)
    T, inliers, n = pose_opt.pose_optimization(cam, T0, pw, obs, inv_s2, valid)
    err = np.asarray(se3.se3_log(se3.se3_compose(T, se3.se3_inverse(T_gt))))
    assert np.linalg.norm(err) < 0.02, f"pose error {np.linalg.norm(err)}"
    inl = np.asarray(inliers)
    assert inl[:40].sum() < 5, "outliers should be gated out"
    assert inl[40:].mean() > 0.9


def test_pose_optimization_mono_only(rng):
    cam, pw, T_gt, obs = _make_pnp_problem(rng, noise=0.2)
    obs = obs.at[:, 2].set(-1.0)  # all mono
    T0 = se3.se3_identity()
    T, _, n = pose_opt.pose_optimization(
        cam, T0, pw, obs, jnp.ones(pw.shape[0]), jnp.ones(pw.shape[0], bool))
    err = np.asarray(se3.se3_log(se3.se3_compose(T, se3.se3_inverse(T_gt))))
    assert np.linalg.norm(err) < 0.01
