import jax
import jax.numpy as jnp
import numpy as np

from sgslam_tpu import config
from sgslam_tpu.geometry import camera as cam_mod
from sgslam_tpu.geometry import se3
from sgslam_tpu.models import vocab as vocab_mod
from sgslam_tpu.optim import pose_graph, sim3


def rand_desc(rng, n):
    return np.asarray(rng.integers(0, 2 ** 32, size=(n, 8),
                                   dtype=np.uint64).astype(np.uint32))


def test_vocab_train_and_quantize(rng):
    descs = rand_desc(rng, 2000)
    v = vocab_mod.train_vocab(descs, branching=4, depth=3)
    assert v.n_words == 64
    ids = vocab_mod.quantize(v, jnp.asarray(descs[:256]),
                             jnp.ones(256, bool))
    ids = np.asarray(ids)
    assert (ids >= 0).all() and (ids < 64).all()
    assert len(np.unique(ids)) > 8, "words should spread"
    # identical descriptors -> identical words
    ids2 = vocab_mod.quantize(v, jnp.asarray(descs[:256]),
                              jnp.ones(256, bool))
    np.testing.assert_array_equal(ids, np.asarray(ids2))


def test_bow_scores_rank_similar_frames(rng):
    descs = rand_desc(rng, 4000)
    v = vocab_mod.train_vocab(descs, branching=4, depth=3, seed=1)
    frame_a = descs[:300]
    # frame_b = frame_a with some noise: flip a few bits of 30% descriptors
    frame_b = frame_a.copy()
    frame_b[:100] = rand_desc(rng, 100)
    frame_c = rand_desc(rng, 300)

    def bow(d):
        ids = vocab_mod.quantize(v, jnp.asarray(d), jnp.ones(len(d), bool))
        return vocab_mod.bow_vector(v, ids)

    ba, bb, bc = bow(frame_a), bow(frame_b), bow(frame_c)
    db = jnp.stack([bb, bc])
    s = np.asarray(vocab_mod.l1_score(ba, db))
    assert s[0] > s[1] + 0.1, f"similar frame must outscore random: {s}"


def test_horn_alignment_exact(rng):
    src = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    S_gt = se3.sim3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.2, 0.1, -0.3, 0.0]))
    dst = se3.sim3_apply(S_gt[None], src)
    S = sim3.horn_alignment(src, dst, jnp.ones(50), fix_scale=True)
    err = np.asarray(dst - se3.sim3_apply(S[None], src))
    assert np.abs(err).max() < 1e-4


def test_horn_with_scale(rng):
    src = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    S_gt = se3.sim3_exp(jnp.asarray([0.1, 0.0, 0.2, 0.1, -0.2, 0.05, 0.4]))
    dst = se3.sim3_apply(S_gt[None], src)
    S = sim3.horn_alignment(src, dst, jnp.ones(50), fix_scale=False)
    assert abs(float(S[7]) - float(S_gt[7])) < 1e-3
    err = np.asarray(dst - se3.sim3_apply(S[None], src))
    assert np.abs(err).max() < 1e-3


def test_ransac_sim3_with_outliers(rng):
    cam = config.tum3_config().camera
    T12 = se3.se3_exp(jnp.asarray([0.2, -0.1, 0.1, 0.05, 0.1, 0.02]))
    S12 = se3.sim3_from_se3(T12)
    pts2 = jnp.asarray(rng.uniform([-1, -1, 1.5], [1, 1, 4],
                                   size=(128, 3)).astype(np.float32))
    pts1 = se3.sim3_apply(S12[None], pts2)
    uv1 = cam_mod.project(cam, pts1)
    uv2 = cam_mod.project(cam, pts2)
    # corrupt 30 matches
    pts2n = np.array(pts2)
    pts2n[:30] += rng.uniform(0.5, 1.5, size=(30, 3))
    S, inl, n = sim3.ransac_sim3(
        cam, pts1, jnp.asarray(pts2n.astype(np.float32)), uv1, uv2,
        jnp.ones(128, bool), jax.random.PRNGKey(0), iters=64)
    assert int(n) > 80
    err = np.asarray(se3.sim3_log(se3.sim3_compose(S, se3.sim3_inverse(S12))))
    assert np.linalg.norm(err) < 1e-2


def test_pose_graph_closes_loop(rng):
    """Odometry chain with drift + one loop edge -> drift distributed."""
    K = 12
    # ground truth: poses around a circle
    gt = [se3.sim3_identity()]
    step_gt = se3.sim3_exp(jnp.asarray([0.5, 0, 0, 0, 0, 2 * np.pi / K, 0],
                                       jnp.float32))
    for k in range(1, K):
        gt.append(se3.sim3_compose(step_gt, gt[-1]))
    gt = jnp.stack(gt)

    # odometry measurements with bias -> drift
    noise = se3.sim3_exp(jnp.asarray([0.02, 0.01, 0, 0, 0, 0.015, 0],
                                     jnp.float32))
    meas_step = se3.sim3_compose(noise, step_gt)
    poses = [np.asarray(gt[0])]
    for k in range(1, K):
        poses.append(np.asarray(
            se3.sim3_compose(meas_step, jnp.asarray(poses[-1]))))
    poses = jnp.asarray(np.stack(poses))

    # edges: chain with drifty measurements + perfect loop edge 0 -> K-1
    ei = list(range(K - 1)) + [K - 1]
    ej = list(range(1, K)) + [0]
    meas = [np.asarray(se3.sim3_compose(jnp.asarray(poses[a]),
                                        se3.sim3_inverse(jnp.asarray(
                                            poses[b]))))
            for a, b in zip(ei[:-1], ej[:-1])]
    # loop measurement from ground truth (the Sim3 solver's output)
    meas.append(np.asarray(se3.sim3_compose(gt[K - 1],
                                            se3.sim3_inverse(gt[0]))))
    E = len(ei)
    opt = pose_graph.optimize_pose_graph(
        poses, jnp.ones(K, bool),
        jnp.asarray([True] + [False] * (K - 1)),
        jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(meas), jnp.float32),
        jnp.asarray([1.0] * (E - 1) + [5.0], jnp.float32), iters=30)

    def traj_err(ps):
        e = jax.vmap(lambda a, b: se3.sim3_log(
            se3.sim3_compose(a, se3.sim3_inverse(b))))(ps, gt)
        return float(jnp.linalg.norm(e[:, :3], axis=1).max())

    # the LS optimum balances the biased chain edges against the loop edge,
    # so drift shrinks but does not vanish; the loop-edge residual must.
    before = traj_err(poses)
    after = traj_err(opt)
    assert after < 0.7 * before, (before, after)
    from sgslam_tpu.optim.pose_graph import edge_residual

    r_loop = np.asarray(edge_residual(opt[K - 1], opt[0],
                                      jnp.asarray(meas[-1])))
    assert np.linalg.norm(r_loop) < 0.02, r_loop


def test_optimize_sim3_gn_beats_horn(rng):
    """The OptimizeSim3 contract (Optimizer.cc:1046-1243): inlier-gated GN
    with two-way reprojection edges refines a noisy Sim3 beyond what a
    Horn re-fit on the same data achieves, and gates outliers."""
    cam = config.tum3_config().camera
    T12 = se3.se3_exp(jnp.asarray([0.2, -0.1, 0.1, 0.05, 0.1, 0.02]))
    S12_gt = se3.sim3_from_se3(T12)
    pts2 = jnp.asarray(rng.uniform([-1, -1, 1.5], [1, 1, 4],
                                   size=(160, 3)).astype(np.float32))
    pts1_exact = se3.sim3_apply(S12_gt[None], pts2)
    uv1 = cam_mod.project(cam, pts1_exact)
    uv2 = cam_mod.project(cam, pts2)
    # noise on the 3-D points (depth noise), outliers on a fifth of them
    p1n = np.array(pts1_exact) + rng.normal(0, 0.004, (160, 3))
    p1n[:32] += rng.uniform(0.4, 1.0, size=(32, 3))
    p1n = jnp.asarray(p1n.astype(np.float32))
    valid = jnp.ones(160, bool)

    # start from a perturbed initial guess
    S0 = se3.sim3_compose(
        se3.sim3_exp(jnp.asarray([0.05, -0.03, 0.04, 0.02, -0.02, 0.01,
                                  0.0])), S12_gt)
    S_horn = sim3.horn_alignment(pts2, p1n, valid.astype(jnp.float32),
                                 fix_scale=True)
    S_gn, inl, n = sim3.optimize_sim3(cam, S0, p1n, pts2, uv1, uv2, valid,
                                      rounds=3, iters=6, fix_scale=True)
    assert int(n) > 100
    assert not bool(inl[:32].any()), "outliers survived the chi2 gate"
    e_horn = np.linalg.norm(np.asarray(se3.sim3_log(
        se3.sim3_compose(S_horn, se3.sim3_inverse(S12_gt)))))
    e_gn = np.linalg.norm(np.asarray(se3.sim3_log(
        se3.sim3_compose(S_gn, se3.sim3_inverse(S12_gt)))))
    assert e_gn < 0.02, e_gn
    assert e_gn < 0.5 * e_horn, (e_gn, e_horn)


def test_optimize_sim3_recovers_scale(rng):
    """With fix_scale=False the 7th dof converges to the true scale — the
    capability the mono loop-closure path requires (g2o VertexSim3Expmap
    with _fix_scale=false)."""
    cam = config.tum3_config().camera
    S12_gt = se3.sim3_exp(jnp.asarray([0.15, -0.05, 0.1, 0.04, 0.08, 0.02,
                                       0.22]))          # scale e^0.22
    pts2 = jnp.asarray(rng.uniform([-1, -1, 1.5], [1, 1, 4],
                                   size=(120, 3)).astype(np.float32))
    pts1 = se3.sim3_apply(S12_gt[None], pts2)
    uv1 = cam_mod.project(cam, pts1)
    uv2 = cam_mod.project(cam, pts2)
    S0 = se3.sim3_from_se3(se3.sim3_to_se3(S12_gt))     # scale reset to 1
    S, inl, n = sim3.optimize_sim3(cam, S0, pts1, pts2, uv1, uv2,
                                   jnp.ones(120, bool), rounds=2, iters=8,
                                   fix_scale=False)
    assert int(n) > 110
    assert abs(float(S[7]) - float(S12_gt[7])) < 0.01, float(S[7])
