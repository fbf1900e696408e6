"""Monocular two-view initialization: parallel homography + fundamental
RANSAC, model selection, motion recovery, triangulation.

Replaces Initializer (/root/reference/src/sg-slam/src/Initializer.cc, 931
LoC): the reference launches two CPU threads computing H and F RANSAC in
parallel (:74-86), scores both models (:459-580), selects by the ratio
RH = SH/(SH+SF) > 0.40 (:88-95), then recovers R|t — from F via the
essential matrix's four-fold decomposition (:583-756), from H via Faugeras
decomposition — and triangulates with cheirality/parallax checks.

TPU-first form: both model families are batched hypothesize-and-verify
(all RANSAC hypotheses as one vmapped solve + one masked scoring matrix —
no loops), selection and decomposition are closed-form branchless, and
triangulation is the same batched midpoint solver the mapper uses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

# reference score thresholds (Initializer.cc:478, 543)
TH_F = 3.841
TH_H = 5.991
TH_SCORE = 5.991


def _normalize_pts(p):
    """Hartley normalization (Initializer.cc:758-804)."""
    mu = jnp.mean(p, axis=0)
    d = jnp.mean(jnp.abs(p - mu), axis=0)
    s = 1.0 / jnp.maximum(d, 1e-8)
    T = jnp.array([[s[0], 0.0, -mu[0] * s[0]],
                   [0.0, s[1], -mu[1] * s[1]],
                   [0.0, 0.0, 1.0]])
    pn = (p - mu) * s
    return pn, T


def _dlt_fundamental(p1, p2):
    """8-point algorithm on [8,2]+[8,2] -> F [3,3] (rank-2 enforced)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=-1)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    return (U * jnp.array([S[0], S[1], 0.0])) @ Vt2


def _dlt_homography(p1, p2):
    """4-point DLT on [4,2]+[4,2] -> H [3,3]."""
    def rows(a, b):
        x, y = a
        u, v = b
        return jnp.array([
            [0.0, 0.0, 0.0, -x, -y, -1.0, v * x, v * y, v],
            [x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y, -u]])

    A = jnp.concatenate([rows((p1[i, 0], p1[i, 1]), (p2[i, 0], p2[i, 1]))
                         for i in range(4)], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _sym_transfer_err_H(H, p1, p2):
    """Symmetric transfer errors for H (Initializer.cc:459-533)."""
    def transfer(M, a):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], -1)
        b = ah @ M.T
        return b[:, :2] / jnp.maximum(jnp.abs(b[:, 2:3]), 1e-9) * jnp.sign(
            b[:, 2:3] + 1e-30)

    e12 = jnp.sum((transfer(H, p1) - p2) ** 2, -1)
    e21 = jnp.sum((transfer(jnp.linalg.inv(H), p2) - p1) ** 2, -1)
    return e12, e21


def _epi_err_F(F, p1, p2):
    """Squared epipolar distances both directions (Initializer.cc:535-580)."""
    oh = jnp.ones((p1.shape[0], 1))
    p1h = jnp.concatenate([p1, oh], -1)
    p2h = jnp.concatenate([p2, oh], -1)
    l2 = p1h @ F.T                       # line in image 2
    l1 = p2h @ F                         # line in image 1
    d2 = (jnp.sum(p2h * l2, -1) ** 2
          / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12))
    d1 = (jnp.sum(p1h * l1, -1) ** 2
          / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12))
    return d1, d2


def _score(e1, e2, th_model, valid):
    """ORB-SLAM2 truncated score (higher = better) + inlier mask."""
    in1 = (e1 < th_model) & valid
    in2 = (e2 < th_model) & valid
    s = (jnp.where(in1, TH_SCORE - e1, 0.0)
         + jnp.where(in2, TH_SCORE - e2, 0.0))
    return jnp.sum(s), in1 & in2


def _triangulate_midpoint(cam: Camera, T21, p1, p2):
    """Batched midpoint triangulation in camera-1 coordinates."""
    def ray(uv):
        return jnp.stack([(uv[:, 0] - cam.cx) / cam.fx,
                          (uv[:, 1] - cam.cy) / cam.fy,
                          jnp.ones_like(uv[:, 0])], -1)

    r1 = ray(p1)
    T12 = se3.se3_inverse(T21)
    r2 = se3.quat_rotate(T12[None, :4], ray(p2))
    o2 = T12[4:7]
    w = jnp.sum(r1 * r2, -1)
    d11 = jnp.sum(r1 * r1, -1)
    d22 = jnp.sum(r2 * r2, -1)
    dd = -o2[None]
    den = jnp.maximum(d11 * d22 - w * w, 1e-12)
    s1 = (w * jnp.sum(r2 * dd, -1) - d22 * jnp.sum(r1 * dd, -1)) / den
    s2 = (d11 * jnp.sum(r2 * dd, -1) - w * jnp.sum(r1 * dd, -1)) / den
    pw = 0.5 * (s1[:, None] * r1 + (o2[None] + s2[:, None] * r2))
    cosp = w / jnp.sqrt(jnp.maximum(d11 * d22, 1e-12))
    return pw, cosp


def _check_rt(cam: Camera, R, t, p1, p2, inlier):
    """Cheirality + reprojection support of one (R, t) candidate
    (Initializer.cc:806-900 CheckRT)."""
    q = se3.quat_normalize(se3.mat_to_quat(R))
    T21 = se3.se3_make(q, t)
    pw, cosp = _triangulate_midpoint(cam, T21, p1, p2)
    pc2 = se3.se3_apply(T21[None], pw)
    z1_ok = pw[:, 2] > 0.0
    z2_ok = pc2[:, 2] > 0.0
    u1 = cam.fx * pw[:, 0] / jnp.maximum(pw[:, 2], 1e-9) + cam.cx
    v1 = cam.fy * pw[:, 1] / jnp.maximum(pw[:, 2], 1e-9) + cam.cy
    u2 = cam.fx * pc2[:, 0] / jnp.maximum(pc2[:, 2], 1e-9) + cam.cx
    v2 = cam.fy * pc2[:, 1] / jnp.maximum(pc2[:, 2], 1e-9) + cam.cy
    e1 = (u1 - p1[:, 0]) ** 2 + (v1 - p1[:, 1]) ** 2
    e2 = (u2 - p2[:, 0]) ** 2 + (v2 - p2[:, 1]) ** 2
    good = (inlier & z1_ok & z2_ok & (e1 < 4.0) & (e2 < 4.0)
            & (cosp < 0.99998))
    return jnp.sum(good.astype(jnp.int32)), T21, pw, good


@partial(jax.jit, static_argnums=(0,), static_argnames=("iters",))
def initialize_mono(cam: Camera, p1, p2, valid, key, *, iters: int = 200):
    """Two-view monocular initialization.

    p1/p2: [N,2] matched pixel coords in frames 1/2; valid: [N] bool.
    Returns dict with:
      ok        scalar bool — initialization accepted
      used_H    scalar bool — homography model won the RH ratio test
      T21       [7] frame-1 -> frame-2 pose (unit-norm translation)
      points    [N,3] triangulated points in frame-1 coords
      good      [N] bool — triangulated-inlier mask
      rh        scalar — the SH/(SH+SF) model-selection ratio
    """
    n = p1.shape[0]
    order = jnp.argsort(~valid)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 8)
    kf, kh = jax.random.split(key)

    # ---- batched F hypotheses (8-point) ----
    rf = jax.random.randint(kf, (iters, 8), 0, n_valid)
    sf = order[rf]

    p1n, T1 = _normalize_pts(p1)
    p2n, T2 = _normalize_pts(p2)

    def one_f(idx):
        Fn = _dlt_fundamental(p1n[idx], p2n[idx])
        return T2.T @ Fn @ T1

    Fs = jax.vmap(one_f)(sf)
    scores_F = jax.vmap(
        lambda F: _score(*_epi_err_F(F, p1, p2), TH_F, valid)[0])(Fs)
    best_F = Fs[jnp.argmax(scores_F)]
    SF, inl_F = _score(*_epi_err_F(best_F, p1, p2), TH_F, valid)

    # ---- batched H hypotheses (4-point) ----
    rh = jax.random.randint(kh, (iters, 4), 0, n_valid)
    sh = order[rh]

    def one_h(idx):
        Hn = _dlt_homography(p1n[idx], p2n[idx])
        return jnp.linalg.inv(T2) @ Hn @ T1

    Hs = jax.vmap(one_h)(sh)
    scores_H = jax.vmap(
        lambda H: _score(*_sym_transfer_err_H(H, p1, p2), TH_H, valid)[0])(
        Hs)
    best_H = Hs[jnp.argmax(scores_H)]
    SH, inl_H = _score(*_sym_transfer_err_H(best_H, p1, p2), TH_H, valid)

    # model selection (Initializer.cc:88-95)
    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_H = RH > 0.40

    # ---- motion recovery ----
    K = jnp.array([[cam.fx, 0.0, cam.cx],
                   [0.0, cam.fy, cam.cy],
                   [0.0, 0.0, 1.0]])
    Kinv = jnp.linalg.inv(K)

    # from F: essential decomposition, 4 candidates (ReconstructF)
    E = K.T @ best_F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # force proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-9)
    f_cands = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]

    # from H: Faugeras would give 8 candidates; the dominant-plane case in
    # practice reduces to the same cheirality vote over the four (R, t)
    # pairs of the rank-3 decomposition via the induced essential matrix
    # E_H = [t]x R recovered from H (good approximation when parallax is
    # low — which is exactly when H wins)
    Hn = Kinv @ best_H @ K
    UH, SHs, VtH = jnp.linalg.svd(Hn)
    # normalize scale so middle singular value = 1
    Hn = Hn / jnp.maximum(SHs[1], 1e-9)
    RA = Hn  # low-parallax: H ~ R (+ t n^T / d with small t)
    # orthogonalize RA
    Ur, _, Vtr = jnp.linalg.svd(RA)
    R_H = Ur @ Vtr
    R_H = R_H * jnp.sign(jnp.linalg.det(R_H))
    t_H = (Hn - R_H) @ jnp.array([0.0, 0.0, 1.0])
    t_H_n = t_H / jnp.maximum(jnp.linalg.norm(t_H), 1e-9)
    h_cands = [(R_H, t_H_n), (R_H, -t_H_n), (R1, tu), (R2, tu)]

    inlier = jnp.where(use_H, inl_H, inl_F)

    def vote(cands):
        outs = [_check_rt(cam, R, t, p1, p2, inlier) for R, t in cands]
        counts = jnp.stack([o[0] for o in outs])
        Ts = jnp.stack([o[1] for o in outs])
        pws = jnp.stack([o[2] for o in outs])
        goods = jnp.stack([o[3] for o in outs])
        b = jnp.argmax(counts)
        # acceptance (ReconstructF :700-755): clear winner with enough
        # support
        n_best = counts[b]
        second = jnp.sort(counts)[-2]
        ok = (n_best.astype(jnp.float32)
              > 0.9 * jnp.sum(inlier.astype(jnp.int32)).astype(jnp.float32)
              * 0.5) & (n_best > 30) & (second < 0.75 * n_best)
        return ok, Ts[b], pws[b], goods[b]

    okF, TF, pwF, goodF = vote(f_cands)
    okH, TH, pwH, goodH = vote(h_cands)

    ok = jnp.where(use_H, okH, okF)
    T21 = jnp.where(use_H, TH, TF)
    points = jnp.where(use_H, pwH, pwF)
    good = jnp.where(use_H, goodH, goodF)
    return dict(ok=ok, used_H=use_H, T21=T21, points=points, good=good,
                rh=RH)
