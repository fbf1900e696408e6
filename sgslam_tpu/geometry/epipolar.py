"""Epipolar geometry: fundamental matrices, batched 8-point RANSAC.

Replaces cv::findFundamentalMat(RANSAC) on the dynamic-rejection path
(/root/reference/src/sg-slam/src/Frame.cc:469-472) and the pose-derived F12
of LocalMapping::ComputeF12 (src/LocalMapping.cc:536-553). RANSAC is the
fixed-iteration batched hypothesize-and-verify required by XLA (SURVEY.md §7
hard-part #4): all hypotheses evaluated in parallel via vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import se3
from .camera import Camera, intrinsic_matrix


def fundamental_from_poses(cam: Camera, T1w, T2w):
    """F12 such that x2^T F12 x1 = 0 for pixel coords, from Tcw poses.

    Contract of LocalMapping::ComputeF12.
    """
    T12 = se3.se3_compose(T1w, se3.se3_inverse(T2w))  # cam2 -> cam1
    R = se3.quat_to_mat(T12[:4])
    t = T12[4:7]
    E = se3.hat(t) @ R
    K = intrinsic_matrix(cam)
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


def epipolar_distance(F, p1, p2):
    """Distance of p2 [N,2] from the epipolar line of p1 [N,2] under F.

    Matches Frame::CheckEpiLineDistToRmDynamicPoint (Frame.cc:613-627):
    dist = |a u2 + b v2 + c| / sqrt(a^2 + b^2).
    """
    ones = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, ones], -1)
    line = x1 @ F.T                                  # [N,3] (a,b,c)
    num = jnp.abs(jnp.sum(line[..., :2] * p2, -1) + line[..., 2])
    den = jnp.sqrt(jnp.sum(line[..., :2] ** 2, -1))
    return num / jnp.maximum(den, 1e-9)


def _normalize(pts):
    mu = pts.mean(0)
    d = jnp.mean(jnp.linalg.norm(pts - mu, axis=-1))
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    T = jnp.array([[s, 0, -s * mu[0]], [0, s, -s * mu[1]], [0, 0, 1.0]])
    ones = jnp.ones_like(pts[..., :1])
    ph = jnp.concatenate([pts, ones], -1) @ T.T
    return ph[..., :2], T


def _smallest_eigvec3(B):
    """Analytic unit eigenvector for the smallest eigenvalue of a
    symmetric 3x3 matrix (trigonometric eigenvalue formula + row-cross
    nullspace) — closed form, so it vmaps into pure elementwise code
    instead of an iterative eigensolver."""
    q = jnp.trace(B) / 3.0
    Bq = B - q * jnp.eye(3, dtype=B.dtype)
    p2 = jnp.sum(Bq * Bq) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    r = jnp.clip(jnp.linalg.det(Bq / p) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    C = B - lam_min * jnp.eye(3, dtype=B.dtype)
    # the two independent rows of C span the orthogonal complement of the
    # eigenvector; every pairwise row cross product lies along it
    c01 = jnp.cross(C[0], C[1])
    c02 = jnp.cross(C[0], C[2])
    c12 = jnp.cross(C[1], C[2])
    cands = jnp.stack([c01, c02, c12])
    norms = jnp.linalg.norm(cands, axis=-1)
    v = cands[jnp.argmax(norms)]
    # (near-)spherical B: any unit vector is an eigenvector
    v = jnp.where(jnp.max(norms) > 1e-20, v, jnp.array([0.0, 0.0, 1.0]))
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-20)


def eight_point(p1, p2):
    """Normalized 8-point fundamental estimate from [8,2]+[8,2] points.

    SVD-free formulation for TPU: the nullspace of A comes from inverse
    iteration on A^T A (one Cholesky factorization + three triangular
    solves — batched-friendly dense ops), and the rank-2 projection is
    F - (F v3) v3^T with v3 the analytic smallest eigenvector of F^T F
    (equivalent to zeroing the smallest singular value, since
    F v3 = s3 u3). Iterative SVD is both slow to run and pathologically
    slow to compile on this backend.
    """
    n1, T1 = _normalize(p1)
    n2, T2 = _normalize(p2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=-1)       # [8,9]
    M = A.T @ A                                        # [9,9] PSD, rank <= 8
    eps = 1e-9 * jnp.trace(M) + 1e-12
    chol = jax.scipy.linalg.cho_factor(
        M + eps * jnp.eye(9, dtype=M.dtype))
    # Inverse iteration from TWO deterministic starts (uniform + an
    # alternating-sign vector): a single fixed start can be (near-)
    # orthogonal to the true null vector for degenerate point
    # configurations, and 3 iterations would then converge to the wrong
    # eigenvector. The candidate with the smaller Rayleigh quotient wins,
    # followed by one polish iteration.
    X = jnp.stack(
        [jnp.full((9,), 1.0 / 3.0, M.dtype),
         jnp.array([1, -1, 1, -1, 1, -1, 1, -1, 1], M.dtype) / 3.0],
        axis=1)                                        # [9,2]
    for _ in range(3):                                 # inverse iteration
        X = jax.scipy.linalg.cho_solve(chol, X)
        X = X / jnp.maximum(jnp.linalg.norm(X, axis=0, keepdims=True),
                            1e-30)
    ray = jnp.einsum("ik,ij,jk->k", X, M, X)           # [2]
    x = X[:, jnp.argmin(ray)]
    x = jax.scipy.linalg.cho_solve(chol, x)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-30)
    F = x.reshape(3, 3)
    # rank-2 enforcement: closest rank-2 matrix in Frobenius norm
    v3 = _smallest_eigvec3(F.T @ F)
    F = F - jnp.outer(F @ v3, v3)
    return T2.T @ F @ T1


@partial(jax.jit, static_argnames=("iters",))
def ransac_fundamental(p1, p2, valid, key, *, iters: int = 256,
                       thresh: float = 1.0):
    """Batched RANSAC: `iters` 8-point hypotheses evaluated in parallel.

    p1, p2: [N,2] correspondences; valid: [N] bool.
    Returns (F [3,3], inlier_mask [N], n_inliers).
    """
    n = p1.shape[0]
    # sample only from valid correspondences: bias sampling by shuffling
    # valid indices to the front
    order = jnp.argsort(~valid)                      # valid first, stable
    n_valid = jnp.sum(valid.astype(jnp.int32))
    r = jax.random.randint(key, (iters, 8), 0, jnp.maximum(n_valid, 8))
    samples = order[r]                                # [iters,8]

    Fs = jax.vmap(lambda s: eight_point(p1[s], p2[s]))(samples)
    d = jax.vmap(lambda F: epipolar_distance(F, p1, p2))(Fs)  # [iters,N]
    inl = (d < thresh) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    return Fs[best], inl[best], counts[best]
