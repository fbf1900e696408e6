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


def eight_point(p1, p2):
    """Normalized 8-point fundamental estimate from [8,2]+[8,2] points."""
    n1, T1 = _normalize(p1)
    n2, T2 = _normalize(p2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=-1)       # [8,9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    # enforce rank 2
    U, S, Vt2 = jnp.linalg.svd(F)
    F = (U * S.at[2].set(0.0)[None, :]) @ Vt2
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
