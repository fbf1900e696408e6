"""Batched RANSAC PnP for relocalization.

Replaces PnPsolver (/root/reference/src/sg-slam/src/PnPsolver.cc): EPnP
control points + beta Gauss-Newton inside a sequential RANSAC loop
(include/PnPsolver.h:70-126). TPU-first redesign: the minimal solver is a
6-point DLT (linear P-matrix estimate + rotation orthogonalization) — less
minimal than EPnP's 4 points but branch-free and trivially batched, so all
`iters` hypotheses run as one vmapped SVD batch; accuracy is recovered by
the Huber-robust pose optimization that always follows (Tracking.cc:
1540-1560 does the same refine after EPnP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera, project


def dlt_pose(pw, uv, cam: Camera):
    """Linear 6+ point pose: pw [M,3] world, uv [M,2] pixels -> Tcw [7]."""
    # normalized camera coords
    x = (uv[:, 0] - cam.cx) / cam.fx
    y = (uv[:, 1] - cam.cy) / cam.fy
    M = pw.shape[0]
    zeros = jnp.zeros((M, 4))
    Xh = jnp.concatenate([pw, jnp.ones((M, 1))], axis=1)  # [M,4]
    # rows: [X 0 -x*X ; 0 X -y*X]
    r1 = jnp.concatenate([Xh, zeros, -x[:, None] * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -y[:, None] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)                 # [2M,12]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1].reshape(3, 4)
    R_raw = P[:, :3]
    # cheirality + scale: make det positive and unit-ish
    U, S, Vt2 = jnp.linalg.svd(R_raw)
    d = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    R = U @ D.at[2, 2].set(d) @ Vt2
    scale = jnp.sum(S) / 3.0 * jnp.sign(d)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-9, 1e-9, scale)
    # fix sign so points land in front of the camera
    zmean = jnp.mean((pw @ R.T + t)[:, 2])
    flip = zmean < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # re-orthogonalize after potential flip
    q = se3.mat_to_quat(R)
    return se3.se3_make(q, t)


@partial(jax.jit, static_argnums=(0,), static_argnames=("iters",))
def ransac_pnp(cam: Camera, pw, uv, valid, key, *, iters: int = 256,
               thresh_px: float = 3.0):
    """Batched hypothesize-and-verify PnP.

    pw [N,3] world points, uv [N,2] observed pixels, valid [N].
    Returns (Tcw [7], inlier_mask [N], n_inliers).
    """
    n = pw.shape[0]
    order = jnp.argsort(~valid)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    r = jax.random.randint(key, (iters, 6), 0, jnp.maximum(n_valid, 6))
    samples = order[r]

    Ts = jax.vmap(lambda s: dlt_pose(pw[s], uv[s], cam))(samples)

    def inliers_of(T):
        pc = se3.se3_apply(T[None], pw)
        err = jnp.sum((project(cam, pc) - uv) ** 2, axis=-1)
        return (err < thresh_px ** 2) & (pc[:, 2] > 0.05) & valid

    inl = jax.vmap(inliers_of)(Ts)
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    # refit on best inliers (weighted DLT over all, weight = inlier)
    T0 = Ts[best]
    # final polish: a few GN steps on the inlier set
    from .pose_opt import pose_optimization

    obs = jnp.concatenate([uv, -jnp.ones((n, 1))], axis=1)  # mono residuals
    T, inl_mask, n_in = pose_optimization(
        cam, T0, pw, obs, jnp.ones(n), inl[best], rounds=2, iters=8)
    return T, inl_mask, n_in
