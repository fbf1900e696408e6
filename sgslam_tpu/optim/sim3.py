"""Closed-form Horn absolute orientation + batched RANSAC Sim3 solver.

Replaces Sim3Solver (/root/reference/src/sg-slam/src/Sim3Solver.cc): Horn
1987's quaternion eigen-decomposition (:226-337), optional fixed scale for
RGB-D (:292-311), RANSAC over 3-point minimal sets with reprojection inlier
checks in both directions (:340+). Here every RANSAC hypothesis is a row of
a batched eigh — one vmapped program instead of an iteration loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera, project


def horn_alignment(src, dst, w, fix_scale: bool = True):
    """Weighted closed-form S with dst ~= s R src + t.

    src, dst: [N,3]; w: [N] non-negative weights (0 = ignore).
    Returns Sim3 [8].
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], 0) / wsum
    mu_d = jnp.sum(dst * w[:, None], 0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    M = jnp.einsum("ni,nj,n->ij", xd, xs, w)          # [3,3]

    # Horn's 4x4 N matrix (max-eigenvector = rotation quaternion)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]])
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[:, -1]                                   # max eigenvalue
    # with M = sum xd xs^T, Horn's N yields the src<-dst rotation in our
    # (w, x, y, z) convention — conjugate to get dst = R src
    q = se3.quat_conj(q)
    q = q * jnp.where(q[0] < 0, -1.0, 1.0)
    q = se3.quat_normalize(q)

    if fix_scale:
        s = jnp.ones(())
    else:
        # s = sum(w |xd|) projected: Horn's symmetric scale
        num = jnp.sum(w[:, None] * xd * se3.quat_rotate(q[None], xs))
        den = jnp.sum(w[:, None] * xs * xs)
        s = num / jnp.maximum(den, 1e-9)
    t = mu_d - s * se3.quat_rotate(q, mu_s)
    return jnp.concatenate([q, t, s[None]])


@partial(jax.jit, static_argnums=(0,), static_argnames=("iters", "fix_scale"))
def ransac_sim3(cam: Camera, pts1, pts2, uv1, uv2, valid, key, *,
                iters: int = 128, fix_scale: bool = True,
                chi2: float = 9.21):
    """RANSAC Sim3: S maps frame-2 coords into frame-1 coords.

    pts1/pts2: [N,3] camera-frame 3-D of matched features in KF1/KF2;
    uv1/uv2: [N,2] pixel coords for the two-way reprojection inlier test
    (Sim3Solver::CheckInliers semantics, chi2 at 9.21 ~ 1% two-dof).
    Returns (S12 [8], inlier_mask [N], n_inliers).
    """
    n = pts1.shape[0]
    order = jnp.argsort(~valid)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    r = jax.random.randint(key, (iters, 3), 0, jnp.maximum(n_valid, 3))
    samples = order[r]                                 # [iters, 3]

    def one(s):
        w = jnp.zeros(n).at[s].set(1.0)
        return horn_alignment(pts2, pts1, w, fix_scale)  # S12: 2 -> 1

    Ss = jax.vmap(one)(samples)                        # [iters, 8]

    def inliers_of(S12):
        p2_in_1 = se3.sim3_apply(S12[None], pts2)
        e1 = jnp.sum((project(cam, p2_in_1) - uv1) ** 2, -1)
        S21 = se3.sim3_inverse(S12)
        p1_in_2 = se3.sim3_apply(S21[None], pts1)
        e2 = jnp.sum((project(cam, p1_in_2) - uv2) ** 2, -1)
        return (e1 < chi2) & (e2 < chi2) & valid

    inl = jax.vmap(inliers_of)(Ss)                     # [iters, N]
    counts = jnp.sum(inl.astype(jnp.int32), 1)
    best = jnp.argmax(counts)
    # refine on the best inlier set
    S = horn_alignment(pts2, pts1, inl[best].astype(jnp.float32), fix_scale)
    inl_f = inliers_of(S)
    return S, inl_f, jnp.sum(inl_f.astype(jnp.int32))
