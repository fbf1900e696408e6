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


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("rounds", "iters", "fix_scale"))
def optimize_sim3(cam: Camera, S12_0, pts1, pts2, uv1, uv2, valid, *,
                  rounds: int = 2, iters: int = 5, fix_scale: bool = True,
                  chi2: float = 9.21):
    """Inlier-gated Gauss-Newton refinement of a Sim3 — the contract of
    Optimizer::OptimizeSim3 (/root/reference/src/sg-slam/src/
    Optimizer.cc:1046-1243): reprojection edges in BOTH directions
    (frame-2 points into image 1 through S12, frame-1 points into image 2
    through S12^-1), Huber robust, chi2 outlier gating between rounds, and
    the scale optimized when `fix_scale` is False (the 7th dof g2o's
    VertexSim3Expmap carries; mono loop closures need it).

    Left-multiplicative sim3 twist (v, w, sigma): S' = exp(delta) * S12.
    Returns (S12 [8], inlier_mask [N], n_inliers).
    """
    fx, fy = cam.fx, cam.fy
    dof = 6 if fix_scale else 7

    def residuals(S12):
        """Stacked two-way residuals [N,4] + their twist Jacobians
        [N,4,7] (columns: v, w, sigma)."""
        # direction 1: q = S12 p2, r1 = proj(q) - uv1
        q = se3.sim3_apply(S12[None], pts2)
        z1 = jnp.maximum(q[:, 2], 1e-6)
        r1 = project(cam, q) - uv1
        # d proj / d q
        Jp1 = jnp.stack([
            jnp.stack([fx / z1, jnp.zeros_like(z1),
                       -fx * q[:, 0] / z1 ** 2], -1),
            jnp.stack([jnp.zeros_like(z1), fy / z1,
                       -fy * q[:, 1] / z1 ** 2], -1)], -2)   # [N,2,3]
        # d q / d delta = [ I | -hat(q) | q ]
        Jq = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3), (q.shape[0], 3, 3)),
            -se3.hat(q), q[:, :, None]], axis=2)             # [N,3,7]
        J1 = jnp.einsum("nij,njk->nik", Jp1, Jq)             # [N,2,7]

        # direction 2: p = S12^-1 q1, r2 = proj(p) - uv2;
        # S'^-1 = S12^-1 exp(-delta) => dp/ddelta =
        #   -(1/s) R^T [ I | -hat(q1) | q1 ]
        S21 = se3.sim3_inverse(S12)
        p = se3.sim3_apply(S21[None], pts1)
        z2 = jnp.maximum(p[:, 2], 1e-6)
        r2 = project(cam, p) - uv2
        Jp2 = jnp.stack([
            jnp.stack([fx / z2, jnp.zeros_like(z2),
                       -fx * p[:, 0] / z2 ** 2], -1),
            jnp.stack([jnp.zeros_like(z2), fy / z2,
                       -fy * p[:, 1] / z2 ** 2], -1)], -2)
        Ju = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3), (pts1.shape[0], 3, 3)),
            -se3.hat(pts1), pts1[:, :, None]], axis=2)       # [N,3,7]
        Rt = se3.quat_to_mat(se3.quat_conj(S12[:4]))
        inv_s = 1.0 / jnp.maximum(S12[7], 1e-9)
        Jq2 = -inv_s * jnp.einsum("ij,njk->nik", Rt, Ju)
        J2 = jnp.einsum("nij,njk->nik", Jp2, Jq2)            # [N,2,7]

        r = jnp.concatenate([r1, r2], axis=1)                # [N,4]
        J = jnp.concatenate([J1, J2], axis=1)                # [N,4,7]
        return r, J

    def chi2_both(S12):
        q = se3.sim3_apply(S12[None], pts2)
        e1 = jnp.sum((project(cam, q) - uv1) ** 2, -1)
        p = se3.sim3_apply(se3.sim3_inverse(S12)[None], pts1)
        e2 = jnp.sum((project(cam, p) - uv2) ** 2, -1)
        return e1, e2

    def gn_round(_, state):
        S12, inlier = state

        def gn_iter(_, S12):
            r, J = residuals(S12)
            e = jnp.sum(r * r, axis=-1)
            hw = jnp.where(e <= chi2, 1.0,
                           jnp.sqrt(chi2 / jnp.maximum(e, 1e-12)))
            w = hw * inlier.astype(jnp.float32)
            H = jnp.einsum("nri,nrj,n->ij", J, J, w)
            b = jnp.einsum("nri,nr,n->i", J, r, w)
            if fix_scale:
                # freeze the sigma column (6-dof update)
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                b = b.at[6].set(0.0)
            H = H + 1e-5 * jnp.eye(7)
            delta = jnp.linalg.solve(H, -b)
            return se3.sim3_compose(se3.sim3_exp(delta), S12)

        S12 = jax.lax.fori_loop(0, iters, gn_iter, S12)
        e1, e2 = chi2_both(S12)
        inlier = valid & (e1 < chi2) & (e2 < chi2)
        return S12, inlier

    S12, inlier = jax.lax.fori_loop(0, rounds, gn_round, (S12_0, valid))
    return S12, inlier, jnp.sum(inlier.astype(jnp.int32))


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
