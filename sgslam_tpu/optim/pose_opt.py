"""Motion-only bundle adjustment: one camera pose vs fixed 3-D points.

Replaces Optimizer::PoseOptimization (/root/reference/src/sg-slam/src/
Optimizer.cc:239-451): g2o LM with a dense 6x6 solver, 4 rounds x 10
iterations, Huber kernels (delta = sqrt(5.991) mono / sqrt(7.815) stereo),
chi2 outlier gating between rounds, robust kernel dropped from round 3.

Here the whole thing is one jitted fixed-shape Gauss-Newton/LM program:
residuals and analytic SE3 Jacobians are batched over the observation
capacity with a validity mask; outlier gating is a mask update between
rounds. Observations use the (u, v, u_right) pseudo-stereo residual when
u_right >= 0, else the 2-D mono residual — matching the reference's
EdgeStereoSE3ProjectXYZOnlyPose / EdgeSE3ProjectXYZOnlyPose split.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def _residual_jac(cam: Camera, Tcw, pw, obs, inv_sigma2, stereo_mask):
    """Residuals r [N,3], Jacobians J [N,3,6] wrt left-mult twist on Tcw.

    Third residual row is the pseudo-stereo u_right term, zeroed for mono.
    Twist convention (v, w): Tcw' = exp([v, w]) * Tcw.
    """
    pc = se3.se3_apply(Tcw[None], pw)                   # [N,3]
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    invz = 1.0 / z
    u = cam.fx * x * invz + cam.cx
    v = cam.fy * y * invz + cam.cy
    ur = u - cam.bf * invz

    r = jnp.stack([u - obs[..., 0], v - obs[..., 1],
                   jnp.where(stereo_mask, ur - obs[..., 2], 0.0)], axis=-1)

    # d(pc)/d(twist) = [ I | -hat(pc) ]   (left-multiplicative perturbation)
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    dpc = jnp.stack([
        jnp.stack([ones, zeros, zeros, zeros, pc[..., 2], -pc[..., 1]], -1),
        jnp.stack([zeros, ones, zeros, -pc[..., 2], zeros, pc[..., 0]], -1),
        jnp.stack([zeros, zeros, ones, pc[..., 1], -pc[..., 0], zeros], -1),
    ], axis=-2)                                          # [N,3,6]

    fx, fy, bf = cam.fx, cam.fy, cam.bf
    du = jnp.stack([fx * invz, zeros, -fx * x * invz * invz], -1)  # [N,3]
    dv = jnp.stack([zeros, fy * invz, -fy * y * invz * invz], -1)
    dur = du + jnp.stack([zeros, zeros, bf * invz * invz], -1)
    Jproj = jnp.stack([du, dv,
                       jnp.where(stereo_mask[..., None], dur, 0.0)], axis=-2)
    J = jnp.einsum("nij,njk->nik", Jproj, dpc)           # [N,3,6]

    w = inv_sigma2[..., None]
    return r, J, w


def _huber_weight(chi2, delta2):
    """Huber IRLS weight as a function of the chi2 value."""
    return jnp.where(chi2 <= delta2, 1.0,
                     jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("rounds", "iters", "guarded"))
def pose_optimization(cam: Camera, Tcw0, pw, obs, inv_sigma2, valid,
                      *, rounds: int = 4, iters: int = 10,
                      guarded: bool = True):
    """Optimize one pose. Returns (Tcw, inlier_mask, n_inliers).

    pw: [N,3] world points; obs: [N,3] (u, v, u_right<0 for mono);
    inv_sigma2: [N] per-observation information (1/1.2^(2 level));
    valid: [N] bool initial correspondence mask.

    guarded=True evaluates the robust cost at the proposed pose and
    rejects non-improving steps (g2o-LM-like); guarded=False trusts the
    damped GN step — HALF the residual/Jacobian evaluations per
    iteration, for hot paths whose outer logic already gates on the
    inlier count (a diverged pose simply reports few inliers and the
    tracker falls back).
    """
    stereo_mask = obs[..., 2] >= 0
    delta2 = jnp.where(stereo_mask, CHI2_STEREO, CHI2_MONO)

    def chi2_of(Tcw, inlier):
        r, _, _ = _residual_jac(cam, Tcw, pw, obs, inv_sigma2, stereo_mask)
        return jnp.sum(r * r, axis=-1) * inv_sigma2

    def gn_round(round_i, state):
        Tcw, inlier = state
        use_huber = round_i < 2  # reference drops robust kernel at round 3

        def gn_iter(_, Tcw):
            r, J, _ = _residual_jac(cam, Tcw, pw, obs, inv_sigma2,
                                    stereo_mask)
            chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
            hw = jnp.where(use_huber, _huber_weight(chi2, delta2), 1.0)
            wn = inv_sigma2 * hw * inlier.astype(jnp.float32)  # [N]
            H = jnp.einsum("nri,nrj,n->ij", J, J, wn)          # [6,6]
            b = jnp.einsum("nri,nr,n->i", J, r, wn)
            H = H + 1e-5 * jnp.eye(6, dtype=H.dtype)
            dx = jnp.linalg.solve(H, -b)
            Tnew = se3.se3_compose(se3.se3_exp(dx), Tcw)
            if not guarded:
                return Tnew
            # reject steps that don't reduce the masked robust cost
            c_old = jnp.sum(chi2 * hw * inlier)
            r2, _, _ = _residual_jac(cam, Tnew, pw, obs, inv_sigma2,
                                     stereo_mask)
            chi2n = jnp.sum(r2 * r2, axis=-1) * inv_sigma2
            hwn = jnp.where(use_huber, _huber_weight(chi2n, delta2), 1.0)
            c_new = jnp.sum(chi2n * hwn * inlier)
            return jax.lax.cond(c_new < c_old, lambda: Tnew, lambda: Tcw)

        Tcw = jax.lax.fori_loop(0, iters, gn_iter, Tcw)
        chi2 = chi2_of(Tcw, inlier)
        inlier = valid & (chi2 <= delta2)
        return Tcw, inlier

    state = (Tcw0, valid)
    Tcw, inlier = jax.lax.fori_loop(0, rounds, gn_round, state)
    return Tcw, inlier, jnp.sum(inlier.astype(jnp.int32))
