"""Windowed bundle adjustment with batched Schur-complement reduction.

Replaces Optimizer::LocalBundleAdjustment (/root/reference/src/sg-slam/src/
Optimizer.cc:453-778), which uses g2o's sparse LM with marginalized point
blocks (BlockSolver_6_3 + `setMarginalized(true)`), and — with window = whole
map — Optimizer::GlobalBundleAdjustemnt (:41-237).

TPU-first formulation: the observation graph is flattened to fixed-capacity
arrays (obs -> (camera, point, uvr, weight, mask)). Each GN iteration:
  1. batched residuals + analytic Jacobians for all observations at once;
  2. scatter-add into per-point 3x3 blocks H_pp, per-camera 6x6 diagonal
     H_cc, and the camera-point coupling tensor A[p, c] = J_c^T W J_p
     (dense [P, C, 6, 3] — the observation graph's irregularity becomes
     zeros, which the MXU eats for free);
  3. Schur: S = H_cc - sum_p A_p Hpp^-1 A_p^T via two batched einsums;
  4. dense Cholesky solve of the reduced [6C, 6C] camera system;
  5. back-substitute point updates.
Robust Huber weights and the reference's two-phase outlier gating (5 iters,
gate, 10 iters — Optimizer.cc:659-709) are mask updates inside the jit.

The same machinery scales out: shard the point/observation axis over a
device mesh and `psum` S and the reduced rhs (see parallel/dist_ba.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAProblem:
    """Fixed-capacity BA problem instance."""

    poses: jax.Array       # [C,7] Tcw, first `n_opt` are optimizable
    opt_mask: jax.Array    # [C] bool — pose is optimized
    points: jax.Array      # [P,3]
    obs_cam: jax.Array     # [O] i32 camera index
    obs_pt: jax.Array      # [O] i32 point index (local)
    obs_uvr: jax.Array     # [O,3] (u, v, u_right<0 for mono)
    obs_inv_sigma2: jax.Array  # [O] f32
    obs_valid: jax.Array   # [O] bool


def _residual_jac(cam: Camera, poses, points, prob: BAProblem):
    """Per-observation residuals and Jacobians.

    Returns r [O,3], Jc [O,3,6], Jp [O,3,3], stereo [O] bool.
    """
    T = poses[prob.obs_cam]                      # [O,7]
    pw = points[prob.obs_pt]                     # [O,3]
    pc = se3.se3_apply(T, pw)
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    invz = 1.0 / z
    u = cam.fx * x * invz + cam.cx
    v = cam.fy * y * invz + cam.cy
    ur = u - cam.bf * invz
    stereo = prob.obs_uvr[..., 2] >= 0
    r = jnp.stack([u - prob.obs_uvr[..., 0], v - prob.obs_uvr[..., 1],
                   jnp.where(stereo, ur - prob.obs_uvr[..., 2], 0.0)], -1)

    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # projection Jacobian wrt camera-frame point
    du = jnp.stack([cam.fx * invz, zeros, -cam.fx * x * invz * invz], -1)
    dv = jnp.stack([zeros, cam.fy * invz, -cam.fy * y * invz * invz], -1)
    dur = du + jnp.stack([zeros, zeros, cam.bf * invz * invz], -1)
    Jproj = jnp.stack([du, dv, jnp.where(stereo[..., None], dur, 0.0)], -2)

    # d pc / d twist (left-mult on Tcw): [I | -hat(pc)]
    dpc_tw = jnp.stack([
        jnp.stack([ones, zeros, zeros, zeros, pc[..., 2], -pc[..., 1]], -1),
        jnp.stack([zeros, ones, zeros, -pc[..., 2], zeros, pc[..., 0]], -1),
        jnp.stack([zeros, zeros, ones, pc[..., 1], -pc[..., 0], zeros], -1),
    ], -2)
    Jc = jnp.einsum("oij,ojk->oik", Jproj, dpc_tw)

    # d pc / d pw = R
    R = se3.quat_to_mat(T[..., :4])              # [O,3,3]
    Jp = jnp.einsum("oij,ojk->oik", Jproj, R)
    return r, Jc, Jp, stereo


def _huber(chi2, delta2):
    return jnp.where(chi2 <= delta2, 1.0,
                     jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("iters1", "iters2", "damping"))
def bundle_adjust(cam: Camera, prob: BAProblem, *, iters1: int = 5,
                  iters2: int = 10, damping: float = 1e-4):
    """Two-phase robust BA. Returns (poses, points, obs_inlier_mask)."""
    C = prob.poses.shape[0]
    P = prob.points.shape[0]
    delta2 = jnp.where(prob.obs_uvr[..., 2] >= 0, CHI2_STEREO, CHI2_MONO)

    def gn_iter(poses, points, obs_mask, use_huber):
        r, Jc, Jp, _ = _residual_jac(cam, poses, points, prob)
        chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
        hw = jnp.where(use_huber, _huber(chi2, delta2), 1.0)
        w = prob.obs_inv_sigma2 * hw * obs_mask.astype(jnp.float32)
        # zero camera Jacobian for fixed poses
        cam_opt = prob.opt_mask[prob.obs_cam]
        Jc_m = jnp.where(cam_opt[:, None, None], Jc, 0.0)

        # block accumulations
        Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
            jnp.einsum("ori,orj,o->oij", Jp, Jp, w))
        bp = jnp.zeros((P, 3)).at[prob.obs_pt].add(
            jnp.einsum("ori,or,o->oi", Jp, r, w))
        Hcc = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
            jnp.einsum("ori,orj,o->oij", Jc_m, Jc_m, w))
        bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
            jnp.einsum("ori,or,o->oi", Jc_m, r, w))
        # coupling tensor A[p, c, 6, 3]
        A = jnp.zeros((P, C, 6, 3)).at[prob.obs_pt, prob.obs_cam].add(
            jnp.einsum("ori,orj,o->oij", Jc_m, Jp, w))

        # Schur reduction
        Hpp_d = Hpp + damping * jnp.eye(3)
        Hpp_inv = jnp.linalg.inv(Hpp_d)                       # [P,3,3]
        M = jnp.einsum("pcis,pst->pcit", A, Hpp_inv)          # [P,C,6,3]
        S = -jnp.einsum("pcit,pdjt->cidj", M, A)              # [C,6,C,6]
        # add the block-diagonal camera Hessian
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
        rhs = bc - jnp.einsum("pcit,pt->ci", M, bp)

        Sd = S.reshape(C * 6, C * 6) + damping * jnp.eye(C * 6)
        dc = jnp.linalg.solve(Sd, -rhs.reshape(-1)).reshape(C, 6)
        dc = jnp.where(prob.opt_mask[:, None], dc, 0.0)

        dp = -jnp.einsum("pst,pt->ps", Hpp_inv,
                         bp + jnp.einsum("pcis,ci->ps", A, dc))

        new_poses = jax.vmap(lambda T, d: se3.se3_compose(se3.se3_exp(d), T))(
            poses, dc)
        new_poses = jnp.where(prob.opt_mask[:, None], new_poses, poses)
        new_points = points + dp

        # accept only if total robust cost decreases
        def cost(ps, pt):
            rr, _, _, _ = _residual_jac(cam, ps, pt, prob)
            c2 = jnp.sum(rr * rr, -1) * prob.obs_inv_sigma2
            if use_huber:  # static
                c2 = jnp.where(
                    c2 <= delta2, c2,
                    2.0 * jnp.sqrt(delta2 * jnp.maximum(c2, 1e-12)) - delta2)
            return jnp.sum(c2 * obs_mask)

        improved = cost(new_poses, new_points) < cost(poses, points)
        poses = jnp.where(improved, new_poses, poses)
        points = jnp.where(improved, new_points, points)
        return poses, points

    def phase(poses, points, obs_mask, iters, use_huber):
        def body(_, s):
            ps, pt = s
            return gn_iter(ps, pt, obs_mask, use_huber)
        return jax.lax.fori_loop(0, iters, body, (poses, points))

    poses, points = phase(prob.poses, prob.points, prob.obs_valid,
                          iters1, True)
    # outlier gating (Optimizer.cc:659-676)
    r, _, _, _ = _residual_jac(cam, poses, points, prob)
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    depth_ok = True  # depth positivity folded into residual clamp
    inlier = prob.obs_valid & (chi2 <= delta2)
    poses, points = phase(poses, points, inlier, iters2, False)
    r, _, _, _ = _residual_jac(cam, poses, points, prob)
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    inlier = inlier & (chi2 <= delta2)
    return poses, points, inlier
