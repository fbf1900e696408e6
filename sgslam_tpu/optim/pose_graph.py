"""Sim(3) pose-graph (essential-graph) optimization, batched GN.

Replaces Optimizer::OptimizeEssentialGraph (/root/reference/src/sg-slam/src/
Optimizer.cc:781-1045): g2o's BlockSolver_7_3 over VertexSim3Expmap nodes
with spanning-tree + loop + strong-covisibility edges becomes a batched
Gauss-Newton program: per-edge residuals r = sim3_log(S_meas * S_j * S_i^-1)
with Jacobians from forward-mode autodiff of the local (left-multiplicative)
perturbation — exact, batched, and free of hand-derived Sim3 adjoints —
scatter-added into a dense [7K, 7K] system (K <= 512 keyframes: the dense
solve is one Cholesky on the MXU, beating sparse bookkeeping).

Also used with all edges SE3-like (scale pinned by the fix-scale residual
weighting) for RGB-D, matching the reference's `bFixScale=true` path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import se3


def edge_residual(S_i, S_j, S_meas_ij):
    """r [7] = sim3_log(S_meas_ij * S_j * S_i^-1); zero when consistent.

    Convention: S_i = world->frame i; measurement S_meas_ij ~ S_i * S_j^-1.
    """
    return se3.sim3_log(
        se3.sim3_compose(S_meas_ij,
                         se3.sim3_compose(S_j, se3.sim3_inverse(S_i))))


def _perturbed_residual(xi_i, xi_j, S_i, S_j, S_meas):
    Si = se3.sim3_compose(se3.sim3_exp(xi_i), S_i)
    Sj = se3.sim3_compose(se3.sim3_exp(xi_j), S_j)
    return edge_residual(Si, Sj, S_meas)


_jac_i = jax.jacfwd(_perturbed_residual, argnums=0)
_jac_j = jax.jacfwd(_perturbed_residual, argnums=1)


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_pose_graph(poses, pose_valid, fixed_mask,
                        edge_i, edge_j, edge_meas, edge_weight,
                        *, iters: int = 20, fix_scale: bool = True,
                        damping: float = 1e-6):
    """GN over Sim3 poses.

    poses: [K,8] Sim3 world->kf; fixed_mask: [K] bool (anchors, e.g. the
    loop KF — reference fixes mpCurrentKF's loop match);
    edges: i/j [E] i32 (entries with weight 0 are padding), edge_meas [E,8].
    Returns optimized poses [K,8].
    """
    K = poses.shape[0]
    z7 = jnp.zeros(7)

    def gn(step, poses):
        S_i = poses[edge_i]
        S_j = poses[edge_j]
        r = jax.vmap(edge_residual)(S_i, S_j, edge_meas)       # [E,7]
        Ji = jax.vmap(lambda a, b, m: _jac_i(z7, z7, a, b, m))(
            S_i, S_j, edge_meas)                                # [E,7,7]
        Jj = jax.vmap(lambda a, b, m: _jac_j(z7, z7, a, b, m))(
            S_i, S_j, edge_meas)

        w = edge_weight
        if fix_scale:
            # pin the scale dof hard: heavy weight on the sigma residual
            scale_w = jnp.ones(7).at[6].set(100.0)
            r = r * scale_w[None, :]
            Ji = Ji * scale_w[None, :, None]
            Jj = Jj * scale_w[None, :, None]

        H = jnp.zeros((K, 7, K, 7))
        b = jnp.zeros((K, 7))
        H = H.at[edge_i, :, edge_i, :].add(
            jnp.einsum("eri,erj,e->eij", Ji, Ji, w))
        H = H.at[edge_j, :, edge_j, :].add(
            jnp.einsum("eri,erj,e->eij", Jj, Jj, w))
        H = H.at[edge_i, :, edge_j, :].add(
            jnp.einsum("eri,erj,e->eij", Ji, Jj, w))
        H = H.at[edge_j, :, edge_i, :].add(
            jnp.einsum("eri,erj,e->eij", Jj, Ji, w))
        b = b.at[edge_i].add(jnp.einsum("eri,er,e->ei", Ji, r, w))
        b = b.at[edge_j].add(jnp.einsum("eri,er,e->ei", Jj, r, w))

        free = pose_valid & ~fixed_mask
        # clamp fixed/invalid rows to identity
        diag = jnp.arange(K)
        fixpen = jnp.where(free, 0.0, 1e8)
        H = H.at[diag, :, diag, :].add(
            fixpen[:, None, None] * jnp.eye(7)[None])
        Hd = H.reshape(K * 7, K * 7)
        Hd = Hd + damping * jnp.eye(K * 7)
        # grow damping mildly with iteration count for stability
        dx = jnp.linalg.solve(Hd, -b.reshape(-1)).reshape(K, 7)
        dx = jnp.where(free[:, None], dx, 0.0)
        new_poses = jax.vmap(
            lambda d, S: se3.sim3_compose(se3.sim3_exp(d), S))(dx, poses)
        if fix_scale:
            new_poses = new_poses.at[:, 7].set(
                jnp.where(pose_valid, 1.0, new_poses[:, 7]))
        return new_poses

    return jax.lax.fori_loop(0, iters, gn, poses)


def build_essential_edges(cov, kf_pose_sim3, spanning_parent,
                          loop_i, loop_j, loop_meas,
                          min_covis_weight: float = 100.0,
                          max_edges: int = 2048):
    """Assemble the essential graph's edge lists (host-side, numpy-ish).

    Mirrors OptimizeEssentialGraph's edge sets (Optimizer.cc:852-986):
    spanning-tree edges, strong covisibility edges (weight >= 100), and the
    new loop edges with their Sim3 measurements. Measurements for tree/
    covisibility edges are taken from current (pre-correction) poses.
    Returns (edge_i, edge_j, edge_meas, edge_w) fixed-capacity arrays.
    """
    import numpy as np

    K = cov.shape[0]
    ei, ej, ew = [], [], []
    for k in range(K):
        p = int(spanning_parent[k])
        if p >= 0:
            ei.append(k)
            ej.append(p)
            ew.append(1.0)
    cw = np.asarray(cov)
    ii, jj = np.where(np.triu(cw, 1) >= min_covis_weight)
    for a, b in zip(ii, jj):
        ei.append(int(a))
        ej.append(int(b))
        ew.append(1.0)
    meas = []
    poses = np.asarray(kf_pose_sim3)
    for a, b in zip(ei, ej):
        Sa = jnp.asarray(poses[a])
        Sb = jnp.asarray(poses[b])
        meas.append(np.asarray(
            se3.sim3_compose(Sa, se3.sim3_inverse(Sb))))
    for a, b, m in zip(np.asarray(loop_i).tolist(),
                       np.asarray(loop_j).tolist(), loop_meas):
        ei.append(int(a))
        ej.append(int(b))
        ew.append(2.0)
        meas.append(np.asarray(m))

    E = len(ei)
    pad = max_edges - E
    assert pad >= 0, f"too many edges: {E} > {max_edges}"
    edge_i = np.asarray(ei + [0] * pad, np.int32)
    edge_j = np.asarray(ej + [0] * pad, np.int32)
    edge_w = np.asarray(ew + [0.0] * pad, np.float32)
    edge_meas = np.concatenate(
        [np.asarray(meas, np.float32).reshape(E, 8),
         np.tile(np.asarray(se3.sim3_identity())[None], (pad, 1))], 0)
    return (jnp.asarray(edge_i), jnp.asarray(edge_j),
            jnp.asarray(edge_meas), jnp.asarray(edge_w))
