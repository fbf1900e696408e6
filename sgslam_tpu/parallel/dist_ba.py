"""Distributed bundle adjustment over a TPU device mesh.

The workload-correct scale-out axes for a SLAM system (SURVEY.md §2.3, §5)
are the map dimensions, not attention/MoE axes:

  'pt' — point/observation blocks. Each shard owns a slab of map points and
         the observations of those points; it computes its local point-block
         Schur reduction (Hpp^-1 marginalization) and the reduced camera
         system is summed over shards with `psum` (rides ICI).
  'kf' — camera-block rows. Each shard materializes only its rows of the
         reduced [C,6,C,6] camera system; rows are assembled with
         `all_gather` before the dense solve (replicated — C is small).

This is the Schur-complement-over-collectives design that replaces g2o's
single-threaded sparse solver for Optimizer::GlobalBundleAdjustemnt
(/root/reference/src/sg-slam/src/Optimizer.cc:41-237) at multi-chip scale.
The caller pre-partitions observations by point block (the production path;
see tests for the layout). Poses are replicated — C keyframes x 7 floats is
tiny next to points/observations.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:  # JAX >= 0.4.35 promotes shard_map out of experimental
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..geometry import se3
from ..geometry.camera import Camera

CHI2_STEREO = 7.815
CHI2_MONO = 5.991


def make_mesh(n_kf_shards: int, n_pt_shards: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = n_kf_shards * n_pt_shards
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(n_kf_shards, n_pt_shards)
    return Mesh(arr, ("kf", "pt"))


def _residual_jac(cam: Camera, poses, points, obs_cam, obs_pt, obs_uvr):
    """Same math as optim.local_ba._residual_jac, on shard-local arrays."""
    T = poses[obs_cam]
    pw = points[obs_pt]
    pc = se3.se3_apply(T, pw)
    x, y = pc[..., 0], pc[..., 1]
    z = jnp.maximum(pc[..., 2], 1e-6)
    invz = 1.0 / z
    u = cam.fx * x * invz + cam.cx
    v = cam.fy * y * invz + cam.cy
    ur = u - cam.bf * invz
    stereo = obs_uvr[..., 2] >= 0
    r = jnp.stack([u - obs_uvr[..., 0], v - obs_uvr[..., 1],
                   jnp.where(stereo, ur - obs_uvr[..., 2], 0.0)], -1)
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    du = jnp.stack([cam.fx * invz, zeros, -cam.fx * x * invz * invz], -1)
    dv = jnp.stack([zeros, cam.fy * invz, -cam.fy * y * invz * invz], -1)
    dur = du + jnp.stack([zeros, zeros, cam.bf * invz * invz], -1)
    Jproj = jnp.stack([du, dv, jnp.where(stereo[..., None], dur, 0.0)], -2)
    dpc = jnp.stack([
        jnp.stack([ones, zeros, zeros, zeros, pc[..., 2], -pc[..., 1]], -1),
        jnp.stack([zeros, ones, zeros, -pc[..., 2], zeros, pc[..., 0]], -1),
        jnp.stack([zeros, zeros, ones, pc[..., 1], -pc[..., 0], zeros], -1),
    ], -2)
    Jc = jnp.einsum("oij,ojk->oik", Jproj, dpc)
    R = se3.quat_to_mat(T[..., :4])
    Jp = jnp.einsum("oij,ojk->oik", Jproj, R)
    return r, Jc, Jp


def make_distributed_ba_step(cam: Camera, mesh: Mesh, n_opt_cams: int,
                             damping: float = 1e-4):
    """Build the jitted SPMD GN step.

    Sharded inputs (leading axis over 'pt'):
      points   [P, 3]            — this shard's map points
      obs_cam  [O] i32           — camera index per observation
      obs_pt   [O] i32           — SHARD-LOCAL point index
      obs_uvr  [O, 3]
      obs_w    [O]               — inv_sigma2 * validity (0 disables)
    Replicated: poses [C,7], opt_mask [C].
    Returns (new_poses [C,7] replicated, new_points [P,3] sharded).
    """
    C = n_opt_cams
    kf_size = mesh.shape["kf"]

    def _cost(poses, points, obs_cam, obs_pt, obs_uvr, obs_w):
        """Huber-robust total chi2, psum'd over the point shards."""
        r, _, _ = _residual_jac(cam, poses, points, obs_cam, obs_pt,
                                obs_uvr)
        chi2 = jnp.sum(r * r, -1) * obs_w
        delta2 = jnp.where(obs_uvr[..., 2] >= 0, CHI2_STEREO, CHI2_MONO)
        rho = jnp.where(chi2 <= delta2, chi2,
                        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12))
                        - delta2)
        return jax.lax.psum(jnp.sum(rho), "pt")

    def step(poses, opt_mask, points, obs_cam, obs_pt, obs_uvr, obs_w, lam):
        r, Jc, Jp = _residual_jac(cam, poses, points, obs_cam, obs_pt,
                                  obs_uvr)
        chi2 = jnp.sum(r * r, -1) * obs_w
        delta2 = jnp.where(obs_uvr[..., 2] >= 0, CHI2_STEREO, CHI2_MONO)
        huber = jnp.where(chi2 <= delta2, 1.0,
                          jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))
        w = obs_w * huber
        cam_opt = opt_mask[obs_cam]
        Jc = jnp.where(cam_opt[:, None, None], Jc, 0.0)

        Pl = points.shape[0]
        Hpp = jnp.zeros((Pl, 3, 3)).at[obs_pt].add(
            jnp.einsum("ori,orj,o->oij", Jp, Jp, w))
        bp = jnp.zeros((Pl, 3)).at[obs_pt].add(
            jnp.einsum("ori,or,o->oi", Jp, r, w))
        A = jnp.zeros((Pl, C, 6, 3)).at[obs_pt, obs_cam].add(
            jnp.einsum("ori,orj,o->oij", Jc, Jp, w))
        Hcc_local = jnp.zeros((C, 6, 6)).at[obs_cam].add(
            jnp.einsum("ori,orj,o->oij", Jc, Jc, w))
        bc_local = jnp.zeros((C, 6)).at[obs_cam].add(
            jnp.einsum("ori,or,o->oi", Jc, r, w))

        # LM with RELATIVE (diagonal-proportional) damping — Hessian
        # entries scale like fx^2 ~ 1e6, so absolute damping leaves the f32
        # solve ill-conditioned (same scheme as optim/local_ba.py)
        dpp = jnp.einsum("pii->pi", Hpp)
        Hpp_inv = jnp.linalg.inv(
            Hpp + lam * jax.vmap(jnp.diag)(dpp) + 1e-6 * jnp.eye(3))
        M = jnp.einsum("pcis,pst->pcit", A, Hpp_inv)

        # ---- 'kf' axis: each shard materializes its camera-block rows of S
        kf_idx = jax.lax.axis_index("kf")
        rows_per = -(-C // kf_size)
        row0 = kf_idx * rows_per
        M_rows = jax.lax.dynamic_slice_in_dim(M, row0, rows_per, axis=1)
        S_rows = -jnp.einsum("pcit,pdjt->cidj", M_rows, A)  # [rows,6,C,6]
        rhs_rows = (jax.lax.dynamic_slice_in_dim(bc_local, row0, rows_per, 0)
                    - jnp.einsum("pcit,pt->ci", M_rows, bp))

        # ---- 'pt' axis: sum partial Schur contributions over point shards
        S_rows = jax.lax.psum(S_rows, "pt")
        rhs_rows = jax.lax.psum(rhs_rows, "pt")
        Hcc = jax.lax.psum(Hcc_local, "pt")
        bc = jax.lax.psum(bc_local, "pt")

        # assemble full S on every device (C is small; rows ride ICI)
        S_all = jax.lax.all_gather(S_rows, "kf", axis=0,
                                   tiled=True)[:C]          # [C,6,C,6]
        rhs_all = jax.lax.all_gather(rhs_rows, "kf", axis=0, tiled=True)[:C]
        # Hcc rows were fully summed already; add block diagonal
        S_all = S_all.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)

        Sd = S_all.reshape(C * 6, C * 6)
        Sd = Sd + jnp.diag(lam * jnp.diagonal(Sd) + damping)
        dc = jnp.linalg.solve(Sd, -rhs_all.reshape(-1)).reshape(C, 6)
        dc = jnp.where(opt_mask[:, None], dc, 0.0)

        dp = -jnp.einsum("pst,pt->ps", Hpp_inv,
                         bp + jnp.einsum("pcis,ci->ps", A, dc))

        new_poses = jax.vmap(
            lambda T, d: se3.se3_compose(se3.se3_exp(d), T))(poses, dc)
        new_poses = jnp.where(opt_mask[:, None], new_poses, poses)
        new_points = points + dp

        # accept only improving steps; adapt damping (distributed LM —
        # the accept decision psums the same scalar on every device)
        c_old = _cost(poses, points, obs_cam, obs_pt, obs_uvr, obs_w)
        c_new = _cost(new_poses, new_points, obs_cam, obs_pt, obs_uvr,
                      obs_w)
        improved = c_new < c_old
        poses = jnp.where(improved, new_poses, poses)
        points = jnp.where(improved, new_points, points)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-5),
                        jnp.minimum(lam * 4.0, 1e2))
        return poses, points, lam

    sharded = _shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P("pt"), P("pt"), P("pt"), P("pt"), P("pt"),
                  P()),
        out_specs=(P(), P("pt"), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def distributed_ba(cam: Camera, mesh: Mesh, poses, opt_mask, points,
                   obs_cam, obs_pt, obs_uvr, obs_w, iters: int = 10):
    """Run `iters` SPMD GN steps. Arrays must already be device_put with the
    matching NamedShardings (see make_shardings)."""
    step = make_distributed_ba_step(cam, mesh, poses.shape[0])
    lam = jnp.asarray(1e-3)
    for _ in range(iters):
        poses, points, lam = step(poses, opt_mask, points, obs_cam, obs_pt,
                                  obs_uvr, obs_w, lam)
    return poses, points


def make_shardings(mesh: Mesh):
    return dict(
        replicated=NamedSharding(mesh, P()),
        pt=NamedSharding(mesh, P("pt")),
    )
