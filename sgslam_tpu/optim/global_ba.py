"""Full-map bundle adjustment.

Contract of Optimizer::GlobalBundleAdjustemnt / BundleAdjustment
(/root/reference/src/sg-slam/src/Optimizer.cc:41-237): optimize every valid
keyframe pose (first keyframe fixed for gauge) and every valid map point
against all observations, Huber-robust, then write results back — the
reference stages results in mTcwGBA/mPosGBA and propagates under the map
mutex (LoopClosing::RunGlobalBundleAdjustment, LoopClosing.cc:645-749); our
map is a value, so writeback is a functional scatter and "propagation" is
the same spanning-tree-free correction the pose-graph writer uses.

The whole map fits one fixed-shape BAProblem ([K, N] observation blocks),
so global BA is literally local BA with the window = everything — the
Schur-complement point marginalization and the dense reduced camera solve
in optim/local_ba.py already batch over arbitrary window sizes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..mapstate import local_map as lm
from ..mapstate import mapstate as ms
from . import local_ba


@partial(jax.jit, static_argnums=(0,), static_argnames=("iters",))
def global_ba_step(cfg: SlamConfig, m: ms.MapState, *,
                   iters: int = 10, fixed_extra=None) -> ms.MapState:
    """One global-BA pass over the whole map, fully on device.

    Gauge fix: keyframe 0 (the reference fixes the first KF via
    vSE3->setFixed(pKF->mnId==0), Optimizer.cc:100). `fixed_extra` [K]
    bool pins additional keyframes — the post-loop GBA pins the verified
    loop pair so that on maps whose cross-loop observations are sparse
    the solver cannot slide the closure back toward the drifted
    odometry-consistent optimum.
    """
    K = m.max_kf
    kf_ids = jnp.arange(K, dtype=jnp.int32)
    kf_ids = jnp.where(m.kf_valid, kf_ids, -1)
    opt_mask = m.kf_valid & (jnp.arange(K) != 0)
    if fixed_extra is not None:
        opt_mask = opt_mask & ~fixed_extra

    prob, pids = lm.build_ba_problem(
        cfg.camera, m, kf_ids, opt_mask,
        max_points=cfg.capacity.max_points,
        scale_factor=cfg.orb.scale_factor)
    # tol=0: global BA always runs its full slice budget — the
    # interruptible slicing machinery owns the iteration count, and the
    # post-loop correction quality depends on every budgeted iteration
    # (the hot-path early exit measurably under-corrects injected drift)
    poses, points, inlier = local_ba.bundle_adjust(
        cfg.camera, prob, iters1=iters // 2, iters2=iters - iters // 2,
        tol=0.0)
    return lm.writeback_ba(m, kf_ids, opt_mask, poses, pids, points)


def global_ba_interruptible(cfg: SlamConfig, m: ms.MapState, *,
                            iters: int = 10, slice_iters: int = 2,
                            should_abort=None, fixed_extra=None):
    """Cooperatively cancellable global BA.

    The reference's GBA checks a stop flag between g2o iterations
    (mbStopGBA / setForceStopFlag, Optimizer.cc:92-97 via
    LoopClosing.cc:410-423, and mbAbortBA for local BA,
    Optimizer.cc:655-657): new tracking work preempts a long-running
    back-end solve. Here the solve is sliced into `slice_iters`-iteration
    jitted steps with the host `should_abort()` hook polled between
    slices — every completed slice's result is kept (BA is anytime).

    Returns (map, iterations_completed).
    """
    done = 0
    while done < iters:
        n = min(slice_iters, iters - done)
        m = global_ba_step(cfg, m, iters=n, fixed_extra=fixed_extra)
        done += n
        if should_abort is not None and done < iters and should_abort():
            break
    return m, done
