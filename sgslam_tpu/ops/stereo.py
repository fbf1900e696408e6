"""Stereo matching for rectified pairs: per-keypoint epipolar search in the
right image with SAD subpixel refinement.

Replaces Frame::ComputeStereoMatches (/root/reference/src/sg-slam/src/
Frame.cc:716-890): the reference builds per-row candidate lists, does a
descriptor search along the epipolar row, then an 11x11 SAD refine with
parabola subpixel interpolation. Here every keypoint is processed in
parallel: candidate disparities form a static window, SAD over all
(keypoint, disparity) pairs is one batched gather + reduction, and the
subpixel parabola is closed-form — no per-row lists, no loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.camera import Camera
from .image import bilinear_sample


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_disparity", "patch", "step"))
def stereo_match(cam: Camera, gray_l, gray_r, xy, level, valid, *,
                 max_disparity: int = 96, patch: int = 5, step: int = 1):
    """Per-keypoint disparity search along the rectified epipolar row.

    xy: [N,2] LEFT-image keypoint coords (level-0 pixels); level: [N] i32.
    Returns (u_right [N] f32, depth [N] f32, ok [N] bool) — u_right < 0
    where no reliable match exists (the mono convention the map uses).
    """
    N = xy.shape[0]
    half = patch // 2
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)     # [P2,2]

    # left template patches
    coords_l = xy[:, None, :] + offs[None, :, :]               # [N,P2,2]
    tmpl = bilinear_sample(gray_l, coords_l)                   # [N,P2]

    # candidate disparities (positive: right feature sits left of left's u)
    disp = jnp.arange(0, max_disparity, step, dtype=jnp.float32)  # [D]
    cand_x = xy[:, None, 0] - disp[None, :]                    # [N,D]
    xs = cand_x[:, :, None] + offs[None, None, :, 0]           # [N,D,P2]
    ys = jnp.broadcast_to(
        xy[:, None, None, 1] + offs[None, None, :, 1], xs.shape)
    coords_r = jnp.stack([xs, ys], -1)                         # [N,D,P2,2]
    patches_r = bilinear_sample(gray_r, coords_r)              # [N,D,P2]
    sad = jnp.mean(jnp.abs(patches_r - tmpl[:, None, :]), -1)  # [N,D]
    sad = jnp.where(cand_x > half, sad, jnp.inf)               # in-bounds

    best = jnp.argmin(sad, axis=1)
    best_sad = jnp.take_along_axis(sad, best[:, None], 1)[:, 0]

    # parabola subpixel refine over (best-1, best, best+1)
    bm1 = jnp.clip(best - 1, 0, sad.shape[1] - 1)
    bp1 = jnp.clip(best + 1, 0, sad.shape[1] - 1)
    s0 = jnp.take_along_axis(sad, bm1[:, None], 1)[:, 0]
    s2 = jnp.take_along_axis(sad, bp1[:, None], 1)[:, 0]
    denom = jnp.maximum(s0 - 2.0 * best_sad + s2, 1e-9)
    delta = jnp.clip(0.5 * (s0 - s2) / denom, -1.0, 1.0)
    d_sub = (best.astype(jnp.float32) + delta) * step

    # acceptance: low residual, not at the search border, minimum disparity
    ok = (valid & jnp.isfinite(best_sad) & (best_sad < 0.08)
          & (best > 0) & (best < sad.shape[1] - 1)
          & (d_sub > 0.5))
    u_right = jnp.where(ok, xy[:, 0] - d_sub, -1.0)
    depth = jnp.where(ok, cam.bf / jnp.maximum(d_sub, 1e-6), 0.0)
    return u_right, depth, ok


def attach_stereo(cam: Camera, feats, gray_l, gray_r):
    """Fill a Features block's u_right/depth from a rectified stereo pair
    (the stereo-constructor contract, Frame.cc:87-127)."""
    import dataclasses

    u_right, depth, ok = stereo_match(cam, gray_l, gray_r, feats.xy_raw,
                                      feats.level, feats.valid)
    return dataclasses.replace(feats, u_right=u_right, depth=depth)
