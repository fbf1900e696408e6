"""Sparse pyramidal Lucas-Kanade optical flow, batched over keypoints.

Replaces the cv::calcOpticalFlowPyrLK call on the dynamic-rejection path
(/root/reference/src/sg-slam/src/Frame.cc:445): for every current-frame
keypoint, find its position in the previous frame. All loops are static
(levels x iterations), all points solved in parallel; the 2x2 normal systems
are closed-form. Status mirrors LK's convergence/bounds checks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .image import bilinear_sample


def _patch_coords(center, half: int):
    """center [N,2] -> sample grid [N, (2h+1)^2, 2]."""
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(r, r, indexing="ij")
    offs = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [W2,2]
    return center[:, None, :] + offs[None, :, :]


def _sample(img, coords):
    """bilinear sample img at coords [..., 2]."""
    return bilinear_sample(img, coords)


@partial(jax.jit, static_argnames=("levels", "window", "iters"))
def lk_flow(img_from, img_to, pts, valid, *, levels: int = 3,
            window: int = 11, iters: int = 10):
    """Track points from `img_from` to `img_to`.

    pts: [N,2] float32 positions in img_from.
    Returns (pts_to [N,2], status [N] bool).
    """
    half = window // 2
    h, w = img_from.shape

    # power-of-two pyramids (cv::buildOpticalFlowPyramid convention)
    pyr_f = [img_from]
    pyr_t = [img_to]
    for lv in range(1, levels):
        ph, pw = pyr_f[-1].shape
        pyr_f.append(jax.image.resize(pyr_f[-1], (ph // 2, pw // 2),
                                      "linear"))
        pyr_t.append(jax.image.resize(pyr_t[-1], (ph // 2, pw // 2),
                                      "linear"))

    flow = jnp.zeros_like(pts)
    err_ok = jnp.ones(pts.shape[0], bool)

    for lv in reversed(range(levels)):
        scale = 2.0 ** lv
        img_f = pyr_f[lv]
        img_t = pyr_t[lv]
        p_l = pts / scale
        coords0 = _patch_coords(p_l, half)              # [N,W2,2]
        patch0 = _sample(img_f, coords0)                # [N,W2]
        # spatial gradients of the template (central differences)
        gx = 0.5 * (_sample(img_f, coords0 + jnp.array([1.0, 0.0]))
                    - _sample(img_f, coords0 - jnp.array([1.0, 0.0])))
        gy = 0.5 * (_sample(img_f, coords0 + jnp.array([0.0, 1.0]))
                    - _sample(img_f, coords0 - jnp.array([0.0, 1.0])))
        gxx = jnp.sum(gx * gx, -1)
        gxy = jnp.sum(gx * gy, -1)
        gyy = jnp.sum(gy * gy, -1)
        det = gxx * gyy - gxy * gxy
        invertible = det > 1e-6
        det_safe = jnp.where(invertible, det, 1.0)

        def body(_, fl):
            coords1 = coords0 + fl[:, None, :]
            patch1 = _sample(img_t, coords1)
            diff = patch0 - patch1
            bx = jnp.sum(diff * gx, -1)
            by = jnp.sum(diff * gy, -1)
            dx = (gyy * bx - gxy * by) / det_safe
            dy = (gxx * by - gxy * bx) / det_safe
            step = jnp.stack([dx, dy], -1)
            step = jnp.where(invertible[:, None], step, 0.0)
            return fl + jnp.clip(step, -half, half)

        flow_l = jax.lax.fori_loop(0, iters, body, flow / scale * 1.0)
        flow = flow_l * scale
        err_ok = err_ok & invertible

    pts_to = pts + flow
    inb = ((pts_to[:, 0] >= half) & (pts_to[:, 0] < w - half)
           & (pts_to[:, 1] >= half) & (pts_to[:, 1] < h - half))
    # residual check: mean abs photometric error of the final patch
    coords0 = _patch_coords(pts, half)
    res = jnp.mean(jnp.abs(_sample(img_from, coords0)
                           - _sample(img_to, coords0 + flow[:, None, :])),
                   axis=-1)
    status = valid & err_ok & inb & (res < 0.12)
    return pts_to, status
