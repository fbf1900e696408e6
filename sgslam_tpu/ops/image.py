"""Image primitives: separable Gaussian blur, resize, batched patch gather.

TPU-native replacements for the cv::GaussianBlur / cv::resize calls in the
reference's ORB extractor (/root/reference/src/sg-slam/src/ORBextractor.cc:1087,
1108-1133) and the per-keypoint patch addressing done with raw pointers there.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(ksize: int, sigma: float, dtype=jnp.float32):
    r = (ksize - 1) / 2
    x = jnp.arange(ksize, dtype=dtype) - r
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur, replicate padding. img: [H, W] float32.

    Implemented as unrolled shift-multiply-accumulate (pad + static slice),
    NOT lax.conv: a single-channel convolution occupies one MXU lane and
    measured ~20 ms across the 8-level pyramid, while the unrolled form is
    pure fused VPU elementwise work (sub-ms)."""
    k = gaussian_kernel_1d(ksize, sigma, img.dtype)
    r = ksize // 2
    h, w = img.shape

    def conv_axis(x, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad, mode="edge")
        acc = None
        for i in range(ksize):
            start = [0, 0]
            start[axis] = i
            sl = jax.lax.slice(xp, start,
                               (start[0] + h, start[1] + w))
            term = sl * k[i]
            acc = term if acc is None else acc + term
        return acc

    return conv_axis(conv_axis(img, 0), 1)


def resize_bilinear(img, h: int, w: int):
    """cv::resize(INTER_LINEAR)-style downscale. img: [H, W]."""
    return jax.image.resize(img, (h, w), method="linear")


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static per-level (h, w) like ORBextractor::ComputePyramid
    (ORBextractor.cc:1108-1133)."""
    shapes = []
    for lv in range(n_levels):
        s = 1.0 / (scale ** lv)
        shapes.append((int(round(h * s)), int(round(w * s))))
    return tuple(shapes)


def build_pyramid(img, n_levels: int, scale: float):
    """Tuple of per-level images (level 0 = input)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img]
    for lv in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], *shapes[lv]))
    return tuple(levels)


@partial(jax.jit, static_argnums=(2,))
def gather_patches(img, centers, radius: int):
    """Gather square patches around integer centers.

    img: [H, W]; centers: [N, 2] int32 (x, y). Returns [N, 2r+1, 2r+1].
    Centers are clamped so the patch stays in bounds (callers keep keypoints
    inside the edge margin anyway, matching EDGE_THRESHOLD=19 semantics).
    """
    h, w = img.shape
    size = 2 * radius + 1
    cx = jnp.clip(centers[:, 0] - radius, 0, w - size)
    cy = jnp.clip(centers[:, 1] - radius, 0, h - size)

    def one(cx_i, cy_i):
        return jax.lax.dynamic_slice(img, (cy_i, cx_i), (size, size))

    return jax.vmap(one)(cx, cy)


def max_pool_3x3(x):
    """3x3 max filter (same shape) for FAST non-max suppression."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")


def bilinear_sample(img, xy):
    """Sample img [H,W] at float coords xy [...,2] with bilinear interp.

    Out-of-bounds clamps to border. Used by LK flow and dense warping.
    """
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
