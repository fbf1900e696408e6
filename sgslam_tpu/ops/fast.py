"""FAST-9/16 corner detection as a dense, vectorized map over the image.

Replaces the per-30px-cell cv::FAST calls in the reference's extractor
(/root/reference/src/sg-slam/src/ORBextractor.cc:790-830). Instead of cell
loops with threshold fallback 20->7, we compute the full score map at the low
threshold once (one fused XLA elementwise program over 16 shifted copies) and
let the per-cell top-k selection (orb.py) impose spatial uniformity — the
high-threshold preference is recovered by response ordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, clockwise from 12 o'clock — (dx, dy) offsets.
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)

ARC = 9  # FAST-9: contiguous arc length


def _shift(img, dx: int, dy: int):
    """img shifted so out[y, x] = img[y + dy, x + dx], edge-padded.

    Implemented as pad + static slice (NOT advanced indexing): index-array
    gathers are slow on TPU, while pad/slice is pure layout movement that
    XLA fuses into the consuming elementwise ops.
    """
    h, w = img.shape
    r = max(abs(dx), abs(dy))
    if r == 0:
        return img
    p = jnp.pad(img, r, mode="edge")
    return jax.lax.slice(p, (r + dy, r + dx), (r + dy + h, r + dx + w))


def fast_score_map(img, threshold: float):
    """Dense FAST-9/16 corner score map with cv::FAST score semantics.

    img: [H, W] float32 intensities (any consistent scale).
    Returns score [H, W] float32; 0 where not a corner. The score is the
    largest threshold for which the pixel would still be a corner
    (OpenCV cornerScore semantics):
        score = max over 9-arcs of min over arc of (ring - center)   [bright]
              / of (center - ring)                                    [dark]
    so NMS ordering matches cv::FAST(nonmaxSuppression=true).
    """
    center = img
    ring = jnp.stack([_shift(img, dx, dy) for dx, dy in CIRCLE])  # [16,H,W]
    diff = ring - center[None]

    def arc_score(d):
        # windowed min of length ARC over the circular axis, then max
        m = jnp.concatenate([d, d[: ARC - 1]], axis=0)            # [24,H,W]
        win_min = jax.lax.reduce_window(
            m, jnp.inf, jax.lax.min, (ARC, 1, 1), (1, 1, 1), "VALID")
        return jnp.max(win_min, axis=0)                           # [H,W]

    s_bright = arc_score(diff)
    s_dark = arc_score(-diff)
    score = jnp.maximum(s_bright, s_dark)
    return jnp.where(score > threshold, score, 0.0)


def nms_3x3(score):
    """Strict 3x3 non-max suppression: plateau ties are suppressed,
    matching OpenCV FAST's nonmax_suppression (score must exceed all 8
    neighbours)."""
    neigh = [
        _shift(score, dx, dy)
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ]
    nmax = jnp.max(jnp.stack(neigh), axis=0)
    return jnp.where((score > nmax) & (score > 0.0), score, 0.0)


def border_mask(h: int, w: int, margin: int, dtype=jnp.float32):
    m = jnp.zeros((h, w), dtype)
    return m.at[margin:h - margin, margin:w - margin].set(1.0)
