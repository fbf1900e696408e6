"""Pinhole RGB-D camera model: projection, back-projection, undistortion.

Replaces the reference's scattered camera handling: intrinsics parsing in
Tracking (/root/reference/src/sg-slam/src/Tracking.cc:53-105), keypoint
undistortion (src/Frame.cc:654-684), frustum checks (src/Frame.cc:296-352),
back-projection (src/Frame.cc:916-930) and the RGB-D pseudo-stereo model
(src/Frame.cc:893-914), plus the vendored image_geometry pinhole model.

The camera is a small pytree of scalars so it can be closed over or passed
into jitted functions freely.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole intrinsics + radtan distortion + RGB-D pseudo-stereo baseline.

    Deliberately a plain hashable frozen dataclass (NOT a pytree): cameras are
    compile-time constants of the jitted stages, so intrinsics constant-fold
    into the kernels. Pass via closure or `static_argnums`.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    # radial-tangential distortion (k1, k2, p1, p2, k3)
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    # bf = fx * baseline (meters); RGB-D pseudo-stereo (Frame.cc:893-914)
    bf: float = 40.0
    width: int = 640
    height: int = 480

    @property
    def baseline(self):
        return self.bf / self.fx

    def has_distortion(self) -> bool:
        return any(abs(k) > 0 for k in (self.k1, self.k2, self.p1, self.p2, self.k3))


def project(cam: Camera, pc):
    """Camera-frame points [..., 3] -> pixel coords [..., 2] (no distortion).

    Matches the ideal-pinhole projection used everywhere in the reference after
    keypoints are undistorted once at frame construction.
    """
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Camera, pc):
    """[..., 3] -> (u, v, u_right) for the RGB-D pseudo-stereo residual."""
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = cam.fx * pc[..., 0] / z + cam.cx
    v = cam.fy * pc[..., 1] / z + cam.cy
    ur = u - cam.bf / z
    return jnp.stack([u, v, ur], axis=-1)


def backproject(cam: Camera, uv, z):
    """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3].

    Contract of Frame::UnprojectStereo (Frame.cc:916-930).
    """
    x = (uv[..., 0] - cam.cx) * z / cam.fx
    y = (uv[..., 1] - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def distort_normalized(cam: Camera, xy):
    """Apply radtan distortion to normalized coords [..., 2]."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv, iters: int = 8):
    """Undistort pixel coords [..., 2] by fixed-point iteration.

    Contract of Frame::UndistortKeyPoints (Frame.cc:654-684), which calls
    cv::undistortPoints; we use the same iterative compensation scheme with a
    static iteration count (jit-friendly).
    """
    if not cam.has_distortion():
        return uv
    xd = (uv[..., 0] - cam.cx) / cam.fx
    yd = (uv[..., 1] - cam.cy) / cam.fy
    d = jnp.stack([xd, yd], axis=-1)

    def body(_, x):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * xx * yy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xx * yy
        un = (d - jnp.stack([dx, dy], axis=-1)) / radial[..., None]
        return un

    x = jax.lax.fori_loop(0, iters, body, d)
    u = x[..., 0] * cam.fx + cam.cx
    v = x[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def in_image(cam: Camera, uv, margin: float = 0.0):
    """Boolean mask of pixels inside the (undistorted) image bounds."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


def intrinsic_matrix(cam: Camera, dtype=jnp.float32):
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )
