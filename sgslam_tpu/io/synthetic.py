"""Procedural synthetic RGB-D sequence renderer with exact ground truth.

The reference validates only end-to-end on TUM/Bonn sequences (SURVEY.md §4);
we additionally need hermetic, dataset-free fixtures. This module renders a
room-like scene (textured wall + floor + side wall) and an optional moving
"dynamic object" quad (a stand-in for the walking people of fr3/walking_*),
from analytic plane geometry — so every frame has exact pose and depth ground
truth, and the renderer itself is a jittable JAX program (runs on TPU).

Rendering model: per-pixel ray casting against N planes; texture is a
procedural multi-scale random-checker field (sharp square corners -> rich FAST
response). No stored assets, fully deterministic from a seed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.camera import Camera, undistort_points


def _cell_hash(ix, iy, seed):
    """Deterministic pseudo-random value in [0,1) per integer cell."""
    h = jnp.sin(ix * 127.1 + iy * 311.7 + seed * 74.7) * 43758.5453
    return h - jnp.floor(h)


def texture(x, y, seed: float = 0.0):
    """Multi-scale random-checker texture in [0,1]; sharp cell edges."""
    v = 0.0
    for k, cell in enumerate((0.40, 0.17, 0.07)):
        ix = jnp.floor(x / cell)
        iy = jnp.floor(y / cell)
        v = v + _cell_hash(ix, iy, seed + k) * (0.5 ** k)
    v = v / (1.0 + 0.5 + 0.25)
    # contrast stretch: strong cell-edge steps -> rich FAST response
    return jnp.clip(1.8 * (v - 0.5) + 0.5, 0.0, 1.0)


def _ray_grid(cam: Camera):
    """Per-pixel unit-z ray directions in the camera frame.

    With a distorted camera (TUM1-class radtan coefficients), pixel (u, v)
    physically observes the ray of its UNDISTORTED normalized coordinates —
    the renderer inverts the same model the tracker's undistort_points
    applies at extraction (Frame::UndistortKeyPoints contract), so rendered
    geometry and tracked geometry agree exactly.
    """
    H, W = cam.height, cam.width
    uu = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, axis=0)
    vv = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, axis=1)
    if cam.has_distortion():
        uv = undistort_points(cam, jnp.stack([uu, vv], axis=-1))
        dx = (uv[..., 0] - cam.cx) / cam.fx
        dy = (uv[..., 1] - cam.cy) / cam.fy
    else:
        dx = (uu - cam.cx) / cam.fx
        dy = (vv - cam.cy) / cam.fy
    return jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1)  # [H,W,3]


@dataclasses.dataclass(frozen=True)
class Plane:
    """n . x = d, textured by (x,y) coords in an in-plane basis."""

    nx: float
    ny: float
    nz: float
    d: float
    tex_seed: float


# A simple "room": back wall, floor, left wall.
ROOM = (
    Plane(0.0, 0.0, -1.0, -3.5, 1.0),   # back wall at z=3.5 (facing camera)
    Plane(0.0, -1.0, 0.0, -1.0, 2.0),   # floor at y=+1.0 (camera y points down)
    Plane(1.0, 0.0, 0.0, -2.0, 3.0),    # left wall at x=-2.0
)

# A fully closed box (all four walls + floor + ceiling): the camera can spin
# a full circuit and always sees textured geometry — the fixture for loop-
# closure trajectories (the analogue of a room-circuit TUM sequence).
ROOM_CLOSED = (
    Plane(0.0, 0.0, -1.0, -3.5, 1.0),   # back wall   z = +3.5
    Plane(0.0, 0.0, 1.0, -3.5, 4.0),    # front wall  z = -3.5
    Plane(1.0, 0.0, 0.0, -2.5, 3.0),    # left wall   x = -2.5
    Plane(-1.0, 0.0, 0.0, -2.5, 5.0),   # right wall  x = +2.5
    Plane(0.0, -1.0, 0.0, -1.0, 2.0),   # floor       y = +1.0
    Plane(0.0, 1.0, 0.0, -1.5, 6.0),    # ceiling     y = -1.5
)


def _plane_basis(n):
    """Two in-plane axes for texture coordinates."""
    a = jnp.where(jnp.abs(n[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]),
                  jnp.array([0.0, 1.0, 0.0]))
    u = jnp.cross(n, a)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(n, u)
    return u, v


@partial(jax.jit, static_argnums=(0, 4))
def render_frame(cam: Camera, T_wc, obj_center=None, obj_half: float = 0.35,
                 planes=ROOM, obj_depth_ofs: float = 1.2):
    """Render one RGB-D frame.

    Args:
      cam: static camera intrinsics.
      T_wc: [7] camera-to-world pose (camera center = t part).
      obj_center: optional [3] world position of a dynamic textured quad
        (normal facing +z_w, half-size obj_half). None disables it.
    Returns:
      gray [H,W] float32 in [0,1], depth [H,W] float32 meters (0 = invalid).
    """
    H, W = cam.height, cam.width
    d_cam = _ray_grid(cam)

    q_wc = T_wc[:4]
    o = T_wc[4:7]
    d_w = se3.quat_rotate(q_wc[None, None, :], d_cam)

    best_t = jnp.full((H, W), jnp.inf)
    best_col = jnp.zeros((H, W))

    for pl in planes:
        n = jnp.array([pl.nx, pl.ny, pl.nz])
        denom = jnp.einsum("hwc,c->hw", d_w, n)
        t = (pl.d - jnp.dot(n, o)) / jnp.where(jnp.abs(denom) < 1e-6,
                                               jnp.inf, denom)
        hit = t > 0.05
        p = o[None, None, :] + t[..., None] * d_w
        u_ax, v_ax = _plane_basis(n)
        tx = jnp.einsum("hwc,c->hw", p, u_ax)
        ty = jnp.einsum("hwc,c->hw", p, v_ax)
        col = texture(tx, ty, pl.tex_seed)
        closer = hit & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_col = jnp.where(closer, col, best_col)

    if obj_center is not None:
        # dynamic "person": capsule silhouette (body ellipse + head circle)
        # on a fronto-parallel plane — the walking-people stand-in of
        # fr3/walking_* and the detector's training distribution
        person = jnp.concatenate([obj_center,
                                  jnp.array([obj_half * 1.3, 9.0])])
        best_t, best_col = _composite_people(o, d_w, person[None, :],
                                             best_t, best_col)

    depth = jnp.where(jnp.isfinite(best_t), best_t, 0.0)
    return best_col.astype(jnp.float32), depth.astype(jnp.float32)


def person_texture(px, py, seed):
    """High-contrast two-scale stripe texture — visually distinct from the
    walls' random checker, with rich FAST response."""
    a = jnp.sin(18.0 * py + 7.1 * seed) * jnp.sin(11.0 * px + 2.3 * seed)
    b = jnp.sin(41.0 * (px + py) + 3.7 * seed)
    return jnp.clip(0.15 + 0.55 * (a > 0) + 0.25 * (b > 0), 0.0, 1.0)


def _person_mask(px, py, cx, cy, half_h):
    """Capsule silhouette in the person's plane; y points DOWN."""
    w = 0.40 * half_h
    body = (((px - cx) / w) ** 2
            + ((py - (cy + 0.28 * half_h)) / (0.72 * half_h)) ** 2) < 1.0
    hr = 0.30 * half_h
    head = ((px - cx) ** 2 + (py - (cy - 0.70 * half_h)) ** 2) < hr ** 2
    return body | head


def _composite_people(o, d_w, people, best_t, best_col):
    """Ray-cast `people` [P,5] = (cx, cy, cz, half_h, seed) into the scene
    (each on its fronto-parallel world plane z = cz). half_h <= 0 disables
    a row."""
    n = jnp.array([0.0, 0.0, -1.0])
    denom = jnp.einsum("hwc,c->hw", d_w, n)
    for i in range(people.shape[0]):
        cx, cy, cz, half_h, seed = (people[i, j] for j in range(5))
        t = (-cz - jnp.dot(n, o)) / jnp.where(jnp.abs(denom) < 1e-6,
                                              jnp.inf, denom)
        p = o[None, None, :] + t[..., None] * d_w
        inside = (_person_mask(p[..., 0], p[..., 1], cx, cy, half_h)
                  & (t > 0.05) & (half_h > 0))
        col = person_texture(p[..., 0] - cx, p[..., 1] - cy, seed)
        closer = inside & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_col = jnp.where(closer, col, best_col)
    return best_t, best_col


# ---------------------------------------------------------------------------
# Static semantic props (chair / tvmonitor / bottle stand-ins): textured
# rectangles on fronto-parallel world planes — the non-person VOC objects
# the reference routes into 3-D semantic mapping (Detector2D.cc:85-86 ->
# Detector3D::Detect -> ObjectDatabase::addObject)
# ---------------------------------------------------------------------------

PROP_BICYCLE = 2
PROP_BOTTLE = 5
PROP_BUS = 6
PROP_CAR = 7
PROP_CHAIR = 9
PROP_TABLE = 11
PROP_PLANT = 16
PROP_SOFA = 18
PROP_TRAIN = 19
PROP_TV = 20
# 10 static VOC classes as procedurally textured props (the full
# Detector2D class contract, Detector2D.cc:8-14; the remaining VOC entries
# are the animal/person dynamic classes, covered by the person capsules)
PROP_CLASSES = (PROP_BICYCLE, PROP_BOTTLE, PROP_BUS, PROP_CAR, PROP_CHAIR,
                PROP_TABLE, PROP_PLANT, PROP_SOFA, PROP_TRAIN, PROP_TV)


def prop_texture(px, py, cls, seed):
    """Per-class texture in normalized in-prop coords px, py in [-1, 1] —
    each of the 10 prop classes gets a visually distinctive procedural
    pattern (distinct spatial frequency + orientation + structure), so a
    small CNN can discriminate them the way SSDLite discriminates VOC
    appearance."""
    # chair: coarse checker grid
    grid = 0.25 + 0.6 * ((jnp.sin(14.0 * px + seed) > 0.3)
                         ^ (jnp.sin(14.0 * py + seed) > 0.3))
    # tvmonitor: bright frame + dark faintly-patterned screen
    screen = jnp.where((jnp.abs(px) > 0.8) | (jnp.abs(py) > 0.8), 0.9,
                       0.12 + 0.1 * jnp.sin(30.0 * px * py + seed))
    # bottle: fine vertical stripes
    stripes_v = 0.2 + 0.65 * (jnp.sin(60.0 * px + 3.0 * seed) > 0.0)
    # sofa: wide horizontal bands + soft seam lines
    sofa = (0.35 + 0.35 * (jnp.sin(4.5 * py + seed) > 0.0)
            + 0.15 * (jnp.sin(22.0 * py) > 0.9))
    # pottedplant: dense irregular speckle (leafy high-frequency hash)
    sp = jnp.sin(37.0 * px + seed) * jnp.sin(41.0 * py + 2.0 * seed) \
        + jnp.sin(53.0 * (px + py))
    plant = 0.15 + 0.6 * (sp > 0.4)
    # diningtable: diagonal stripes (45 degrees, medium frequency)
    table = 0.25 + 0.55 * (jnp.sin(18.0 * (px + py) + seed) > 0.0)
    # car: dark lower body + bright window band + wheel-dark corners
    wheels = (((px - 0.6) ** 2 + (py - 0.75) ** 2 < 0.06)
              | ((px + 0.6) ** 2 + (py - 0.75) ** 2 < 0.06))
    car = jnp.where(wheels, 0.05,
                    jnp.where(py < -0.1, 0.85 + 0.1 * jnp.sin(9.0 * px),
                              0.3))
    # bicycle: thin diagonal crosshatch (both orientations)
    bike = 0.2 + 0.65 * ((jnp.sin(34.0 * (px + py) + seed) > 0.85)
                         | (jnp.sin(34.0 * (px - py) + seed) > 0.85))
    # bus: bright body with a row of dark window squares up top
    win = ((jnp.sin(16.0 * px) > 0.2) & (py > -0.6) & (py < -0.1))
    bus = jnp.where(win, 0.12, 0.8 + 0.08 * jnp.sin(5.0 * py + seed))
    # train: long horizontal stripe pairs + repeated door slots
    door = (jnp.sin(9.0 * px + seed) > 0.93)
    train = jnp.where(door, 0.1,
                      0.3 + 0.5 * (jnp.sin(11.0 * py + seed) > 0.4))

    t = jnp.select(
        [cls == PROP_CHAIR, cls == PROP_TV, cls == PROP_BOTTLE,
         cls == PROP_SOFA, cls == PROP_PLANT, cls == PROP_TABLE,
         cls == PROP_CAR, cls == PROP_BICYCLE, cls == PROP_BUS,
         cls == PROP_TRAIN],
        [grid, screen, stripes_v, sofa, plant, table, car, bike, bus,
         train],
        default=stripes_v)
    return jnp.clip(t, 0.0, 1.0)


def _composite_props(o, d_w, props, best_t, best_col):
    """Ray-cast `props` [Q,7] = (cx, cy, cz, half_w, half_h, cls, seed)
    rectangles on world planes z = cz. half_h <= 0 disables a row."""
    n = jnp.array([0.0, 0.0, -1.0])
    denom = jnp.einsum("hwc,c->hw", d_w, n)
    for i in range(props.shape[0]):
        cx, cy, cz, half_w, half_h, cls, seed = (props[i, j]
                                                 for j in range(7))
        t = (-cz - jnp.dot(n, o)) / jnp.where(jnp.abs(denom) < 1e-6,
                                              jnp.inf, denom)
        p = o[None, None, :] + t[..., None] * d_w
        px = (p[..., 0] - cx) / jnp.maximum(half_w, 1e-6)
        py = (p[..., 1] - cy) / jnp.maximum(half_h, 1e-6)
        inside = ((jnp.abs(px) < 1.0) & (jnp.abs(py) < 1.0)
                  & (t > 0.05) & (half_h > 0))
        col = prop_texture(px, py, cls.astype(jnp.int32), seed)
        closer = inside & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_col = jnp.where(closer, col, best_col)
    return best_t, best_col


def prop_gt_box(cam: Camera, T_cw, prop):
    """Ground-truth pixel box (x1, y1, x2, y2) of a prop rectangle + a
    visibility flag. prop: [7] = (cx, cy, cz, half_w, half_h, cls, seed)."""
    cx, cy, cz, hw, hh = (prop[j] for j in range(5))
    corners = jnp.stack([
        jnp.stack([cx - hw, cy - hh, cz]),
        jnp.stack([cx + hw, cy - hh, cz]),
        jnp.stack([cx - hw, cy + hh, cz]),
        jnp.stack([cx + hw, cy + hh, cz])])
    pc = se3.se3_apply(T_cw[None], corners)
    z_ok = jnp.all(pc[:, 2] > 0.05) & (prop[4] > 0)
    uv = jnp.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                    cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1)
    x1 = jnp.clip(jnp.min(uv[:, 0]), 0, cam.width - 1)
    y1 = jnp.clip(jnp.min(uv[:, 1]), 0, cam.height - 1)
    x2 = jnp.clip(jnp.max(uv[:, 0]), 0, cam.width - 1)
    y2 = jnp.clip(jnp.max(uv[:, 1]), 0, cam.height - 1)
    visible = z_ok & (x2 - x1 > 2) & (y2 - y1 > 2)
    return jnp.stack([x1, y1, x2, y2]), visible


# three default props along the back wall (world coords; y points down,
# floor at y=+1)
DEFAULT_PROPS = np.array([
    [-0.85, 0.55, 3.30, 0.35, 0.42, PROP_CHAIR, 11.0],
    [0.95, -0.25, 3.35, 0.45, 0.30, PROP_TV, 23.0],
    [0.10, 0.70, 2.90, 0.08, 0.24, PROP_BOTTLE, 37.0],
], np.float32)


@partial(jax.jit, static_argnums=(0, 3))
def render_frame_people(cam: Camera, T_wc, people, planes=ROOM):
    """Render with multiple person capsules ([P,5] rows of
    (cx, cy, cz, half_h, tex_seed); half_h <= 0 disables). Returns
    (gray, depth) like render_frame — the detector-training renderer."""
    gray, depth = render_frame(cam, T_wc, None, planes=planes)
    d_cam = _ray_grid(cam)
    q_wc = T_wc[:4]
    o = T_wc[4:7]
    d_w = se3.quat_rotate(q_wc[None, None, :], d_cam)
    best_t = jnp.where(depth > 0, depth, jnp.inf)
    best_t, best_col = _composite_people(o, d_w, people, best_t, gray)
    depth = jnp.where(jnp.isfinite(best_t), best_t, 0.0)
    return best_col.astype(jnp.float32), depth.astype(jnp.float32)


@partial(jax.jit, static_argnums=(0, 4))
def render_frame_scene(cam: Camera, T_wc, people, props, planes=ROOM):
    """Full scene renderer: room planes + person capsules [P,5] + prop
    rectangles [Q,7]. Either may be a zero-row array."""
    gray, depth = render_frame(cam, T_wc, None, planes=planes)
    d_cam = _ray_grid(cam)
    q_wc = T_wc[:4]
    o = T_wc[4:7]
    d_w = se3.quat_rotate(q_wc[None, None, :], d_cam)
    best_t = jnp.where(depth > 0, depth, jnp.inf)
    best_col = gray
    if props.shape[0]:
        best_t, best_col = _composite_props(o, d_w, props, best_t, best_col)
    if people.shape[0]:
        best_t, best_col = _composite_people(o, d_w, people, best_t,
                                             best_col)
    depth = jnp.where(jnp.isfinite(best_t), best_t, 0.0)
    return best_col.astype(jnp.float32), depth.astype(jnp.float32)


def person_gt_box(cam: Camera, T_cw, person):
    """Ground-truth pixel box (x1, y1, x2, y2) of a person capsule, plus a
    visibility flag. T_cw: world->camera pose [7]."""
    cx, cy, cz, half_h = person[0], person[1], person[2], person[3]
    w = 0.40 * half_h
    corners = jnp.stack([
        jnp.stack([cx - w, cy - half_h, cz]),
        jnp.stack([cx + w, cy - half_h, cz]),
        jnp.stack([cx - w, cy + half_h, cz]),
        jnp.stack([cx + w, cy + half_h, cz])])
    pc = se3.se3_apply(T_cw[None], corners)
    z_ok = jnp.all(pc[:, 2] > 0.05) & (half_h > 0)
    uv = jnp.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                    cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1)
    x1 = jnp.clip(jnp.min(uv[:, 0]), 0, cam.width - 1)
    y1 = jnp.clip(jnp.min(uv[:, 1]), 0, cam.height - 1)
    x2 = jnp.clip(jnp.max(uv[:, 0]), 0, cam.width - 1)
    y2 = jnp.clip(jnp.max(uv[:, 1]), 0, cam.height - 1)
    visible = z_ok & (x2 - x1 > 2) & (y2 - y1 > 2)
    return jnp.stack([x1, y1, x2, y2]), visible


def make_trajectory(n_frames: int, dtype=jnp.float32):
    """Smooth sinusoidal camera walk (T_wc per frame), [N,7]."""
    s = jnp.linspace(0.0, 1.0, n_frames, dtype=dtype)
    tx = 0.6 * jnp.sin(2 * jnp.pi * s)
    ty = 0.15 * jnp.sin(4 * jnp.pi * s + 1.0)
    tz = 0.3 * jnp.sin(2 * jnp.pi * s + 0.5)
    wy = 0.10 * jnp.sin(2 * jnp.pi * s)        # yaw
    wx = 0.05 * jnp.sin(4 * jnp.pi * s + 0.3)  # pitch
    xi = jnp.stack([tx, ty, tz,
                    wx, wy, jnp.zeros_like(s)], axis=-1)
    return jax.vmap(se3.se3_exp)(xi)


def object_track(n_frames: int, dtype=jnp.float32):
    """World path of the dynamic person: strafes left-right close to the
    camera (a large, feature-rich disturbance like fr3/walking_*'s people)."""
    s = jnp.linspace(0.0, 1.0, n_frames, dtype=dtype)
    cx = 0.9 * jnp.sin(2 * jnp.pi * s * 1.5)
    cy = 0.15 * jnp.ones_like(s)
    cz = 2.0 * jnp.ones_like(s)
    return jnp.stack([cx, cy, cz], axis=-1)


def walker_tracks(n_frames: int, n_walkers: int = 3, depth0: float = 1.8,
                  half_h: float = 0.55, dtype=jnp.float32):
    """World paths of several INDEPENDENT walkers, [N, P, 5] people rows
    (cx, cy, cz, half_h, tex_seed).

    The fr3/walking_* analogue: each walker strafes on its own phase,
    speed, and depth band, with a slight depth oscillation, so at most
    frames one or more large feature-rich movers cross the view — the
    aggregate occludes a large image fraction (measured by
    `person_coverage`)."""
    s = jnp.linspace(0.0, 1.0, n_frames, dtype=dtype)
    rows = []
    for p in range(n_walkers):
        speed = 1.2 + 0.5 * p
        phase = 2.4 * p
        cx = (0.55 + 0.35 * (p % 2)) * jnp.sin(
            2 * jnp.pi * s * speed + phase)
        cy = 0.15 + 0.05 * jnp.sin(2 * jnp.pi * s * 0.7 + p)
        cz = (depth0 + 0.5 * p) + 0.25 * jnp.sin(
            2 * jnp.pi * s * 0.9 + 1.3 * p)
        rows.append(jnp.stack(
            [cx, cy, cz, jnp.full_like(s, half_h * 1.3),
             jnp.full_like(s, 9.0 + 4.0 * p)], axis=-1))
    return jnp.stack(rows, axis=1)                   # [N, P, 5]


def make_walk_trajectory(n_frames: int, yaw_amp: float = 0.35,
                         dtype=jnp.float32):
    """Sinusoidal walk with FAST ROTATION: peak yaw rate ~2 deg/frame at
    30 FPS (fr3-class hand-held motion), on top of the translation sweep
    of make_trajectory."""
    s = jnp.linspace(0.0, 1.0, n_frames, dtype=dtype)
    tx = 0.6 * jnp.sin(2 * jnp.pi * s)
    ty = 0.15 * jnp.sin(4 * jnp.pi * s + 1.0)
    tz = 0.3 * jnp.sin(2 * jnp.pi * s + 0.5)
    wy = yaw_amp * jnp.sin(3 * jnp.pi * s)
    wx = 0.08 * jnp.sin(4 * jnp.pi * s + 0.3)
    xi = jnp.stack([tx, ty, tz, wx, wy, jnp.zeros_like(s)], axis=-1)
    return jax.vmap(se3.se3_exp)(xi)


def person_coverage(cam: Camera, T_wc, people, planes=ROOM) -> float:
    """Fraction of the image covered by person capsules at one frame
    (renderer-exact: compares scene depth with and without people)."""
    g0, d0 = render_frame(cam, T_wc, planes=planes)
    _, d1 = render_frame_people(cam, T_wc, people, planes=planes)
    return float(jnp.mean((jnp.abs(d1 - d0) > 1e-4).astype(jnp.float32)))


def make_circuit_trajectory(n_frames: int, radius: float = 1.0,
                            loops: float = 1.0, dtype=jnp.float32):
    """Closed-circuit camera path inside ROOM_CLOSED: the camera walks a
    circle of `radius` in the x-z plane, always facing outward, completing
    `loops` full revolutions — frame 0 and frame N-1 share a viewpoint
    (the loop-closure fixture)."""
    s = jnp.linspace(0.0, loops, n_frames, dtype=dtype)
    theta = 2 * jnp.pi * s
    # camera at angle theta faces outward: camera +z (view dir) points away
    # from the circle center -> yaw = theta about +y
    half = theta / 2.0
    q = jnp.stack([jnp.cos(half), jnp.zeros_like(half),
                   jnp.sin(half), jnp.zeros_like(half)], axis=-1)
    # outward direction for yaw theta: R(theta) @ [0,0,1]
    out_dir = jnp.stack([jnp.sin(theta), jnp.zeros_like(theta),
                         jnp.cos(theta)], axis=-1)
    t = radius * out_dir
    t = t + jnp.stack([jnp.zeros_like(s),
                       0.05 * jnp.sin(6 * jnp.pi * s),   # slight bob
                       jnp.zeros_like(s)], axis=-1)
    return jax.vmap(se3.se3_make)(q, t)


class SyntheticSequence:
    """Host-side iterator mimicking a dataset: (gray, depth, gt_T_wc)."""

    def __init__(self, cam: Camera, n_frames: int = 60, dynamic: bool = False,
                 planes=ROOM, poses=None, props=None, people=None):
        self.cam = cam
        self.n_frames = n_frames
        self.dynamic = dynamic
        self.planes = planes
        # T_wc (camera-to-world) per frame
        self.poses = poses if poses is not None else make_trajectory(n_frames)
        self.obj = object_track(n_frames) if dynamic else None
        # explicit multi-walker tracks [N, P, 5] (walker_tracks) override
        # the single `dynamic` person
        self.people = jnp.asarray(people) if people is not None else None
        # static semantic props: True -> DEFAULT_PROPS, or an explicit
        # [Q,7] array of (cx, cy, cz, half_w, half_h, cls, seed) rows
        self.props = (jnp.asarray(DEFAULT_PROPS) if props is True
                      else (jnp.asarray(props) if props is not None
                            else None))
        self.timestamps = np.arange(n_frames, dtype=np.float64) / 30.0

    def __len__(self):
        return self.n_frames

    def frame(self, i: int):
        if self.people is not None:
            props = (self.props if self.props is not None
                     else jnp.zeros((0, 7), jnp.float32))
            return render_frame_scene(self.cam, self.poses[i],
                                      self.people[i], props,
                                      planes=self.planes)
        if self.props is not None:
            if self.dynamic:
                c = self.obj[i]
                people = jnp.concatenate(
                    [c, jnp.array([0.55 * 1.3, 9.0])])[None, :]
            else:
                people = jnp.zeros((0, 5), jnp.float32)
            return render_frame_scene(self.cam, self.poses[i], people,
                                      self.props, planes=self.planes)
        obj_c = self.obj[i] if self.dynamic else None
        gray, depth = render_frame(self.cam, self.poses[i], obj_c,
                                   obj_half=0.55, planes=self.planes)
        return gray, depth

    def gt_prop_box(self, i: int, q: int):
        """GT pixel box + visibility of prop q at frame i."""
        return prop_gt_box(self.cam, se3.se3_inverse(self.poses[i]),
                           self.props[q])

    def frame_stereo(self, i: int):
        """Rectified stereo pair (gray_left, gray_right, depth_left): the
        right camera sits baseline = bf/fx to the left camera's +x
        (the rectified-pair geometry of Frame.cc:87-127)."""
        b = self.cam.bf / self.cam.fx
        T_wc_l = self.poses[i]
        T_wc_r = se3.se3_compose(
            T_wc_l, se3.se3_make(jnp.array([1.0, 0, 0, 0]),
                                 jnp.array([b, 0.0, 0.0])))
        obj_c = self.obj[i] if self.dynamic else None
        gl, dl = render_frame(self.cam, T_wc_l, obj_c, obj_half=0.55,
                              planes=self.planes)
        gr, _ = render_frame(self.cam, T_wc_r, obj_c, obj_half=0.55,
                             planes=self.planes)
        return gl, gr, dl

    def gt_pose_wc(self, i: int):
        return self.poses[i]

    def gt_pose_cw(self, i: int):
        return se3.se3_inverse(self.poses[i])
