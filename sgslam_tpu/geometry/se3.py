"""SE(3) / Sim(3) Lie-group operations as batched, jittable array functions.

Replaces the reference's `Converter` (cv::Mat <-> Eigen <-> g2o::SE3Quat/Sim3
conversions; /root/reference/src/sg-slam/include/Converter.h:35-52) and the pose
algebra embedded in g2o's vertex types
(Thirdparty/g2o/g2o/types/types_six_dof_expmap.h, types_seven_dof_expmap.h).

Representations (all broadcastable over leading batch dims):
  quaternion  q : [..., 4]  (w, x, y, z), unit norm
  SE3   pose  T : [..., 7]  = (qw, qx, qy, qz, tx, ty, tz)
  Sim3  pose  S : [..., 8]  = (qw, qx, qy, qz, tx, ty, tz, s)
  se3  twist xi : [..., 6]  = (v, w)   translation part first (g2o convention)
  sim3 twist    : [..., 7]  = (v, w, sigma)

All functions are pure, dtype-preserving, and safe at the theta -> 0 limit via
Taylor guards (jnp.where with safe denominators), so they are differentiable and
jit/vmap/shard_map friendly.
"""

import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_mul(a, b):
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    w = q[..., :1]
    u = q[..., 1:]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_to_mat(q):
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """Rotation matrix [..., 3, 3] -> unit quaternion, branchless Shepperd."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Four candidate decompositions; pick the numerically largest pivot.
    s0 = safe_sqrt(1.0 + tr)             # pivot w
    q0 = jnp.stack([0.5 * s0, (m21 - m12) / (2 * s0), (m02 - m20) / (2 * s0),
                    (m10 - m01) / (2 * s0)], axis=-1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22)  # pivot x
    q1 = jnp.stack([(m21 - m12) / (2 * s1), 0.5 * s1, (m01 + m10) / (2 * s1),
                    (m02 + m20) / (2 * s1)], axis=-1)
    s2 = safe_sqrt(1.0 - m00 + m11 - m22)  # pivot y
    q2 = jnp.stack([(m02 - m20) / (2 * s2), (m01 + m10) / (2 * s2), 0.5 * s2,
                    (m12 + m21) / (2 * s2)], axis=-1)
    s3 = safe_sqrt(1.0 - m00 - m11 + m22)  # pivot z
    q3 = jnp.stack([(m10 - m01) / (2 * s3), (m02 + m20) / (2 * s3),
                    (m12 + m21) / (2 * s3), 0.5 * s3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11],
                       axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, axis=-1),
                            axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(w):
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_exp_quat(w):
    """Rotation vector [..., 3] -> unit quaternion."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    half = 0.5 * theta
    small = theta < 1e-4
    # sin(t/2)/t with Taylor fallback: 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0,
                  jnp.sin(half) / jnp.maximum(theta, _EPS))
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([cw, k * w], axis=-1))


def so3_log(q):
    """Unit quaternion -> rotation vector [..., 3]."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-6
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS),
                  theta / jnp.maximum(vn, _EPS))
    return k * v


def _rot_coeffs(theta2):
    """A = sin t / t, B = (1-cos t)/t^2, C = (t - sin t)/t^3, Taylor-guarded.

    The guard threshold is f32-aware: the C form cancels (t - sin t ~ t^3/6
    vs absolute f32 error ~eps*t), so the series takes over at t < 0.01
    where its own error (~t^2/120 relative) is still ~1e-6.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-2
    a = jnp.where(small, 1.0 - theta2 / 6.0,
                  jnp.sin(theta) / jnp.maximum(theta, _EPS))
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS))
    return a, b, c


# ---------------------------------------------------------------------------
# SE(3):  T = (q, t),  x -> R x + t
# ---------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return jnp.array([1, 0, 0, 0, 0, 0, 0], dtype=dtype)


def se3_quat(T):
    return T[..., :4]


def se3_trans(T):
    return T[..., 4:7]


def se3_make(q, t):
    return jnp.concatenate([q, t], axis=-1)


def se3_apply(T, x):
    return quat_rotate(T[..., :4], x) + T[..., 4:7]


def se3_compose(A, B):
    """(A*B) x = A(B(x))."""
    q = quat_mul(A[..., :4], B[..., :4])
    t = quat_rotate(A[..., :4], B[..., 4:7]) + A[..., 4:7]
    return se3_make(quat_normalize(q), t)


def se3_inverse(T):
    qi = quat_conj(T[..., :4])
    ti = -quat_rotate(qi, T[..., 4:7])
    return se3_make(qi, ti)


def se3_exp(xi):
    """Twist [..., 6] = (v, w) -> SE3 [..., 7]. t = V(w) v."""
    v, w = xi[..., :3], xi[..., 3:6]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    _, b, c = _rot_coeffs(theta2)
    wx = hat(w)
    wxv = jnp.einsum("...ij,...j->...i", wx, v)
    wxwxv = jnp.einsum("...ij,...j->...i", wx, wxv)
    t = v + b * wxv + c * wxwxv
    return se3_make(so3_exp_quat(w), t)


def se3_log(T):
    """SE3 -> twist (v, w) with exp(log(T)) == T."""
    w = so3_log(T[..., :4])
    t = T[..., 4:7]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    a, b, _ = _rot_coeffs(theta2)
    # V^{-1} = I - 1/2 W + coef * W^2,  coef = (1 - a/(2b)) / theta^2.
    # The general form cancels catastrophically in f32 (a/(2b) -> 1 with
    # error ~eps while theta^2 -> 0), so switch to the Taylor series
    # 1/12 + theta^2/720 well before that: at theta < 0.05 the series error
    # (~theta^4/30240) is below f32 eps while the cancellation error
    # (~eps/theta^2) is already 4e-5 and exploding.
    small = theta2 < 2.5e-3
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                     (1.0 - a / jnp.maximum(2.0 * b, _EPS))
                     / jnp.maximum(theta2, _EPS))
    wx = hat(w)
    wxt = jnp.einsum("...ij,...j->...i", wx, t)
    wxwxt = jnp.einsum("...ij,...j->...i", wx, wxt)
    v = t - 0.5 * wxt + coef * wxwxt
    return jnp.concatenate([v, w], axis=-1)


def se3_to_matrix(T):
    m = jnp.zeros(T.shape[:-1] + (4, 4), dtype=T.dtype)
    m = m.at[..., :3, :3].set(quat_to_mat(T[..., :4]))
    m = m.at[..., :3, 3].set(T[..., 4:7])
    m = m.at[..., 3, 3].set(1.0)
    return m


def se3_from_matrix(m):
    return se3_make(mat_to_quat(m[..., :3, :3]), m[..., :3, 3])


# ---------------------------------------------------------------------------
# Sim(3):  S = (q, t, s),  x -> s R x + t
# Used by loop closing / essential-graph optimization
# (reference: Thirdparty/g2o/g2o/types/types_seven_dof_expmap.h, sim3.h).
# ---------------------------------------------------------------------------

def sim3_identity(dtype=jnp.float32):
    return jnp.array([1, 0, 0, 0, 0, 0, 0, 1], dtype=dtype)


def sim3_make(q, t, s):
    return jnp.concatenate([q, t, s[..., None] if s.ndim < q.ndim else s],
                           axis=-1)


def sim3_scale(S):
    return S[..., 7]


def sim3_apply(S, x):
    return S[..., 7:8] * quat_rotate(S[..., :4], x) + S[..., 4:7]


def sim3_compose(A, B):
    q = quat_normalize(quat_mul(A[..., :4], B[..., :4]))
    t = A[..., 7:8] * quat_rotate(A[..., :4], B[..., 4:7]) + A[..., 4:7]
    s = A[..., 7:8] * B[..., 7:8]
    return jnp.concatenate([q, t, s], axis=-1)


def sim3_inverse(S):
    qi = quat_conj(S[..., :4])
    si = 1.0 / jnp.maximum(S[..., 7:8], _EPS)
    ti = -si * quat_rotate(qi, S[..., 4:7])
    return jnp.concatenate([qi, ti, si], axis=-1)


def sim3_from_se3(T, s=None):
    s = jnp.ones(T.shape[:-1] + (1,), T.dtype) if s is None else s
    return jnp.concatenate([T[..., :4], T[..., 4:7], s], axis=-1)


def sim3_to_se3(S):
    """Drop scale (divide translation is NOT applied; caller decides)."""
    return S[..., :7]


def sim3_exp(xi):
    """sim3 twist [..., 7] = (v, w, sigma) -> Sim3 [..., 8].

    t = W v with W from Strasdat's "Scale Drift-Aware Large Scale Monocular
    SLAM" appendix; guarded for small theta and small sigma.
    """
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    s = jnp.exp(sigma)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    wx = hat(w)
    wx2 = jnp.einsum("...ij,...jk->...ik", wx, wx)

    eps = 1e-5
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps

    # Coefficients of W = A*I + B*wx + C*wx2 (theta-normalized forms)
    sig_safe = jnp.where(sig_small, jnp.ones_like(sigma), sigma)
    th_safe = jnp.where(th_small, jnp.ones_like(theta), theta)

    # A = (s - 1)/sigma  (-> 1 + sigma/2 as sigma -> 0)
    A = jnp.where(sig_small, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  (s - 1.0) / sig_safe)

    # For B and C we need mixed limits. General case (both non-small):
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    den = jnp.maximum(sigma * sigma + theta2, _EPS)
    B_gen = (a_ * sigma + (1.0 - b_) * th_safe) / (th_safe * den)
    C_gen = (A - ((b_ - 1.0) * sigma + a_ * th_safe) / den) / jnp.maximum(theta2, _EPS)

    # sigma -> 0 limits: B -> (1-cos t)/t^2, C -> (t - sin t)/t^3
    _, b0, c0 = _rot_coeffs(theta2)
    # theta -> 0 limits (sigma finite): B -> (s(1? ) ...) use series:
    #   B -> ((sigma-1)s + 1)/sigma^2, C -> (s(sigma^2/2 - sigma + 1) - 1)/sigma^3... use stable forms:
    B_th0 = jnp.where(sig_small, b0, ((sig_safe - 1.0) * s + 1.0) / (sig_safe * sig_safe))
    C_th0 = jnp.where(
        sig_small, c0,
        (s * (0.5 * sig_safe * sig_safe - sig_safe + 1.0) - 1.0)
        / (sig_safe * sig_safe * sig_safe))

    B = jnp.where(th_small, B_th0, jnp.where(sig_small, b0, B_gen))
    C = jnp.where(th_small, C_th0, jnp.where(sig_small, c0, C_gen))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), wx.shape)
    W = A[..., None] * eye + B[..., None] * wx + C[..., None] * wx2
    t = jnp.einsum("...ij,...j->...i", W, v)
    return jnp.concatenate([so3_exp_quat(w), t, s], axis=-1)


def sim3_log(S):
    """Sim3 -> twist (v, w, sigma); inverse of sim3_exp (numerically)."""
    w = so3_log(S[..., :4])
    s = S[..., 7:8]
    sigma = jnp.log(jnp.maximum(s, _EPS))
    # Rebuild W and solve W v = t (3x3 solve, batched).
    xi_ws = jnp.concatenate([jnp.zeros_like(w), w, sigma], axis=-1)
    # Reconstruct W by calling the coefficient path of sim3_exp on basis vectors.
    eye = jnp.eye(3, dtype=S.dtype)
    cols = []
    for i in range(3):
        e = jnp.broadcast_to(eye[i], w.shape)
        xi_i = jnp.concatenate([e, w, sigma], axis=-1)
        cols.append(sim3_exp(xi_i)[..., 4:7])
    W = jnp.stack(cols, axis=-1)  # [..., 3, 3] with W e_i as columns
    v = jnp.linalg.solve(W, S[..., 4:7, None])[..., 0]
    return jnp.concatenate([v, w, sigma], axis=-1)
