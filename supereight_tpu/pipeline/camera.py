"""Pinhole camera matrices and SE(3) utilities.

Reference: `se_denseslam/include/se/commons.h:255-273` (getCameraMatrix /
getInverseCameraMatrix) and the Sophus SE3 exp used by the ICP pose update
(`se_denseslam/src/tracking.cpp:310`).  All functions are pure jnp and
jit-safe; matrices are 4x4 float32 (world <- camera convention matches the
reference: ``pose`` maps camera coordinates to world coordinates).
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_matrix(k) -> jnp.ndarray:
    """4x4 intrinsics from (fx, fy, cx, cy); negative fy handles ICL-NUIM."""
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    K = jnp.zeros((4, 4), jnp.float32)
    K = K.at[0, 0].set(fx).at[0, 2].set(cx)
    K = K.at[1, 1].set(fy).at[1, 2].set(cy)
    K = K.at[2, 2].set(1.0).at[3, 3].set(1.0)
    return K


def inverse_camera_matrix(k) -> jnp.ndarray:
    fx, fy, cx, cy = k[0], k[1], k[2], k[3]
    iK = jnp.zeros((4, 4), jnp.float32)
    iK = iK.at[0, 0].set(1.0 / fx).at[0, 2].set(-cx / fx)
    iK = iK.at[1, 1].set(1.0 / fy).at[1, 2].set(-cy / fy)
    iK = iK.at[2, 2].set(1.0).at[3, 3].set(1.0)
    return iK


def _hat(w):
    """Skew-symmetric matrix of a 3-vector."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros((), jnp.float32)
    return jnp.array([[z, -wz, wy], [wz, z, -wx], [-wy, wx, z]], jnp.float32)


def se3_exp(twist) -> jnp.ndarray:
    """SE(3) exponential of a 6-vector ``[v, w]`` (translation first, matching
    the ICP Jacobian layout J[0:3]=n, J[3:6]=p x n of `tracking.cpp:291-298`).

    Closed-form Rodrigues with small-angle Taylor fallback; branch-free via
    ``jnp.where`` so it stays jittable.
    """
    v = twist[:3]
    w = twist[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2)
    small = theta < 1e-6

    # sin(t)/t, (1-cos t)/t^2, (t - sin t)/t^3 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta))

    W = _hat(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=jnp.float32)
    R = I + a * W + b * W2
    V = I + b * W + c * W2
    t = V @ v

    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def transform_points(T, p):
    """Apply a 4x4 homogeneous transform to points [..., 3]."""
    return jnp.einsum("ij,...j->...i", T[:3, :3], p) + T[:3, 3]


def rotate_vectors(T, v):
    return jnp.einsum("ij,...j->...i", T[:3, :3], v)


def inverse_pose(T) -> jnp.ndarray:
    """Closed-form SE(3) inverse ``[R^T, -R^T t]`` (cheaper and better
    conditioned than a general 4x4 inverse)."""
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=jnp.float32)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def pose_from_translation(t) -> jnp.ndarray:
    T = jnp.eye(4, dtype=jnp.float32)
    return T.at[:3, 3].set(jnp.asarray(t, jnp.float32))
