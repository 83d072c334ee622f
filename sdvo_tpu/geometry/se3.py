"""Batched SE(3) Lie group on JAX arrays.

From-scratch replacement for Sophus (``include/frame.hpp:19`` uses
``Sophus::SE3d`` for every pose; image alignment updates poses right-multiply
via ``pose * SE3::exp(-dx)``, ``src/image_alignment.cpp:372-380``).

Representation: rotation matrix ``(..., 3, 3)`` + translation ``(..., 3)``,
packed in a NamedTuple pytree so poses flow through ``jit``/``vmap``/``scan``.
Tangent convention matches Sophus: ``tau = [upsilon, omega]`` (translation
first), ``exp(tau) = (exp(omega^), V(omega) upsilon)``.

All branches use the "double-where" pattern so gradients stay NaN-free at the
small-angle singularity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class SE3(NamedTuple):
    """A (batch of) rigid transform(s): ``x_out = R @ x + t``."""

    rotation: jax.Array  # (..., 3, 3)
    translation: jax.Array  # (..., 3)

    @property
    def batch_shape(self):
        return self.translation.shape[:-1]

    @property
    def dtype(self):
        return self.translation.dtype

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return SE3(R, t)

    @staticmethod
    def from_matrix(T: jax.Array) -> "SE3":
        """From (..., 4, 4) or (..., 3, 4) homogeneous matrices."""
        return SE3(T[..., :3, :3], T[..., :3, 3])

    # -- conversions --------------------------------------------------------
    def as_matrix(self) -> jax.Array:
        """(..., 4, 4) homogeneous matrix."""
        bottom = jnp.zeros(self.batch_shape + (1, 4), dtype=self.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.rotation, self.translation[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def matrix3x4(self) -> jax.Array:
        """(..., 3, 4) — the reference's ``Sophus::SE3::matrix3x4`` used for
        DLT triangulation (src/algorithm.cpp:634-647) and pose output
        (src/system.cpp:635-644)."""
        return jnp.concatenate([self.rotation, self.translation[..., None]], axis=-1)

    # -- group ops ----------------------------------------------------------
    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other (apply ``other`` first)."""
        R = self.rotation @ other.rotation
        t = jnp.einsum("...ij,...j->...i", self.rotation, other.translation) + self.translation
        return SE3(R, t)

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return self.compose(other)
        return self.apply(other)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.rotation, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.translation))

    def apply(self, points: jax.Array) -> jax.Array:
        """Transform points (..., 3) (broadcasts over leading dims)."""
        return jnp.einsum("...ij,...j->...i", self.rotation, points) + self.translation

    def rotate(self, vecs: jax.Array) -> jax.Array:
        return jnp.einsum("...ij,...j->...i", self.rotation, vecs)

    def adjoint(self) -> jax.Array:
        """(..., 6, 6) adjoint: Ad(T) [u, w] = [R u + t x R w, R w]."""
        R = self.rotation
        tx = hat(self.translation)
        top = jnp.concatenate([R, tx @ R], axis=-1)
        bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def normalize(self) -> "SE3":
        """Re-orthonormalize R via SVD (guards drift after many compositions)."""
        U, _, Vt = jnp.linalg.svd(self.rotation)
        det = jnp.linalg.det(U @ Vt)
        D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
        R = U @ (D[..., :, None] * Vt)
        return SE3(R, self.translation)


def hat(w: jax.Array) -> jax.Array:
    """Skew operator (..., 3) -> (..., 3, 3); reference ``algorithm::hat``
    (src/algorithm.cpp:806-811)."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_theta2(theta2: jax.Array):
    """Return (is_small, theta2_safe) with theta2_safe clamped away from 0 so
    sqrt/div have finite gradients (double-where pattern)."""
    is_small = theta2 < _EPS
    theta2_safe = jnp.where(is_small, jnp.ones_like(theta2), theta2)
    return is_small, theta2_safe


def so3_exp(omega: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    is_small, theta2_safe = _safe_theta2(theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(omega)
    W2 = W @ W
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
    a = jnp.where(is_small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(is_small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3). Stable up to (but not exactly at) theta = pi."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # arccos has an INFINITE derivative at cos=1 (the identity) — exactly
    # where pose-graph residuals sit, so jacfwd through log(≈identity) would
    # be NaN.  Double-where the *input*: the small branch never reads theta,
    # its Taylor scale is expressed in c1 = 1-cosθ (θ²/6 = c1/3 + O(θ⁴)),
    # whose derivative w.r.t. R is a clean polynomial.
    is_small = cos_theta > 1.0 - 1e-6  # θ < ~1.4e-3; Taylor error O(θ⁴)
    cos_safe = jnp.where(is_small, jnp.zeros_like(cos_theta), cos_theta)
    theta = jnp.arccos(cos_safe)
    w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin_theta = jnp.sin(theta)
    near_pi = theta > jnp.pi - 1e-3
    sin_safe = jnp.where(is_small | near_pi, jnp.ones_like(sin_theta), sin_theta)
    c1 = 1.0 - cos_theta
    scale = jnp.where(is_small, 1.0 + c1 / 3.0 + c1 * c1 * (2.0 / 15.0), theta / sin_safe)
    omega_generic = scale[..., None] * w
    # Near pi the antisymmetric part vanishes; recover the axis from the exact
    # symmetric identity (R + Rᵀ - 2cosθ·I) / (2(1-cosθ)) = a aᵀ, taking the
    # row of a aᵀ with the largest diagonal (that row is a_k · a).
    sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    denom = jnp.clip(1.0 - cos_theta, 1e-9, None)
    outer = (sym - cos_theta[..., None, None] * jnp.eye(3, dtype=R.dtype)) / denom[..., None, None]
    diag = jnp.diagonal(outer, axis1=-2, axis2=-1)
    best = jnp.argmax(diag, axis=-1)
    axis = jnp.take_along_axis(outer, best[..., None, None], axis=-2)[..., 0, :]
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12, None)
    # fix sign using w (w = sin(theta)·a with sin(theta) >= 0 on [0, pi]);
    # at exactly pi the sign is inherently ambiguous (±a both valid).
    sign = jnp.where(jnp.sum(axis * w, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    omega_pi = theta[..., None] * axis * sign
    return jnp.where(near_pi[..., None], omega_pi, omega_generic)


def _left_jacobian(omega: jax.Array) -> jax.Array:
    """V(omega): integrates translation under rotation flow (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    is_small, theta2_safe = _safe_theta2(theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(omega)
    W2 = W @ W
    b = jnp.where(is_small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(is_small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _left_jacobian_inverse(omega: jax.Array) -> jax.Array:
    theta2 = jnp.sum(omega * omega, axis=-1)
    is_small, theta2_safe = _safe_theta2(theta2)
    theta = jnp.sqrt(theta2_safe)
    W = hat(omega)
    W2 = W @ W
    half_theta = 0.5 * theta
    cot = jnp.cos(half_theta) / jnp.where(is_small, jnp.ones_like(theta), jnp.sin(half_theta))
    k = jnp.where(
        is_small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - 0.5 * theta * cot) / theta2_safe,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return eye - 0.5 * W + k[..., None, None] * W2


def exp(tau: jax.Array) -> SE3:
    """se(3) exp: (..., 6) [upsilon, omega] -> SE3."""
    upsilon, omega = tau[..., :3], tau[..., 3:]
    R = so3_exp(omega)
    V = _left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return SE3(R, t)


def log(T: SE3) -> jax.Array:
    """SE3 -> (..., 6) [upsilon, omega]."""
    omega = so3_log(T.rotation)
    Vinv = _left_jacobian_inverse(omega)
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, T.translation)
    return jnp.concatenate([upsilon, omega], axis=-1)


def relative(T_ref: SE3, T_cur: SE3) -> SE3:
    """T_cur_ref = T_cur ∘ T_ref⁻¹ — the reference's
    ``algorithm::computeRelativePose`` (src/algorithm.cpp:705-709), with poses
    as world→camera maps."""
    return T_cur.compose(T_ref.inverse())


def camera_center(T_wc: SE3) -> jax.Array:
    """Camera position in world for a world→camera pose: -Rᵀ t
    (``Frame::cameraInWorld``, src/frame.cpp:116-120)."""
    return -jnp.einsum("...ji,...j->...i", T_wc.rotation, T_wc.translation)
