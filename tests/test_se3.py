import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdvo_tpu.geometry import se3
from sdvo_tpu.geometry.se3 import SE3


def random_tau(rng, n=16, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale)


def test_exp_log_roundtrip(rng):
    tau = random_tau(rng)
    T = se3.exp(tau)
    tau2 = se3.log(T)
    np.testing.assert_allclose(tau, tau2, atol=1e-9)


def test_exp_small_angle(rng):
    tau = random_tau(rng, scale=1e-10)
    T = se3.exp(tau)
    np.testing.assert_allclose(se3.log(T), tau, atol=1e-12)
    # gradient is NaN-free at zero
    g = jax.jacobian(lambda t: se3.exp(t).translation.sum())(jnp.zeros(6))
    assert np.all(np.isfinite(g))


def test_log_near_pi(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-7, np.pi - 1e-4, 3.141]:
        omega = jnp.asarray(axis * theta)
        R = se3.so3_exp(omega)
        w = se3.so3_log(R)
        R2 = se3.so3_exp(w)
        np.testing.assert_allclose(R, R2, atol=1e-6)


def test_compose_inverse(rng):
    A = se3.exp(random_tau(rng))
    B = se3.exp(random_tau(rng))
    C = A.compose(B)
    np.testing.assert_allclose(
        C.as_matrix(), A.as_matrix() @ B.as_matrix(), atol=1e-12
    )
    I = A.compose(A.inverse())
    np.testing.assert_allclose(I.rotation, np.broadcast_to(np.eye(3), I.rotation.shape), atol=1e-12)
    np.testing.assert_allclose(I.translation, 0.0, atol=1e-12)


def test_apply_matches_matrix(rng):
    T = se3.exp(random_tau(rng, n=1))
    p = jnp.asarray(rng.normal(size=(5, 3)))
    out = SE3(T.rotation[0], T.translation[0]).apply(p)
    hom = np.concatenate([p, np.ones((5, 1))], axis=-1)
    expected = (np.asarray(T.as_matrix())[0] @ hom.T).T[:, :3]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_adjoint_identity(rng):
    """Ad(T) tau == log(T exp(tau) T^-1) for small tau."""
    T = se3.exp(random_tau(rng, n=1))[0] if False else None
    tau1 = random_tau(rng, n=1)[0] * 0.1
    A = se3.exp(random_tau(rng, n=1))
    A = SE3(A.rotation[0], A.translation[0])
    lhs = A.adjoint() @ tau1
    rhs = se3.log(A.compose(se3.exp(tau1)).compose(A.inverse()))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_exp_matches_expm(rng):
    from scipy.linalg import expm

    tau = np.asarray(random_tau(rng, n=8))
    for t in tau:
        up, om = t[:3], t[3:]
        xi = np.zeros((4, 4))
        xi[:3, :3] = np.asarray(se3.hat(jnp.asarray(om)))
        xi[:3, 3] = up
        expected = expm(xi)
        got = np.asarray(se3.exp(jnp.asarray(t)).as_matrix())
        np.testing.assert_allclose(got, expected, atol=1e-9)


def test_relative_and_center(rng):
    T_ref = se3.exp(random_tau(rng, n=1))
    T_ref = SE3(T_ref.rotation[0], T_ref.translation[0])
    T_cur = se3.exp(random_tau(rng, n=1))
    T_cur = SE3(T_cur.rotation[0], T_cur.translation[0])
    T_rel = se3.relative(T_ref, T_cur)
    np.testing.assert_allclose(
        T_rel.compose(T_ref).as_matrix(), T_cur.as_matrix(), atol=1e-10
    )
    c = se3.camera_center(T_ref)
    np.testing.assert_allclose(T_ref.apply(c), 0.0, atol=1e-10)


def test_jit_and_vmap(rng):
    tau = random_tau(rng, n=32)
    f = jax.jit(lambda t: se3.log(se3.exp(t)))
    np.testing.assert_allclose(f(tau), tau, atol=1e-9)
    g = jax.vmap(lambda t: se3.exp(t).translation)(tau)
    assert g.shape == (32, 3)
