"""Pallas fused RBF cross-covariance kernel vs the plain-JAX/NumPy oracle.

Runs in interpret mode on the CPU test backend; the same kernel is compiled
for real on TPU when ``settings.use_pallas`` is enabled (bench flips it)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcgp_tpu.models.base_kernels import RBF
from deepcgp_tpu.ops.pallas_kernels import rbf_cross


def _oracle(x, z, variance):
    d2 = ((x[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    return variance * np.exp(-0.5 * d2)


def test_rbf_cross_matches_oracle_interpret():
    rng = np.random.RandomState(0)
    N, M, L = 70, 130, 75  # deliberately not tile-aligned
    x = rng.randn(N, L).astype(np.float32)
    z = rng.randn(M, L).astype(np.float32)
    out = np.asarray(rbf_cross(jnp.asarray(x), jnp.asarray(z),
                               jnp.asarray(2.5, jnp.float32),
                               interpret=True))
    expected = _oracle(x.astype(np.float64), z.astype(np.float64), 2.5)
    assert out.shape == (N, M)
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_rbf_cross_matches_rbf_kernel_with_lengthscales():
    rng = np.random.RandomState(1)
    N, M, L = 33, 16, 12
    x = rng.randn(N, L).astype(np.float32)
    z = rng.randn(M, L).astype(np.float32)
    kern = RBF.create(variance=5.0, lengthscales=5.0, dtype=jnp.float32)
    ls = kern.lengthscales
    out = np.asarray(rbf_cross(jnp.asarray(x) / ls, jnp.asarray(z) / ls,
                               kern.variance, interpret=True))
    expected = np.asarray(kern.K(jnp.asarray(x), jnp.asarray(z)))
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_rbf_cross_custom_vjp_matches_jax_grad():
    rng = np.random.RandomState(2)
    N, M, L = 17, 9, 7
    x = jnp.asarray(rng.randn(N, L).astype(np.float32))
    z = jnp.asarray(rng.randn(M, L).astype(np.float32))
    v = jnp.asarray(1.7, jnp.float32)
    g = jnp.asarray(rng.randn(N, M).astype(np.float32))

    def pallas_loss(x, z, v):
        return jnp.sum(rbf_cross(x, z, v, interpret=True) * g)

    def ref_loss(x, z, v):
        d2 = jnp.sum((x[:, None, :] - z[None, :, :]) ** 2, -1)
        return jnp.sum(v * jnp.exp(-0.5 * d2) * g)

    gp = jax.grad(pallas_loss, argnums=(0, 1, 2))(x, z, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, z, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
