"""Oracle tests for the fused extraction->RBF-cross-covariance kernel
(ops/pallas_cross.py): exact-value and exact-gradient parity with the XLA
path it replaces (`conv_gp/kernels.py:106-133` semantics) across shapes /
strides / dilations, both kernel classes, plus full-model ELBO+grad
invariance.  Runs the REAL kernels in Pallas interpret mode on CPU (the
TPU lowering is exercised by bench.py / the verify skill on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcgp_tpu.models.base_kernels import RBF
from deepcgp_tpu.models.conv_kernels import AdditivePatchKernel, ConvKernel
from deepcgp_tpu.models.views import FullView
from deepcgp_tpu.ops import pallas_cross

GEOMS = [
    # (H, W, C, f, s, d, M) — flagship last layer, digits last layer,
    # stride/dilation coverage.
    (10, 10, 10, 5, 1, 1, 24),
    (8, 8, 1, 3, 1, 1, 16),
    (9, 11, 3, 3, 2, 1, 10),
    (12, 12, 2, 3, 1, 2, 12),
]


def _setup(H, W, C, f, s, d, M, cls, seed=0):
    rng = np.random.RandomState(seed)
    view = FullView(input_size=(H, W), filter_size=f, feature_maps=C,
                    stride=s, dilation=d)
    base = RBF.create(variance=1.3, lengthscales=0.9, dtype=jnp.float64)
    w = jnp.asarray(rng.rand(view.patch_count) + 0.5)
    k = cls.create(base, view, patch_weights=w, dtype=jnp.float64)
    N = 6
    X = jnp.asarray(rng.randn(N, H * W * C))
    Z = jnp.asarray(rng.randn(M, view.patch_length))
    return k, X, Z


@pytest.mark.parametrize('cls', [ConvKernel, AdditivePatchKernel])
@pytest.mark.parametrize('H,W,C,f,s,d,M', GEOMS)
def test_value_parity(H, W, C, f, s, d, M, cls, monkeypatch):
    k, X, Z = _setup(H, W, C, f, s, d, M, cls)
    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '1')
    assert pallas_cross.kernel_supported(k)
    kzx1, kd1 = k.Kzx_NM_and_Kdiag(Z, X)
    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '0')
    assert not pallas_cross.kernel_supported(k)
    kzx2, kd2 = k.Kzx_NM_and_Kdiag(Z, X)
    np.testing.assert_allclose(np.asarray(kzx1), np.asarray(kzx2),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(kd1), np.asarray(kd2),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('cls', [ConvKernel, AdditivePatchKernel])
@pytest.mark.parametrize('H,W,C,f,s,d,M', GEOMS[:2])
def test_grad_parity(H, W, C, f, s, d, M, cls, monkeypatch):
    """Gradients w.r.t. EVERY differentiable input (image, Z, raw kernel
    params, patch weights) agree with the XLA path at f64 tolerance.
    Clamp-boundary note: exact-diagonal patch pairs sit at max(d2, 0)'s
    kink, but their net patch gradient cancels identically in both
    implementations (dpn and dG contributions are equal and opposite), so
    the comparison is well-posed."""
    k, X, Z = _setup(H, W, C, f, s, d, M, cls, seed=1)
    rng = np.random.RandomState(2)
    ckzx = jnp.asarray(rng.randn(X.shape[0], M))
    ckd = jnp.asarray(rng.randn(X.shape[0]))

    def loss(kernel, Z_, X_):
        kzx, kd = kernel.Kzx_NM_and_Kdiag(Z_, X_)
        return jnp.sum(kzx * ckzx) + jnp.sum(kd * ckd)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))
    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '1')
    g1 = grad_fn(k, Z, X)
    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '0')
    g2 = grad_fn(k, Z, X)
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves2 = jax.tree_util.tree_leaves(g2)
    assert len(leaves1) == len(leaves2) and len(leaves1) >= 5
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_supported_gates(monkeypatch):
    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '1')
    view = FullView(input_size=(10, 10), filter_size=5, feature_maps=10,
                    stride=1)
    base_ard = RBF.create(variance=1.0, lengthscales=1.0, ard_dim=250,
                          dtype=jnp.float64)
    k_ard = ConvKernel.create(base_ard, view, dtype=jnp.float64)
    assert not pallas_cross.kernel_supported(k_ard)      # ARD lengthscales
    base = RBF.create(variance=1.0, lengthscales=1.0, dtype=jnp.float64)
    k = ConvKernel.create(base, view, dtype=jnp.float64)
    assert pallas_cross.kernel_supported(k)
    assert pallas_cross.supported_for(k, 384)
    # A VMEM-busting geometry is refused.
    big = FullView(input_size=(128, 128), filter_size=9, feature_maps=8,
                   stride=1)
    k_big = ConvKernel.create(base, big, dtype=jnp.float64)
    assert not pallas_cross.kernel_supported(k_big)


@pytest.mark.slow
def test_last_layer_elbo_invariant_fused(monkeypatch):
    """Full-model ELBO + grads agree with the fused cross kernel on vs off
    (the seam bench.py's flagship exercises on hardware)."""
    from deepcgp_tpu.models.builder import BuilderFlags, build_model

    rng = np.random.RandomState(4)
    X = rng.randn(24, 10, 10, 3).astype(np.float64)
    Y = rng.randint(0, 10, size=(24, 1))
    flags = BuilderFlags(M='8,8', feature_maps='2', filter_sizes='3,3',
                         strides='2,1', num_samples=2, batch_size=8)

    def elbo_and_grads():
        model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                            dtype=jnp.float64)
        loss, grads = jax.value_and_grad(
            lambda m: -m.elbo(jnp.asarray(X.reshape(24, -1)),
                              jnp.asarray(Y), jax.random.PRNGKey(1)))(model)
        return loss, grads

    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '1')
    l1, g1 = elbo_and_grads()
    monkeypatch.setenv('DEEPCGP_PALLAS_CROSS', '0')
    l2, g2 = elbo_and_grads()
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
