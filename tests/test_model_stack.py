"""Tests for likelihoods, layers and the DGP core (SURVEY.md §7 stages 3-4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from deepcgp_tpu.config import settings
from deepcgp_tpu.models.base_kernels import RBF
from deepcgp_tpu.models.conv_kernels import (AdditivePatchKernel, ConvKernel,
                                             MultiOutputConvKernel)
from deepcgp_tpu.models.dgp import DGP
from deepcgp_tpu.models.layers import ConvLayer, SVGPLayer
from deepcgp_tpu.models.likelihoods import MultiClass
from deepcgp_tpu.models.mean_functions import (Conv2dMean, IdentityConv2dMean,
                                               PatchwiseConv2d, Zero)
from deepcgp_tpu.models.views import FullView, RandomPartialView
from deepcgp_tpu.ops import linalg

RNG = np.random.RandomState(42)


# ---------------------------------------------------------------- likelihood
def test_robustmax_prob_is_largest_matches_oracle():
    N, K = 11, 10
    mu = RNG.randn(N, K)
    var = RNG.rand(N, K) + 0.1
    Y = RNG.randint(0, K, size=(N, 1))
    lik = MultiClass(num_classes=K)
    got = np.asarray(lik.prob_is_largest(jnp.asarray(Y), jnp.asarray(mu),
                                         jnp.asarray(var)))[:, 0]
    want = oracle.prob_is_largest(Y, mu, var, K)
    np.testing.assert_allclose(got, want, rtol=1e-9)

    ve = np.asarray(lik.variational_expectations(
        jnp.asarray(mu), jnp.asarray(var), jnp.asarray(Y)))[:, 0]
    ve_want = oracle.multiclass_variational_expectations(Y, mu, var, K)
    np.testing.assert_allclose(ve, ve_want, rtol=1e-9)


def test_robustmax_predict_probs_sum_to_one():
    N, K = 6, 10
    mu = RNG.randn(N, K)
    var = RNG.rand(N, K) + 0.1
    lik = MultiClass(num_classes=K)
    probs, pvar = lik.predict_mean_and_var(jnp.asarray(mu), jnp.asarray(var))
    # With eps spread over the non-max classes, probabilities sum to ~1.
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=5e-3)
    assert np.all(np.asarray(pvar) >= 0)
    # Leading batch dims work too (S-sample path).
    probs_b, _ = lik.predict_mean_and_var(
        jnp.asarray(mu[None]), jnp.asarray(var[None]))
    np.testing.assert_allclose(np.asarray(probs_b)[0], np.asarray(probs))


# ------------------------------------------------------------ mean functions
def test_conv2d_mean_shapes_and_identity():
    X = jnp.asarray(RNG.randn(4, 28, 28, 1))
    m = Conv2dMean.create(3, 1, 3)
    out = m(X)
    assert out.shape == (4, 676 * 3)  # reference tests/test_mean_functions.py
    ident = IdentityConv2dMean.create(5, 1, 1)
    out2 = np.asarray(ident(X))
    # Centre-pixel copy: output equals the centre crop of the input.
    np.testing.assert_allclose(out2[..., 0], np.asarray(X)[:, 2:-2, 2:-2, 0],
                               atol=1e-12)


def test_patchwise_conv_matches_conv2d_mean():
    X = jnp.asarray(RNG.randn(10, 28, 28, 1))
    view = FullView(input_size=(28, 28), filter_size=5, feature_maps=1)
    patches = view.extract_patches_NPL(X)
    pw = PatchwiseConv2d.create(5, 1)
    out = np.asarray(pw(patches))
    assert out.shape == (10, 576)
    conv = Conv2dMean.create(5, 1, 1)
    np.testing.assert_allclose(out, np.asarray(conv(X)), atol=1e-10)

    rview = RandomPartialView(input_size=(28, 28), filter_size=5,
                              feature_maps=1, patch_count=9, seed=1)
    outr = np.asarray(pw(rview.extract_patches_NPL(X)))
    assert outr.shape == (10, 9)


# ------------------------------------------------------------- conv kernels
def _images(n=5, h=10, w=10, c=2):
    return RNG.randn(n, h, w, c)


def test_conv_kernel_matches_manual_patch_sums():
    view = FullView(input_size=(10, 10), filter_size=3, feature_maps=2,
                    stride=2)
    base = RBF.create(variance=1.5, lengthscales=2.0, dtype=jnp.float64)
    w = RNG.rand(view.patch_count) + 0.5
    kern = ConvKernel.create(base, view, patch_weights=w, dtype=jnp.float64)
    X = _images()
    X2 = _images(3)
    ND = X.reshape(5, -1)
    ND2 = X2.reshape(3, -1)

    p1 = oracle.extract_patches(X, 3, 2)   # [N, P, L]
    p2 = oracle.extract_patches(X2, 3, 2)
    P = view.patch_count
    # Full double-sum oracle (conv_gp/kernels.py:81-104).
    want = np.zeros((5, 3))
    for i in range(P):
        for j in range(P):
            want += w[i] * w[j] * oracle.rbf_K(1.5, 2.0, p1[:, i], p2[:, j])
    want /= P ** 2
    got = np.asarray(kern.K(jnp.asarray(ND), jnp.asarray(ND2)))
    np.testing.assert_allclose(got, want, rtol=1e-8)

    # Kdiag (conv_gp/kernels.py:106-115).
    want_diag = np.zeros(5)
    for n in range(5):
        Kp = oracle.rbf_K(1.5, 2.0, p1[n])
        want_diag[n] = (Kp * (w[:, None] * w[None, :])).sum() / P ** 2
    np.testing.assert_allclose(np.asarray(kern.Kdiag(jnp.asarray(ND))),
                               want_diag, rtol=1e-8)

    # Kzx (conv_gp/kernels.py:117-133).
    Z = RNG.randn(7, view.patch_length)
    want_zx = np.zeros((7, 5))
    for i in range(P):
        want_zx += w[i] * oracle.rbf_K(1.5, 2.0, Z, p1[:, i])
    want_zx /= P
    np.testing.assert_allclose(
        np.asarray(kern.Kzx(jnp.asarray(Z), jnp.asarray(ND))), want_zx,
        rtol=1e-8)


def test_additive_patch_kernel_matches_manual():
    view = FullView(input_size=(10, 10), filter_size=3, feature_maps=2,
                    stride=2)
    base = RBF.create(variance=1.5, lengthscales=2.0, dtype=jnp.float64)
    w = RNG.rand(view.patch_count) + 0.5
    kern = AdditivePatchKernel.create(base, view, patch_weights=w,
                                      dtype=jnp.float64)
    X = _images()
    ND = X.reshape(5, -1)
    p1 = oracle.extract_patches(X, 3, 2)
    P = view.patch_count
    want = np.mean([w[i] * oracle.rbf_K(1.5, 2.0, p1[:, i], p1[:, i])
                    for i in range(P)], axis=0)
    np.testing.assert_allclose(np.asarray(kern.K(jnp.asarray(ND))), want,
                               rtol=1e-8)
    want_diag = np.mean([w[i] * np.full(5, 1.5) for i in range(P)], axis=0)
    np.testing.assert_allclose(np.asarray(kern.Kdiag(jnp.asarray(ND))),
                               want_diag, rtol=1e-8)


def test_multi_output_conv_kernel_kuu_kuf_shapes():
    # Mirrors the *intent* of reference tests/test_conv_kernel.py (whose
    # oracle was broken — SURVEY.md §4).
    view = FullView(input_size=(28, 28), filter_size=3, feature_maps=1)
    base = RBF.create(dtype=jnp.float64)
    kern = MultiOutputConvKernel(base_kernel=base,
                                 patch_count=view.patch_count)
    M = 16
    Z = jnp.asarray(RNG.randn(M, 9))
    Kuu = np.asarray(kern.Kuu(Z))
    assert Kuu.shape == (M, M)
    assert abs(Kuu[0, 0] - (float(base.variance) + settings.jitter)) < 1e-9
    X = jnp.asarray(RNG.randn(2, 28, 28, 1))
    patches = view.extract_patches_PNL(X)
    Kuf = np.asarray(kern.Kuf(Z, patches))
    assert Kuf.shape == (view.patch_count, M, 2)
    # Value check against the oracle.
    p_np = oracle.extract_patches(np.asarray(X), 3, 1)
    want = oracle.rbf_K(float(base.variance), float(base.lengthscales),
                        np.asarray(Z), p_np[:, 5])
    np.testing.assert_allclose(Kuf[5], want, rtol=1e-8)


# ------------------------------------------------------------------- layers
def _make_conv_layer(white=False, gp_count=2, dtype=jnp.float64):
    view = FullView(input_size=(8, 8), filter_size=3, feature_maps=1,
                    stride=2)
    base = RBF.create(variance=2.0, lengthscales=1.5, dtype=dtype)
    Z = RNG.randn(6, view.patch_length)
    layer = ConvLayer.create(base, view, Z, mean_function=Zero(),
                             white=white, gp_count=gp_count, dtype=dtype)
    return layer, view, Z


@pytest.mark.parametrize("white", [False, True])
def test_conv_layer_conditional_matches_oracle(white):
    layer, view, Z = _make_conv_layer(white=white)
    # Perturb q_mu/q_sqrt away from init so the test is non-trivial.
    M, R = 6, 2
    q_mu = RNG.randn(M, R)
    q_sqrt = np.tril(RNG.randn(R, M, M)) + 2 * np.eye(M)
    layer = layer.replace(q_mu=jnp.asarray(q_mu), q_sqrt=jnp.asarray(q_sqrt))

    X = RNG.randn(4, 8 * 8)
    cache = layer.precompute()
    mean, var = layer.conditional_mean_var(cache, jnp.asarray(X))
    P = view.patch_count
    assert mean.shape == (4, P * R) and var.shape == (4, P * R)

    # Oracle: patches -> rbf -> conditional -> reference reshapes
    # (conv_gp/layers.py:96-135).
    imgs = X.reshape(4, 8, 8, 1)
    pnl = oracle.extract_patches(imgs, 3, 2).transpose(1, 0, 2)  # [P, N, L]
    Kuu = oracle.rbf_K(2.0, 1.5, Z) + settings.jitter * np.eye(M)
    Kuf = np.stack([oracle.rbf_K(2.0, 1.5, Z, pnl[p]) for p in range(P)])
    Knn = np.stack([np.full(4, 2.0) for _ in range(P)])
    om, ov = oracle.conditional(Kuf, Kuu, Knn, q_mu, q_sqrt=q_sqrt,
                                white=white)
    want_mean = om.reshape(4, P * R)
    want_var = ov.transpose(2, 1, 0).reshape(4, P * R)
    np.testing.assert_allclose(np.asarray(mean), want_mean, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), want_var, atol=1e-8)

    # KL against the oracle with the frozen-Z prior.
    kl = float(layer.KL())
    want_kl = oracle.gauss_kl(q_mu, q_sqrt, None if white else Kuu)
    np.testing.assert_allclose(kl, want_kl, rtol=1e-8)


def test_conv_layer_kl_no_gradient_to_Z():
    layer, _, _ = _make_conv_layer(white=False)
    # Move q off the init point (where the KL is stationary in the kernel
    # hyperparameters by construction: S = Kuu, q_mu = 0).
    layer = layer.replace(q_mu=layer.q_mu + 0.3,
                          q_sqrt=layer.q_sqrt * 0.7)

    def kl_fn(lyr):
        return lyr.KL()

    grads = jax.grad(kl_fn)(layer)
    # Z receives no KL gradient (frozen prior, conv_gp/layers.py:149-152) …
    np.testing.assert_allclose(np.asarray(grads.Z), 0.0, atol=1e-12)
    # … but kernel hyperparameters do.
    assert float(jnp.abs(grads.base_kernel.raw_variance)) > 0


def test_svgp_layer_rbf_conditional_matches_oracle():
    D, M, R, N = 12, 7, 3, 5
    base = RBF.create(variance=1.2, lengthscales=0.9, dtype=jnp.float64)
    Z = RNG.randn(M, D)
    layer = SVGPLayer.create(base, Z, num_outputs=R, dtype=jnp.float64)
    q_mu = RNG.randn(M, R)
    q_sqrt = np.tril(RNG.randn(R, M, M)) + 2 * np.eye(M)
    layer = layer.replace(q_mu=jnp.asarray(q_mu), q_sqrt=jnp.asarray(q_sqrt))
    X = RNG.randn(N, D)
    mean, var = layer.conditional_mean_var(layer.precompute(), jnp.asarray(X))
    Kmm = oracle.rbf_K(1.2, 0.9, Z) + settings.jitter * np.eye(M)
    Kmn = oracle.rbf_K(1.2, 0.9, Z, X)[None]
    Knn = np.full((1, N), 1.2)
    om, ov = oracle.conditional(Kmn, Kmm, Knn, q_mu, q_sqrt=q_sqrt)
    np.testing.assert_allclose(np.asarray(mean), om[:, 0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), ov[:, 0].T, atol=1e-8)
    kl = float(layer.KL())
    np.testing.assert_allclose(kl, oracle.gauss_kl(q_mu, q_sqrt, Kmm),
                               rtol=1e-8)


# ---------------------------------------------------------------------- DGP
def _tiny_dgp(dtype=jnp.float64):
    """1 ConvLayer + 1 SVGP/ConvKernel layer on 8x8 images, 3 classes."""
    view1 = FullView(input_size=(8, 8), filter_size=3, feature_maps=1,
                     stride=2)
    base1 = RBF.create(variance=2.0, lengthscales=1.5, dtype=dtype)
    Z1 = RNG.randn(5, view1.patch_length)
    layer1 = ConvLayer.create(base1, view1, Z1, mean_function=Zero(),
                              gp_count=2, q_sqrt_scale=1e-5, dtype=dtype)
    # Layer-1 output image: 3x3 x 2 fm.
    view2 = FullView(input_size=(3, 3), filter_size=2, feature_maps=2)
    base2 = RBF.create(variance=1.0, lengthscales=2.0, dtype=dtype)
    Z2 = RNG.randn(4, view2.patch_length)
    kern2 = ConvKernel.create(base2, view2, dtype=dtype)
    layer2 = SVGPLayer.create(kern2, Z2, num_outputs=3, dtype=dtype)
    lik = MultiClass(num_classes=3)
    return DGP(layers=(layer1, layer2), likelihood=lik, num_data=40,
               num_samples=4)


@pytest.mark.slow
def test_dgp_propagate_shapes_and_elbo_composition():
    model = _tiny_dgp()
    X = jnp.asarray(RNG.randn(6, 64))
    Y = jnp.asarray(RNG.randint(0, 3, size=(6, 1)))
    key = jax.random.PRNGKey(0)

    res = model.propagate(X, key, S=4)
    assert res.samples[0].shape == (4, 6, 9 * 2)
    assert res.means[-1].shape == (4, 6, 3)

    # ELBO == scale * mean_S sum_N ve - sum KL, recomputed from pieces.
    elbo = float(model.elbo(X, Y, key))
    Fmean, Fvar = np.asarray(res.means[-1]), np.asarray(res.variances[-1])
    ve = np.stack([
        oracle.multiclass_variational_expectations(
            np.asarray(Y), Fmean[s], Fvar[s], 3) for s in range(4)])
    want = (40 / 6) * ve.mean(0).sum() - float(model.prior_kl())
    np.testing.assert_allclose(elbo, want, rtol=1e-7)


def test_dgp_elbo_jits_and_is_deterministic():
    model = _tiny_dgp()
    X = jnp.asarray(RNG.randn(6, 64))
    Y = jnp.asarray(RNG.randint(0, 3, size=(6, 1)))
    key = jax.random.PRNGKey(7)
    f = jax.jit(lambda m, x, y, k: m.elbo(x, y, k))
    a = float(f(model, X, Y, key))
    b = float(f(model, X, Y, key))
    assert a == b
    assert np.isfinite(a)


def test_dgp_predict_y():
    model = _tiny_dgp()
    X = jnp.asarray(RNG.randn(5, 64))
    probs, pvar = model.predict_y(X, jax.random.PRNGKey(1), S=3)
    assert probs.shape == (3, 5, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=5e-3)


def test_dgp_first_layer_share_matches_per_sample_eval():
    """Sharing the layer-1 conditional across samples must equal evaluating
    it per sample (it is deterministic in X)."""
    model = _tiny_dgp()
    X = jnp.asarray(RNG.randn(3, 64))
    layer = model.layers[0]
    cache = layer.precompute()
    m1, v1 = layer.conditional_mean_var(cache, X)
    m2, v2 = jax.vmap(lambda f: layer.conditional_mean_var(cache, f))(
        jnp.broadcast_to(X[None], (4,) + X.shape))
    np.testing.assert_allclose(np.asarray(m2[2]), np.asarray(m1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v2[2]), np.asarray(v1), atol=1e-12)


def test_sample_from_conditional_moments():
    """Diag-mode samples from q(f|X) must have the conditional's mean/var
    (checked via MC over many keys on a tiny layer)."""
    import jax
    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.mean_functions import Zero
    from deepcgp_tpu.models.views import FullView
    from deepcgp_tpu.models.layers import ConvLayer

    rng = np.random.RandomState(0)
    view = FullView(input_size=(6, 6), filter_size=3, feature_maps=1,
                    stride=1)
    Z = rng.randn(5, 9)
    layer = ConvLayer.create(RBF.create(dtype=jnp.float64), view, Z,
                             mean_function=Zero(), gp_count=2,
                             dtype=jnp.float64)
    X = jnp.asarray(rng.randn(3, 36))
    sample, mean, var = layer.sample_from_conditional(
        X, jax.random.PRNGKey(0))
    assert sample.shape == mean.shape == var.shape == (3, 32)

    S = 4000
    keys = jax.random.split(jax.random.PRNGKey(1), S)
    samples = jax.vmap(
        lambda k: layer.sample_from_conditional(X, k)[0])(keys)
    emp_mean = np.asarray(samples.mean(axis=0))
    emp_var = np.asarray(samples.var(axis=0))
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(emp_var, np.asarray(var) + 1e-3, rtol=0.25,
                               atol=0.05)


def test_prob_each_is_largest_matches_per_class_loop():
    """The batched all-classes quadrature must equal K per-class passes."""
    from deepcgp_tpu.models.likelihoods import MultiClass
    rng = np.random.RandomState(3)
    lik = MultiClass(10)
    mu = jnp.asarray(rng.randn(7, 10))
    var = jnp.asarray(rng.rand(7, 10) + 0.1)
    batched = np.asarray(lik._prob_each_is_largest(mu, var))
    for c in range(10):
        Yc = jnp.full((7, 1), c, dtype=jnp.int32)
        per_class = np.asarray(lik.prob_is_largest(Yc, mu, var))[:, 0]
        np.testing.assert_allclose(batched[:, c], per_class, rtol=1e-10)
    np.testing.assert_allclose(batched.sum(axis=1), 1.0, atol=5e-3)


@pytest.mark.slow
def test_conv_layer_with_random_partial_view_and_patchwise_mean():
    """RandomPartialView + PatchwiseConv2d, the reference's patch-subset
    configuration (`conv_gp/views.py:70-117`, `mean_functions.py:43-59`):
    conditional shapes, finite ELBO, and gradients flow."""
    import jax
    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.views import RandomPartialView
    from deepcgp_tpu.models.mean_functions import PatchwiseConv2d
    from deepcgp_tpu.models.layers import ConvLayer, SVGPLayer
    from deepcgp_tpu.models.dgp import DGP
    from deepcgp_tpu.models.likelihoods import MultiClass
    from deepcgp_tpu.models.conv_kernels import ConvKernel
    from deepcgp_tpu.models.views import FullView
    from deepcgp_tpu.models.mean_functions import Zero

    rng = np.random.RandomState(0)
    view = RandomPartialView(input_size=(10, 10), filter_size=3,
                             feature_maps=1, patch_count=16, seed=1)
    assert len(view.patch_indices) == 16
    Z = rng.randn(6, 9)
    layer = ConvLayer.create(
        RBF.create(dtype=jnp.float64), view, Z,
        mean_function=PatchwiseConv2d.create(3, 1, dtype=jnp.float64),
        gp_count=1, dtype=jnp.float64)
    X = jnp.asarray(rng.randn(4, 100))
    mean, var = layer.conditional_mean_var(layer.precompute(), X)
    assert mean.shape == (4, 16) and var.shape == (4, 16)

    last_view = FullView(input_size=(4, 4), filter_size=3, feature_maps=1,
                         stride=1)
    last = SVGPLayer.create(
        ConvKernel.create(RBF.create(dtype=jnp.float64), last_view,
                          dtype=jnp.float64),
        rng.randn(5, 9), num_outputs=10, mean_function=Zero(output_dim=10),
        dtype=jnp.float64)
    model = DGP(layers=(layer, last), likelihood=MultiClass(10),
                num_data=4, num_samples=2)
    Y = jnp.asarray(rng.randint(0, 10, size=(4, 1)))
    val, grads = jax.value_and_grad(
        lambda m: m.elbo(X, Y, jax.random.PRNGKey(0)))(model)
    assert np.isfinite(float(val))
    gz = np.asarray(grads.layers[0].q_mu)
    assert np.isfinite(gz).all() and np.abs(gz).sum() > 0
