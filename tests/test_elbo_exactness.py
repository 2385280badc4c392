"""ELBO-pipeline exactness: with Z = X and q(u) set to the exact posterior,
the (single-layer, Gaussian-likelihood) SVGP ELBO equals the exact GP log
marginal likelihood (Titsias bound tightness).  One identity that exercises
kernel evaluation, the conditional, gauss_kl, and the likelihood's
variational expectations end-to-end against closed form."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcgp_tpu.config import settings
from deepcgp_tpu.models.base_kernels import RBF
from deepcgp_tpu.models.dgp import DGP
from deepcgp_tpu.models.layers import SVGPLayer
from deepcgp_tpu.models.likelihoods import Gaussian
from deepcgp_tpu.models.mean_functions import Zero


def test_elbo_equals_exact_log_evidence_when_Z_is_X():
    rng = np.random.RandomState(0)
    N = 24
    X = rng.randn(N, 2)
    kern_np_var, kern_np_ls = 1.7, 1.3
    noise = 0.09

    def k_np(A, B):
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return kern_np_var * np.exp(-0.5 * d2 / kern_np_ls ** 2)

    K = k_np(X, X)
    Y = np.linalg.cholesky(K + noise * np.eye(N)) @ rng.randn(N, 1)

    # Exact GP log evidence log N(y; 0, K + noise I).
    C = K + noise * np.eye(N)
    L = np.linalg.cholesky(C)
    alpha = np.linalg.solve(C, Y)
    exact = float(-0.5 * Y.T @ alpha
                  - np.log(np.diag(L)).sum()
                  - 0.5 * N * np.log(2 * np.pi))

    # Optimal q(u) for Z = X: the exact posterior.
    q_mu = K @ np.linalg.solve(C, Y)
    S = K - K @ np.linalg.solve(C, K)
    q_sqrt = np.linalg.cholesky(S + 1e-12 * np.eye(N))[None]

    old_jitter = settings.jitter
    settings.jitter = 1e-12  # the identity is exact only at zero jitter
    try:
        layer = SVGPLayer.create(
            RBF.create(variance=kern_np_var, lengthscales=kern_np_ls,
                       dtype=jnp.float64),
            X, num_outputs=1, mean_function=Zero(output_dim=1),
            q_mu=q_mu, q_sqrt=q_sqrt, dtype=jnp.float64)
        model = DGP(layers=(layer,), likelihood=Gaussian.create(
            noise, dtype=jnp.float64), num_data=N, num_samples=1)
        elbo = float(model.elbo(jnp.asarray(X), jnp.asarray(Y),
                                jax.random.PRNGKey(0)))
    finally:
        settings.jitter = old_jitter

    np.testing.assert_allclose(elbo, exact, rtol=1e-6)
