"""The tri_inverse fast path must match the solve-based conditional."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepcgp_tpu.config import settings
from deepcgp_tpu.ops.conditional import multi_output_conditional


@pytest.fixture
def restore_settings():
    old = settings.tri_inverse
    yield
    settings.tri_inverse = old


@pytest.mark.parametrize('white,full_cov', [(False, False), (True, False),
                                            (False, True)])
def test_tri_inverse_matches_solves(restore_settings, white, full_cov):
    rng = np.random.RandomState(0)
    P, M, N, R = 5, 24, 7, 3
    A = rng.randn(M, M)
    Kmm = A @ A.T + 1e-3 * np.eye(M)
    Kmn = rng.randn(P, M, N)
    if full_cov:
        B = rng.randn(P, N, N)
        Knn = B @ np.swapaxes(B, -1, -2) + np.eye(N)
    else:
        Knn = rng.rand(P, N) + 1.0
    f = rng.randn(M, R)
    q_sqrt = np.tril(rng.randn(R, M, M) * 0.1 + np.eye(M))

    args = (jnp.asarray(Kmn), jnp.asarray(Kmm), jnp.asarray(Knn),
            jnp.asarray(f))
    kw = dict(full_cov=full_cov, q_sqrt=jnp.asarray(q_sqrt), white=white)

    settings.tri_inverse = False
    mean_ref, var_ref = multi_output_conditional(*args, **kw)
    settings.tri_inverse = True
    mean_ti, var_ti = multi_output_conditional(*args, **kw)

    np.testing.assert_allclose(np.asarray(mean_ti), np.asarray(mean_ref),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_ti), np.asarray(var_ref),
                               rtol=1e-9, atol=1e-9)
