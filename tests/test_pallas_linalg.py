"""Oracles for the batch-parallel Pallas Cholesky/inverse
(deepcgp_tpu/ops/pallas_linalg.py) — run in interpreter mode on the CPU
test platform; the TPU compiles the same kernel natively.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from deepcgp_tpu.ops import pallas_linalg


def _spd(rng, B, M, jitter=2.0):
    A = rng.randn(B, M, M)
    S = A @ np.swapaxes(A, -1, -2) / M + jitter * np.eye(M)
    return S


@pytest.mark.parametrize('panel', [32, 64, 128])
@pytest.mark.parametrize('M', [128, 256, 384])
def test_chol_inv_matches_numpy(M, panel):
    if M % panel:
        pytest.skip('panel must divide M')
    rng = np.random.RandomState(0)
    S = _spd(rng, 5, M)
    L, Linv = pallas_linalg.chol_inv_batched(jnp.asarray(S), panel=panel,
                                             interpret=True)
    L, Linv = np.asarray(L), np.asarray(Linv)
    ref = np.linalg.cholesky(S)
    np.testing.assert_allclose(L, ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Linv, np.linalg.inv(ref),
                               rtol=1e-8, atol=1e-10)
    # Strictly triangular (exact zeros above the diagonal).
    assert (np.triu(L, 1) == 0).all()
    assert (np.triu(Linv, 1) == 0).all()


@pytest.mark.slow
def test_chol_inv_f32_accuracy():
    """f32 path (what the TPU actually runs): factor residual and inverse
    residual stay at f32 roundoff scale."""
    rng = np.random.RandomState(1)
    S = _spd(rng, 4, 384).astype(np.float32)
    L, Linv = pallas_linalg.chol_inv_batched(jnp.asarray(S), interpret=True)
    L, Linv = np.asarray(L), np.asarray(Linv)
    recon = L @ np.swapaxes(L, -1, -2)
    np.testing.assert_allclose(recon, S, rtol=2e-5, atol=2e-5)
    eye = Linv @ L
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(384), eye.shape),
                               atol=5e-5)


@pytest.mark.slow
def test_non_pd_input_yields_nonfinite():
    """NaN contract matches jnp.linalg.cholesky: callers' finite checks
    (NatGrad backoff) must keep firing."""
    rng = np.random.RandomState(2)
    S = _spd(rng, 3, 256)
    S[1] = -np.eye(256)  # not PD
    L, Linv = pallas_linalg.chol_inv_batched(jnp.asarray(S), interpret=True)
    assert np.isfinite(np.asarray(L)[0]).all()
    assert np.isfinite(np.asarray(L)[2]).all()
    assert not np.isfinite(np.asarray(L)[1]).all()
    assert not np.isfinite(np.asarray(Linv)[1]).all()


@pytest.mark.parametrize('panel', [32, 64, 128])
@pytest.mark.parametrize('M', [128, 384])
def test_upper_chol_inv_matches_flipped_lower(M, panel):
    """chol_inv_batched_upper(A) == both-axes flip of
    chol_inv_batched(flip(A)) — the identity the flip-free NatGrad
    factorization rests on — and R R^T reconstructs A."""
    if M % panel:
        pytest.skip('panel must divide M')
    rng = np.random.RandomState(4)
    S = _spd(rng, 5, M)
    R, Rinv = pallas_linalg.chol_inv_batched_upper(jnp.asarray(S),
                                                   panel=panel,
                                                   interpret=True)
    R, Rinv = np.asarray(R), np.asarray(Rinv)
    Lf, Lfinv = pallas_linalg.chol_inv_batched(
        jnp.asarray(S[..., ::-1, ::-1]), panel=panel, interpret=True)
    np.testing.assert_allclose(R, np.asarray(Lf)[..., ::-1, ::-1],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Rinv, np.asarray(Lfinv)[..., ::-1, ::-1],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), S,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(Rinv @ R,
                               np.broadcast_to(np.eye(M), R.shape),
                               atol=1e-9)
    # Strictly UPPER triangular (exact zeros below the diagonal).
    assert (np.tril(R, -1) == 0).all()
    assert (np.tril(Rinv, -1) == 0).all()


@pytest.mark.slow
def test_near_identity_inverse_precision():
    """The NatGrad G = I + O(gamma) case: inverse error ~roundoff."""
    rng = np.random.RandomState(3)
    E = rng.randn(6, 384, 384)
    E = 1e-3 * (E + np.swapaxes(E, -1, -2))
    S = np.broadcast_to(np.eye(384), (6, 384, 384)) + E
    L, Linv = pallas_linalg.chol_inv_batched(jnp.asarray(S), interpret=True)
    eye = np.asarray(Linv) @ np.asarray(L)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(384), eye.shape),
                               atol=1e-12)


@pytest.mark.parametrize('shape', [(512,), (3, 512), (1024,)])
def test_tri_inv_doubling_matches_numpy(shape):
    """Block-doubling triangular inverse == numpy inv of the factor, for
    2-D and batched stacks, at the shipped block size (M/block a power of
    two; m1024 uses M=1024, block=128)."""
    rng = np.random.RandomState(2)
    M = shape[-1]
    B = int(np.prod(shape[:-1], dtype=int))
    S = _spd(rng, max(B, 1), M)
    L = np.linalg.cholesky(S).reshape(*shape, M)
    got = np.asarray(pallas_linalg.tri_inv_doubling(
        jnp.asarray(L), block=128, interpret=True))
    ref = np.linalg.inv(L.reshape(-1, M, M)).reshape(*shape, M)
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)
    assert (np.triu(got.reshape(-1, M, M)[0], 1) == 0).all()


@pytest.mark.parametrize('M,panel', [(64, 64), (384, 64), (256, 128)])
def test_chol_right_solve_upper_matches_inverse_route(M, panel):
    """chol_right_solve_upper(A, X) == X @ chol_inv_batched_upper(A)[1]^T —
    the NatGrad W_new path never materializes R^-1 (round-4 restructure);
    block back-substitution on the product must agree with the explicit
    inverse route to rounding."""
    from deepcgp_tpu.ops import pallas_linalg

    rng = np.random.RandomState(0)
    B, N = 3, M
    Q = rng.randn(B, M, M)
    A = jnp.asarray(Q @ np.swapaxes(Q, 1, 2) + M * np.eye(M))
    X = jnp.asarray(rng.randn(B, N, M))

    _, Rinv = pallas_linalg.chol_inv_batched_upper(A, panel=panel,
                                                   interpret=True)
    want = jnp.einsum('bnk,bmk->bnm', X, Rinv)
    got = pallas_linalg.chol_right_solve_upper(A, X, panel=panel,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-10)
    # And against numpy directly: Y R^T = X, with the canonical upper
    # factor R = P chol(P A P) P (P = index reversal; R R^T = A).
    R = np.linalg.cholesky(np.asarray(A)[..., ::-1, ::-1])[..., ::-1, ::-1]
    np.testing.assert_allclose(np.asarray(got) @ np.swapaxes(R, 1, 2),
                               np.asarray(X), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize('M,panel', [(128, 128), (512, 128), (1024, 128)])
def test_chol_factor_batched_matches_numpy(M, panel):
    """Factor-only blocked driver (the m1024 [1024,1024] chol replacement)
    == numpy chol."""
    from deepcgp_tpu.ops import pallas_linalg

    rng = np.random.RandomState(1)
    B = 2
    Q = rng.randn(B, M, M)
    A = jnp.asarray(Q @ np.swapaxes(Q, 1, 2) + M * np.eye(M))
    L = pallas_linalg.chol_factor_batched(A, panel=panel, interpret=True)
    np.testing.assert_allclose(np.asarray(L),
                               np.linalg.cholesky(np.asarray(A)),
                               rtol=1e-9, atol=1e-9)
    assert (np.triu(np.asarray(L), 1) == 0).all()


@pytest.mark.parametrize('M,panel', [(64, 64), (384, 64), (256, 128)])
def test_upper_drivers_read_only_tril(M, panel):
    """The upper factor drivers consume ONLY the lower triangle of A
    (diag blocks symmetrized in-driver) — the contract behind the
    NatGrad G = I + gamma*tril(W^T dW) byte-removal (optim.py).  Feeding
    garbage in the strict upper triangle must not change the result."""
    rng = np.random.RandomState(7)
    B, N = 3, M
    S = _spd(rng, B, M)
    garbage = np.triu(rng.randn(B, M, M) * 1e6, 1)
    S_dirty = np.tril(S) + garbage
    X = jnp.asarray(rng.randn(B, N, M))

    clean = pallas_linalg.chol_right_solve_upper(
        jnp.asarray(S), X, panel=panel, interpret=True)
    dirty = pallas_linalg.chol_right_solve_upper(
        jnp.asarray(S_dirty), X, panel=panel, interpret=True)
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(dirty))

    Rc, Ric = pallas_linalg.chol_inv_batched_upper(
        jnp.asarray(S), panel=panel, interpret=True)
    Rd, Rid = pallas_linalg.chol_inv_batched_upper(
        jnp.asarray(S_dirty), panel=panel, interpret=True)
    np.testing.assert_array_equal(np.asarray(Rc), np.asarray(Rd))
    np.testing.assert_array_equal(np.asarray(Ric), np.asarray(Rid))
