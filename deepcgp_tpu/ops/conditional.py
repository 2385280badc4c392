"""Multi-output sparse variational GP conditional.

TPU-native rewrite of `conv_gp/conditionals.py:6-67`: the posterior
q(g1) = \\int q(g2) p(g1|g2) shared across P patch positions, where
p(g2) = N(0, Kmm), q(g2) = N(f, q_sqrt q_sqrt^T).

Differences from the reference (semantics identical, schedule TPU-first):

* the per-patch ``tf.map_fn`` triangular solves
  (`conv_gp/conditionals.py:31-33,44-47`) become one wide solve with
  P*N right-hand sides;
* the q_sqrt term (`conv_gp/conditionals.py:53-65`) is a single einsum the
  XLA compiler maps to MXU matmuls;
* the Cholesky of Kmm can be passed in precomputed (``Lm``) so a layer can
  share it across the S Monte-Carlo samples of the doubly-stochastic DGP
  (the reference recomputes it per sample path, §3.3 of SURVEY.md).

Shapes (P = patch positions, M = inducing, N = batch, R = GPs per position):
  Kmn: [P, M, N];  Kmm: [M, M];  Knn: [P, N] (diag) or [P, N, N] (full);
  f: [M, R];  q_sqrt: [R, M, M] lower-triangular.
Returns (fmean [N, P, R], fvar [R, P, N] or [R, P, N, N]) exactly like the
reference's return layout (`conv_gp/conditionals.py:67`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepcgp_tpu.config import settings
from deepcgp_tpu.ops import linalg


def multi_output_conditional(
    Kmn: jax.Array,
    Kmm: jax.Array | None,
    Knn: jax.Array,
    f: jax.Array,
    *,
    full_cov: bool = False,
    q_sqrt: jax.Array | None = None,
    white: bool = False,
    Lm: jax.Array | None = None,
):
    if Lm is None:
        Lm = linalg.cholesky(Kmm)

    R = f.shape[1]

    if settings.tri_inverse:
        # Invert the shared triangular factor ONCE (one M-RHS solve), then
        # every downstream "solve" is a plain MXU matmul.  Triangular solves
        # on TPU are sequential blocked substitutions; with P*N stacked
        # right-hand sides per step they dominate the critical path.  The
        # explicit inverse trades a little stability (covered by the 1e-3
        # jitter; validated by utils/diagnostics.elbo_drift) for matmuls.
        Lm_inv = linalg.solve_triangular_mrhs(
            Lm, jnp.eye(Lm.shape[-1], dtype=Lm.dtype), lower=True)
        A = jnp.einsum('ij,pjn->pin', Lm_inv, Kmn)         # [P, M, N]
    else:
        # A = Lm^-1 Kmn for every patch: one solve with P*N RHS.
        A = linalg.solve_triangular_mrhs(Lm, Kmn, lower=True)  # [P, M, N]

    if full_cov:
        # fvar[p] = Knn[p] - A[p]^T A[p]
        fvar = Knn - jnp.einsum('pmn,pmk->pnk', A, A)        # [P, N, N]
        fvar = jnp.broadcast_to(fvar[None], (R,) + fvar.shape)  # [R, P, N, N]
    else:
        fvar = Knn - jnp.sum(jnp.square(A), axis=1)          # [P, N]
        fvar = jnp.broadcast_to(fvar[None], (R,) + fvar.shape)  # [R, P, N]

    if not white:
        # Unwhitened: A <- Lm^-T A  (reference conditionals.py:44-47).
        if settings.tri_inverse:
            A = jnp.einsum('ji,pjn->pin', Lm_inv, A)
        else:
            A = linalg.solve_triangular_mrhs(Lm, A, lower=True, trans=True)

    # fmean = A^T f per patch -> [N, P, R].
    fmean = jnp.einsum('pmn,mr->npr', A, f)

    if q_sqrt is not None:
        L = jnp.tril(q_sqrt)                                  # [R, M, M]
        # LTA[r, s, p, n] = sum_m L[r, m, s] A[p, m, n]  (L^T A).
        LTA = jnp.einsum('rms,pmn->rspn', L, A)               # [R, M, P, N]
        if full_cov:
            fvar = fvar + jnp.einsum('rspn,rspk->rpnk', LTA, LTA)
        else:
            fvar = fvar + jnp.sum(jnp.square(LTA), axis=1)    # [R, P, N]

    return fmean, fvar
