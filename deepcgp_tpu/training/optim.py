"""Optimizers: Adam/SGD with the reference's lr schedule, plus natural
gradients on the variational parameters.

Rebuild of `conv_gp/experiment.py:72-111`:

* exponential staircase lr decay, x0.1 every ``lr_decay_steps``
  (`conv_gp/experiment.py:72-73`);
* gamma schedule for NatGrad:
  min((step/100 * 1e-3 + gamma0) * 0.2^steps_back, 1.0)
  (`conv_gp/experiment.py:74-80`);
* NatGrad on every layer's (q_mu, q_sqrt) + Adam on all other params
  (`conv_gp/experiment.py:90-108`);
* Cholesky-failure backoff: the reference catches a TF
  InvalidArgumentError, bumps ``steps_back`` and retries
  (`conv_gp/experiment.py:38-49`).  JAX Cholesky returns NaN instead of
  raising, so the step checks the proposed variational params for
  non-finite values inside jit and — via ``lax.cond`` — either commits them
  or keeps the old ones and increments ``steps_back``.  No host round-trip.

The natural-gradient math follows Salimbeni, Eleftheriadis & Hensman (2018)
(gpflow's NatGradOptimizer with the default XiNat transform): step in the
natural parameters theta = (S^-1 mu, -1/2 S^-1) along dL/deta, where
eta = (mu, S + mu mu^T) are the expectation parameters; dL/deta is obtained
from (dL/dq_mu, dL/dq_sqrt) by a VJP through eta -> (mu, chol(S)).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
import optax
from jax import lax

# ----------------------------------------------------------------- schedules


def learning_rate_schedule(lr: float, lr_decay_steps: int):
    return optax.exponential_decay(init_value=lr,
                                   transition_steps=lr_decay_steps,
                                   decay_rate=0.1, staircase=True)


def gamma_schedule(step, steps_back, gamma0: float):
    t = step.astype(jnp.float64 if jax.config.jax_enable_x64
                    else jnp.float32) / 100.0
    return jnp.minimum((t * 1e-3 + gamma0) * jnp.power(0.2, steps_back), 1.0)


# ------------------------------------------------------------ trainable mask

_FROZEN_NAMES = ('Z0', 'conv_filter')  # frozen-Z KL snapshot; mean filters
_VARIATIONAL_NAMES = ('q_mu', 'q_sqrt')


def _path_has(path, names) -> bool:
    for entry in path:
        name = getattr(entry, 'name', None)
        if name is not None and name in names:
            return True
    return False


def trainable_mask(model, *, exclude_variational: bool) -> typing.Any:
    """Pytree of bools: True where Adam/SGD should update.

    Mean-function conv filters are frozen (`conv_gp/models.py:99`), Z0 is the
    KL prior snapshot, and under NatGrad the variational params are removed
    from the Adam set (`conv_gp/experiment.py:92-95`).
    """
    def mask_leaf(path, _):
        if _path_has(path, _FROZEN_NAMES):
            return False
        if exclude_variational and _path_has(path, _VARIATIONAL_NAMES):
            return False
        return True
    return jax.tree_util.tree_map_with_path(mask_leaf, model)


def apply_mask(grads, mask):
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


# ----------------------------------------------------------- natural gradient


def _expectation_to_meanvarsqrt(eta1, eta2):
    """eta1 [R, M], eta2 [R, M, M] -> (mu [R, M], W = chol(S) [R, M, M])."""
    S = eta2 - eta1[:, :, None] * eta1[:, None, :]
    return eta1, jnp.linalg.cholesky(S)


def _meanvarsqrt_to_expectation(mu, W):
    S = jnp.matmul(W, jnp.swapaxes(W, -1, -2))
    return mu, S + mu[:, :, None] * mu[:, None, :]


def _meanvarsqrt_to_natural(mu, W):
    """theta1 = S^-1 mu, theta2 = -1/2 S^-1 (via Cholesky solves)."""
    M = W.shape[-1]
    I = jnp.broadcast_to(jnp.eye(M, dtype=W.dtype), W.shape)
    Winv = lax.linalg.triangular_solve(W, I, left_side=True, lower=True)
    Sinv = jnp.matmul(jnp.swapaxes(Winv, -1, -2), Winv)
    theta1 = jnp.einsum('rmn,rn->rm', Sinv, mu)
    return theta1, -0.5 * Sinv


def _natural_to_meanvarsqrt(theta1, theta2):
    P = -2.0 * theta2                       # = S^-1
    Lp = jnp.linalg.cholesky(P)
    M = P.shape[-1]
    I = jnp.broadcast_to(jnp.eye(M, dtype=P.dtype), P.shape)
    Lpinv = lax.linalg.triangular_solve(Lp, I, left_side=True, lower=True)
    S = jnp.matmul(jnp.swapaxes(Lpinv, -1, -2), Lpinv)
    mu = jnp.einsum('rmn,rn->rm', S, theta1)
    return mu, jnp.linalg.cholesky(S)


def natgrad_update(q_mu, q_sqrt, dq_mu, dq_sqrt, gamma):
    """One natural-gradient step for a single layer.

    q_mu [M, R], q_sqrt [R, M, M] (lower triangle meaningful); d* are the
    (reverse-mode) loss gradients w.r.t. them.  Returns proposed new values
    (possibly containing NaN if the implied covariance loses positive
    definiteness — caller handles backoff).
    """
    mu = q_mu.T                                  # [R, M]
    W = jnp.tril(q_sqrt)                          # [R, M, M]
    dmu = dq_mu.T
    dW = jnp.tril(dq_sqrt)

    eta1, eta2 = _meanvarsqrt_to_expectation(mu, W)
    # dL/deta via VJP through eta -> (mu, W).
    _, vjp_fn = jax.vjp(_expectation_to_meanvarsqrt, eta1, eta2)
    deta1, deta2 = vjp_fn((dmu, dW))

    theta1, theta2 = _meanvarsqrt_to_natural(mu, W)
    theta1 = theta1 - gamma * deta1
    theta2 = theta2 - gamma * deta2

    mu_new, W_new = _natural_to_meanvarsqrt(theta1, theta2)
    return mu_new.T, W_new


def natgrad_step_with_backoff(layers: tuple, grads_layers: tuple, gamma,
                              steps_back):
    """Apply natgrad to every layer's (q_mu, q_sqrt); on any non-finite
    result, keep ALL old values and bump ``steps_back``
    (the jit-friendly equivalent of `conv_gp/experiment.py:38-49`)."""
    proposals = []
    for layer, g in zip(layers, grads_layers):
        proposals.append(natgrad_update(layer.q_mu, layer.q_sqrt,
                                        g.q_mu, g.q_sqrt, gamma))

    finite = jnp.asarray(True)
    for mu_new, W_new in proposals:
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(mu_new)))
        finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(W_new)))

    new_layers = tuple(
        layer.replace(
            q_mu=jnp.where(finite, mu_new, layer.q_mu),
            q_sqrt=jnp.where(finite, W_new, jnp.tril(layer.q_sqrt)))
        for layer, (mu_new, W_new) in zip(layers, proposals))
    new_steps_back = jnp.where(finite, steps_back, steps_back + 1.0)
    return new_layers, new_steps_back, finite
