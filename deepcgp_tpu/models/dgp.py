"""Doubly-stochastic deep GP core.

Replaces the external ``doubly_stochastic_dgp`` package (empty submodule in
the reference mount; behaviour reconstructed from its call sites —
`conv_gp/models.py:66-70`, `conv_gp/utils/log.py:62`,
`conv_gp/utils/tensorboard.py:32,73` — and the Salimbeni-Deisenroth
formulation; SURVEY.md §2 external row):

* S-sample reparameterised propagation through the layer stack,
* minibatch-scaled ELBO = N/batch * E_q[log p(y|f)] - sum_l KL_l,
* ``predict_y`` (S-sample predictive class probabilities),
* ``propagate`` (samples + means + vars per layer, for observability).

TPU-first details:
* layer Kuu Choleskys are computed once per step and shared across the S
  samples (``precompute``);
* the first layer's conditional depends only on the minibatch X (identical
  across samples), so it is evaluated once and sampled S times instead of
  S evaluations (mathematically identical; the reference re-evaluates);
* sampling noise comes from an explicit PRNG key — fully deterministic.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp
from flax import struct

from deepcgp_tpu.config import settings


def _reparameterize(mean: jax.Array, var: jax.Array,
                    z: jax.Array) -> jax.Array:
    """Salimbeni DGP reparameterisation: mean + z * sqrt(var + jitter)
    (jitter floor from gpflowrc, matching the external package)."""
    return mean + z * jnp.sqrt(var + settings.jitter)


class PropagateResult(typing.NamedTuple):
    samples: list  # per layer: [S, N, O_l]
    means: list
    variances: list


@struct.dataclass
class DGP:
    """The deep GP model: a stack of layers + a likelihood.

    ``num_data`` is the full training-set size used for minibatch ELBO
    scaling (DGP_Base construction at `conv_gp/models.py:66-70`).
    """

    layers: tuple
    likelihood: object
    num_data: int = struct.field(pytree_node=False, default=0)
    num_samples: int = struct.field(pytree_node=False, default=10)

    def precompute(self):
        return tuple(layer.precompute() for layer in self.layers)

    def propagate(self, X: jax.Array, key: jax.Array, S: int,
                  caches=None) -> PropagateResult:
        """Draw S sample paths through the stack.  X: [N, D]."""
        if caches is None:
            caches = self.precompute()
        N = X.shape[0]
        samples, means, variances = [], [], []
        F = None  # [S, N, O]; None means "layer input identical across S"
        for i, (layer, cache) in enumerate(zip(self.layers, caches)):
            key, sub = jax.random.split(key)
            if F is None:
                # First layer: one conditional evaluation, S samples.
                mean, var = layer.conditional_mean_var(cache, X)
                mean = jnp.broadcast_to(mean[None], (S,) + mean.shape)
                var = jnp.broadcast_to(var[None], (S,) + var.shape)
            else:
                mean, var = jax.vmap(
                    lambda f: layer.conditional_mean_var(cache, f))(F)
            z = jax.random.normal(sub, mean.shape, dtype=mean.dtype)
            F = _reparameterize(mean, var, z)
            samples.append(F)
            means.append(mean)
            variances.append(var)
        return PropagateResult(samples, means, variances)

    # -- training ------------------------------------------------------------
    def expected_log_likelihood(self, X: jax.Array, Y: jax.Array,
                                key: jax.Array, caches=None) -> jax.Array:
        """Monte-Carlo E_q[log p(y | f_L)] summed over the batch."""
        res = self.propagate(X, key, self.num_samples, caches)
        Fmean, Fvar = res.means[-1], res.variances[-1]     # [S, N, K]
        Yb = jnp.broadcast_to(Y[None], (self.num_samples,) + Y.shape)
        ve = self.likelihood.variational_expectations(Fmean, Fvar, Yb)
        return jnp.sum(jnp.mean(ve, axis=0))

    def prior_kl(self, caches=None) -> jax.Array:
        if caches is None:
            caches = (None,) * len(self.layers)
        return sum(layer.KL(cache)
                   for layer, cache in zip(self.layers, caches))

    def elbo(self, X: jax.Array, Y: jax.Array, key: jax.Array) -> jax.Array:
        """Minibatch ELBO (what `model.compute_log_likelihood` evaluates)."""
        caches = self.precompute()
        scale = self.num_data / X.shape[0]
        return scale * self.expected_log_likelihood(X, Y, key, caches) \
            - self.prior_kl(caches)

    def compute_log_likelihood(self, X: jax.Array, Y: jax.Array,
                               key: jax.Array) -> jax.Array:
        """Reference API alias: the minibatch ELBO
        (``model.compute_log_likelihood`` at `conv_gp/utils/tensorboard.py:32`)."""
        return self.elbo(X, Y, key)

    # -- prediction ----------------------------------------------------------
    def predict_y(self, X: jax.Array, key: jax.Array, S: int):
        """Per-sample predictive mean/var of y (class probabilities for the
        robust-max likelihood): ([S, N, K], [S, N, K]) — contract of
        ``model.predict_y(X, S)`` at `conv_gp/utils/log.py:62`."""
        res = self.propagate(X, key, S)
        return self.likelihood.predict_mean_and_var(
            res.means[-1], res.variances[-1])

    def predict_density(self, X: jax.Array, Y: jax.Array, key: jax.Array,
                        S: int) -> jax.Array:
        """Per-point predictive log-density log E_S[p(y | f_L)]
        (DGP_Base API; log-mean-exp over the S sample paths)."""
        res = self.propagate(X, key, S)
        Yb = jnp.broadcast_to(Y[None], (S,) + Y.shape)
        logp = self.likelihood.predict_density(res.means[-1],
                                               res.variances[-1], Yb)
        return jax.nn.logsumexp(logp, axis=0) - jnp.log(float(S))
