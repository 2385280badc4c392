"""Parameter bijectors.

gpflow 1.x stores positive parameters through the ``Log1pe`` transform
(softplus shifted by a small lower bound); the reference relies on this for
kernel variances/lengthscales (constructed at `conv_gp/models.py:114-121`).
We keep the same transform so that checkpoints and initial values line up
exactly with the reference's constrained values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepcgp_tpu.config import settings


def positive_forward(unconstrained: jax.Array) -> jax.Array:
    """softplus(x) + lower  (gpflow Log1pe.forward)."""
    return jax.nn.softplus(unconstrained) + settings.positive_minimum


def positive_backward(constrained) -> jax.Array:
    """Inverse of :func:`positive_forward`: log(expm1(y - lower)).

    Computed in float64 on host (init-time only) for accuracy, then cast.
    """
    y = np.asarray(constrained, dtype=np.float64) - settings.positive_minimum
    # log(e^y - 1) = y + log1p(-e^-y), stable for large y.
    x = np.where(y > 20.0, y + np.log1p(-np.exp(-np.minimum(y, 30.0))),
                 np.log(np.expm1(np.maximum(y, 1e-10))))
    return x


def lower_triangular_flatten(mats: jax.Array) -> jax.Array:
    """[..., M, M] -> packed lower-triangular [..., M(M+1)/2] (row-major),
    matching gpflow's LowerTriangular transform storage order."""
    M = mats.shape[-1]
    idx = np.tril_indices(M)
    return mats[..., idx[0], idx[1]]


def lower_triangular_unflatten(packed: jax.Array, M: int) -> jax.Array:
    idx = np.tril_indices(M)
    out_shape = packed.shape[:-1] + (M, M)
    out = jnp.zeros(out_shape, dtype=packed.dtype)
    return out.at[..., idx[0], idx[1]].set(packed)
