"""Pairwise distance / inner-product helpers.

These replace the squared-distance + matmul blocks inside gpflow's stationary
kernels (the dominant FLOPs of the reference, called from
`conv_gp/kernels.py:46-133` and `conv_gp/layers.py:20-49`).  On TPU the
``X @ X2^T`` term is the MXU matmul; the norms fuse into it as epilogues.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(X: jax.Array, X2: jax.Array | None = None) -> jax.Array:
    """||x_i - x2_j||^2 for rows of X [..., N, D] and X2 [..., N2, D].

    Uses the expanded form Xs - 2 X X2^T + X2s (one MXU matmul), clamped at
    zero for f32 safety (the reference runs f64 and skips the clamp).
    """
    Xs = jnp.sum(jnp.square(X), axis=-1)
    if X2 is None:
        cross = jnp.matmul(X, jnp.swapaxes(X, -1, -2))
        X2s = Xs
    else:
        cross = jnp.matmul(X, jnp.swapaxes(X2, -1, -2))
        X2s = jnp.sum(jnp.square(X2), axis=-1)
    d2 = Xs[..., :, None] - 2.0 * cross + X2s[..., None, :]
    return jnp.maximum(d2, 0.0)
