"""Pallas TPU kernels for the hot covariance ops.

The dominant FLOPs of a conv-GP step are RBF cross-covariances between
(scaled) patches and inducing patches (SURVEY.md §3.3: Kuf is P x M x N).
XLA computes these as matmul + separate norm/exp ops; this kernel fuses the
norms and the exp epilogue into the MXU matmul tile loop so each output tile
is written to HBM exactly once.

Inputs are pre-scaled by 1/lengthscales outside the kernel (cheap, fusable,
and it keeps ARD/scalar lengthscales out of the kernel).  The kernel computes

    out[n, m] = variance * exp(-0.5 * ||x_n - z_m||^2)

for x [N, L], z [M, L] in f32 on the MXU.  Zero-padding of L is harmless
(zeros contribute nothing to either the dot product or the norms).

Use :func:`rbf_cross` (grid-tiled) from kernels via
``deepcgp_tpu.config.settings``-gated dispatch; CPU tests run it with
``interpret=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_M = 256


def _rbf_tile_kernel(var_ref, x_ref, z_ref, out_ref):
    x = x_ref[:]                                   # [TN, L]
    z = z_ref[:]                                   # [TM, L]
    cross = jnp.dot(x, z.T, preferred_element_type=jnp.float32)
    xs = jnp.sum(x * x, axis=1, keepdims=True)     # [TN, 1]
    zs = jnp.sum(z * z, axis=1, keepdims=True).T   # [1, TM]
    d2 = jnp.maximum(xs - 2.0 * cross + zs, 0.0)
    out_ref[:] = var_ref[0, 0] * jnp.exp(-0.5 * d2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rbf_cross(x_scaled: jax.Array, z_scaled: jax.Array, variance: jax.Array,
               interpret: bool) -> jax.Array:
    N, L = x_scaled.shape
    M = z_scaled.shape[0]
    tn = min(TILE_N, max(8, N))
    tm = min(TILE_M, max(128, M))
    grid = (pl.cdiv(N, tn), pl.cdiv(M, tm))
    var = jnp.asarray(variance, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        _rbf_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, L), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, L), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        interpret=interpret,
    )(var, x_scaled.astype(jnp.float32), z_scaled.astype(jnp.float32))


def _rbf_cross_fwd(x_scaled, z_scaled, variance, interpret):
    out = _rbf_cross(x_scaled, z_scaled, variance, interpret)
    return out, (x_scaled, z_scaled, variance, out)


def _rbf_cross_bwd(interpret, res, g):
    """Analytic VJP: with K = v exp(-0.5||x-z||^2) and W = g * K,
    dK/dx[n,l] = -K[n,m](x[n,l]-z[m,l]) etc. — two MXU matmuls."""
    del interpret
    x, z, variance, out = res
    W = g * out                                   # [N, M]
    row = jnp.sum(W, axis=1, keepdims=True)       # [N, 1]
    col = jnp.sum(W, axis=0)[:, None]             # [M, 1]
    dx = W @ z - x * row
    dz = W.T @ x - z * col
    dvar = jnp.sum(W) / variance
    return dx.astype(x.dtype), dz.astype(z.dtype), \
        jnp.asarray(dvar, dtype=jnp.result_type(variance))


_rbf_cross.defvjp(_rbf_cross_fwd, _rbf_cross_bwd)


@functools.partial(jax.jit, static_argnames=('interpret',))
def rbf_cross(x_scaled: jax.Array, z_scaled: jax.Array, variance: jax.Array,
              *, interpret: bool = False) -> jax.Array:
    """variance * exp(-0.5 ||x_n - z_m||^2): [N, M] in float32.

    ``x_scaled`` [N, L] and ``z_scaled`` [M, L] must already be divided by
    the lengthscales.  Differentiable via an analytic custom VJP (Pallas
    kernels do not support reverse-mode autodiff directly).
    """
    return _rbf_cross(x_scaled, z_scaled, variance, interpret)
