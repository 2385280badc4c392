"""RBF patch cross-covariance as a convolution — no im2col in HBM.

The patch-sum kernels evaluate k(x[p], z_m) for every patch position p of an
image (reference `conv_gp/kernels.py:117-133` via `views.py:34-38`
tf.extract_image_patches + matmul).  For an RBF base kernel with a SCALAR
lengthscale the whole cross-covariance factors through the image directly:

    ||patch_p(x)/l - z_m/l||^2
        = conv(x^2/l^2, ones)[p] - 2 conv(x/l, z_m/l)[p] + ||z_m/l||^2

so the dominant contraction IS a convolution with the (scaled) inducing
patches as its filters.  XLA lowers that conv onto the MXU with its im2col
done in on-chip memory: profiling the flagship step showed ~0.5ms/step of
HBM layout copies around the materialized [S, N, P, L] patch tensor
(stack-of-slices layout vs f32/bf16 matmul layouts) that this formulation
removes entirely.

Patch/filter element ordering is the TF one the rest of the library uses:
Z rows are (fh, fw, C) row-major, so Z.reshape(M, fh, fw, C) -> HWIO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ('NHWC', 'HWIO', 'NHWC')


def rbf_cross_from_images(NHWC_X: jax.Array, Z: jax.Array, variance,
                          lengthscale, filter_size: int, stride: int = 1,
                          dilation: int = 1) -> jax.Array:
    """[N, P, M] = variance * exp(-0.5 ||patch_p(x_n) - z_m||^2 / l^2).

    ``Z`` is [M, L] with L = fh*fw*C in (fh, fw, C) order; ``lengthscale``
    must be scalar (ARD patch elements cannot be folded into an image
    rescale because patches overlap).
    """
    N, H, W, C = NHWC_X.shape
    M, L = Z.shape
    f = filter_size
    assert L == f * f * C, (L, f, C)

    X = NHWC_X / lengthscale
    Zs = Z / lengthscale
    Zf = jnp.transpose(Zs.reshape(M, f, f, C), (1, 2, 3, 0))  # HWIO

    cross = lax.conv_general_dilated(
        X, Zf, (stride, stride), 'VALID',
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN)
    # ||patch||^2 at HIGHEST precision: the old extraction path computed
    # patch norms exactly elementwise in f32, and this conv replaces it —
    # a single-output-channel conv is cheap, so buy the exactness back
    # rather than stacking bf16 error on top of the cross term's.
    ones = jnp.ones((f, f, C, 1), X.dtype)
    xn = lax.conv_general_dilated(
        X * X, ones, (stride, stride), 'VALID',
        rhs_dilation=(dilation, dilation), dimension_numbers=_DN,
        precision=lax.Precision.HIGHEST)
    zn = jnp.sum(Zs * Zs, axis=1)                              # [M]

    d2 = jnp.maximum(xn - 2.0 * cross + zn, 0.0)               # [N,Ho,Wo,M]
    K = variance * jnp.exp(-0.5 * d2)
    return K.reshape(N, -1, M)                                 # [N, P, M]


def supports(base_kernel, view) -> bool:
    """The conv formulation applies to scalar-lengthscale RBF over a dense
    full patch grid (FullView); everything else falls back to the
    extract-patches path."""
    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.views import FullView
    return (isinstance(base_kernel, RBF)
            and jnp.ndim(base_kernel.raw_lengthscales) == 0
            and isinstance(view, FullView))
