"""Convolutional (patch-space) kernels.

Rebuilds of:
* ``MultiOutputConvKernel`` (`conv_gp/layers.py:12-50`) — per-patch-position
  covariance blocks for hidden ConvLayers;
* ``ConvKernel`` (`conv_gp/kernels.py:79-137`) — weighted double patch sum,
  the default last-layer kernel (``--last-kernel conv``);
* ``AdditivePatchKernel`` (`conv_gp/kernels.py:15-77`) — weighted mean over
  per-patch kernels.  (The reference's ``K`` with ``X2=None`` had a latent
  NameError, SURVEY.md §2 row 3; fixed here.)

Every ``tf.map_fn`` over the patch axis becomes a batched/broadcast kernel
evaluation — one big MXU matmul instead of P small ones.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deepcgp_tpu.config import settings
from deepcgp_tpu.ops.linalg import add_jitter


def native_patch_order_ok(base_kernel, view) -> bool:
    """True when the hot path may extract patches in the conv lowering's
    NATIVE within-patch order (C, fh, fw) instead of TF's (fh, fw, C).

    Legal whenever every [L]-indexed quantity the kernel math touches can be
    permuted consistently: patch-vs-patch grams and patch-vs-Z
    cross-covariances are exact under a shared column permutation (Z rides
    ``Z[:, view.native_perm]``; Kuu sees only Z so it needs none), which
    holds for distance/inner-product kernels with SCALAR per-dim parameters
    — RBF with a scalar lengthscale, ArcCosine with scalar weight
    variances.  FullView only: partial views hand their patches to the mean
    function (`conv_gp/views.py:116-117`), whose filters are TF-ordered.

    Why it exists: the conv-lowered extraction births the [N, P, L] tensor
    with L minor — the layout every consumer matmul wants — so the
    slice-form stack+reshape relayout copies never exist.  MEASURED
    (flagship, v5e-1, 2026-08-18): copies bucket 245.7 -> 128.5us/step as
    predicted, BUT the extraction conv and its transposed-conv backward
    run on C=10-minor image layouts (128-lane padding tax) and add
    +224us/step of MXU-bucket time — net 805.8 -> 782.0 steps/s.  The
    slice form's relayouts are the cheaper evil, same verdict the
    minor-axis-concat experiment reached from the other side.  OFF by
    default; ``DEEPCGP_PATCH_ORDER=native`` re-enables for A/B on other
    shapes (grad/ELBO equivalence verified at f64 reassociation level).
    """
    import os

    from deepcgp_tpu.models.base_kernels import RBF, ArcCosine
    from deepcgp_tpu.models.views import FullView
    if os.environ.get('DEEPCGP_PATCH_ORDER', 'tf') != 'native':
        return False
    if not isinstance(view, FullView):
        return False
    if isinstance(base_kernel, RBF):
        return jnp.ndim(base_kernel.raw_lengthscales) == 0
    if isinstance(base_kernel, ArcCosine):
        return jnp.ndim(base_kernel.raw_weight_variances) == 0
    return False


@struct.dataclass
class MultiOutputConvKernel:
    """Shared base kernel evaluated independently at each patch position.

    Stateless beyond the base kernel; ``patch_count`` is static geometry.
    """

    base_kernel: object
    patch_count: int = struct.field(pytree_node=False, default=0)

    def Kuu(self, Z: jax.Array) -> jax.Array:
        """[M, M] = K(Z) + jitter I (`conv_gp/layers.py:18-21`)."""
        return add_jitter(self.base_kernel.K(Z), settings.jitter)

    def Kuf_PNM(self, Z: jax.Array, PNL_patches: jax.Array) -> jax.Array:
        """[P, N, M]: the natural (and M-minor, layout-friendly) orientation
        the batched kernel evaluation produces.

        (Scalar-lengthscale RBF layers normally never reach this: the layer
        computes Kuf straight from the image as a convolution with Z as
        filters — ops/conv_cross.py — which is what the round-1 Pallas RBF
        kernel was trying to approximate; that kernel measured perf-neutral
        and was removed in round 2, see PARITY.md.)"""
        return self.base_kernel.K(PNL_patches, Z[None])  # [P, N, M]

    def Kuf(self, Z: jax.Array, PNL_patches: jax.Array) -> jax.Array:
        """[P, M, N] (`conv_gp/layers.py:23-32`), batched over P."""
        return jnp.swapaxes(self.Kuf_PNM(Z, PNL_patches), -1, -2)

    def Kff(self, PNL_patches: jax.Array) -> jax.Array:
        """[P, N, N] (`conv_gp/layers.py:34-41`)."""
        return self.base_kernel.K(PNL_patches)

    def Kdiag(self, PNL_patches: jax.Array) -> jax.Array:
        """[P, N] (`conv_gp/layers.py:43-50`)."""
        return self.base_kernel.Kdiag(PNL_patches)


def _default_patch_weights(patch_count: int, patch_weights, dtype):
    if patch_weights is None or np.asarray(patch_weights).size != patch_count:
        patch_weights = np.ones(patch_count)
    return jnp.asarray(patch_weights, dtype=dtype)


@struct.dataclass
class AdditivePatchKernel:
    """K(x, x') = mean_i w_i k(x[i], x'[i]) (`conv_gp/kernels.py:15-77`).

    ``view`` is static geometry; inputs are flattened images [N, H*W*C].
    """

    base_kernel: object
    patch_weights: jax.Array  # [P]
    view: object = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, base_kernel, view, patch_weights=None, dtype=jnp.float32):
        return cls(base_kernel=base_kernel,
                   patch_weights=_default_patch_weights(
                       view.patch_count, patch_weights, dtype),
                   view=view)

    def _native_order(self) -> bool:
        return native_patch_order_ok(self.base_kernel, self.view)

    def _pallas_order(self) -> bool:
        """True when patches come L-minor from the Pallas extraction in
        TRANSPOSED patch order (ops/pallas_patches.py).  Legal for this
        class unconditionally: every consumer reduces over P against
        :meth:`_weights` (K/Kdiag grams pair same-position patches of
        consistently-ordered extractions; Kzx weights are permuted), and
        the within-patch L order is unchanged so Z needs no permutation."""
        from deepcgp_tpu.ops import pallas_patches
        return (not self._native_order()
                and pallas_patches.supports(self.view))

    def _weights(self) -> jax.Array:
        """patch_weights in the order :meth:`_patches` produces (stored
        TF-ordered for checkpoint/init parity)."""
        if self._pallas_order():
            from deepcgp_tpu.ops import pallas_patches
            perm = pallas_patches.transposed_patch_perm(
                self.view.out_image_height, self.view.out_image_width)
            return jnp.take(self.patch_weights, jnp.asarray(perm), axis=0)
        return self.patch_weights

    def _patches(self, ND_X: jax.Array) -> jax.Array:
        """[N, P, L] — Pallas transposed-order extraction on the hot path
        (L-minor from birth, see ops/pallas_patches.py), else NATIVE
        (C, fh, fw) element order whenever the kernel math permits (see
        :func:`native_patch_order_ok`), else TF order.  Every in-class
        consumer is order-consistent: grams pair patches with patches,
        cross-covariances pair them with :meth:`_Z_patch_order`-permuted
        inducing patches, and P-weighted sums use :meth:`_weights`."""
        N = ND_X.shape[0]
        H, W = self.view.input_size
        NHWC = ND_X.reshape(N, H, W, self.view.feature_maps)
        if self._pallas_order():
            from deepcgp_tpu.ops.pallas_patches import \
                extract_patches_transposed
            # DEEPCGP_BF16_PATCHES=1: emit the im2col tensor bf16 (halves
            # its HBM footprint — [320,36,250] flagship / [1280,576,25]
            # m1024).  Scalar-RBF only: its Kdiag never reads patches and
            # the cross matmuls run DEFAULT precision, whose MXU operands
            # round to bf16 anyway; norms upcast in their epilogues
            # (ops/distances.py), and the ConvKernel gram path restores
            # f32 before its HIGHEST self-gram.
            out_dtype = None
            from deepcgp_tpu.models.base_kernels import RBF
            if (os.environ.get('DEEPCGP_BF16_PATCHES', '0') == '1'
                    and isinstance(self.base_kernel, RBF)
                    and jnp.ndim(self.base_kernel.raw_lengthscales) == 0
                    and NHWC.dtype == jnp.float32):
                out_dtype = jnp.bfloat16
            return extract_patches_transposed(
                NHWC, self.view.filter_size, self.view.stride,
                self.view.dilation, out_dtype)
        if self._native_order():
            return self.view.extract_patches_NPL_native(NHWC)
        return self.view.extract_patches_NPL(NHWC)

    def _Z_patch_order(self, Z: jax.Array) -> jax.Array:
        """Z's columns in the order :meth:`_patches` produces.  Z is STORED
        in TF patch order (checkpoint/init/figure compatibility); the
        permutation is a [M, L] gather, invisible next to the matmuls it
        unlocks."""
        if self._native_order():
            return jnp.take(Z, jnp.asarray(self.view.native_perm), axis=1)
        return Z

    def _patches_any_order(self, ND_X: jax.Array) -> jax.Array:
        """[N, P, L] for consumers whose math only needs SOME fixed
        within-patch element order (pairwise distances/inner products among
        patches of one extraction) — i.e. the Kdiag gram.  Returns the same
        order as :meth:`_patches` so XLA shares the extraction with Kzx's."""
        return self._patches(ND_X)

    def K(self, ND_X: jax.Array, ND_X2: jax.Array | None = None) -> jax.Array:
        P1 = jnp.swapaxes(self._patches(ND_X), 0, 1)           # [P, N, L]
        if ND_X2 is None:
            # Keep the self-gram as X2=None so the base kernel uses its
            # exact-f32 gram path (the result can feed a sampling Cholesky).
            PNN = self.base_kernel.K(P1)                        # [P, N, N]
        else:
            P2 = jnp.swapaxes(self._patches(ND_X2), 0, 1)
            PNN = self.base_kernel.K(P1, P2)                    # [P, N, N2]
        PNN = PNN * self._weights()[:, None, None]
        return jnp.mean(PNN, axis=0)

    def Kdiag(self, ND_X: jax.Array,
              patches: jax.Array | None = None) -> jax.Array:
        from deepcgp_tpu.models.base_kernels import RBF
        if isinstance(self.base_kernel, RBF):
            # RBF Kdiag is the constant variance — patch values never enter
            # (mean_p w_p * v = v * mean(w)); skip the extraction.
            v = self.base_kernel.variance * jnp.mean(self.patch_weights)
            return jnp.full((ND_X.shape[0],), 1.0, ND_X.dtype) * v
        if patches is None:
            patches = self._patches(ND_X)
        P1 = jnp.swapaxes(patches, 0, 1)                        # [P, N, L]
        PN = self.base_kernel.Kdiag(P1)                          # [P, N]
        return jnp.mean(PN * self._weights()[:, None], axis=0)

    def _kdiag_needs_patches(self) -> bool:
        from deepcgp_tpu.models.base_kernels import RBF
        return not isinstance(self.base_kernel, RBF)

    def Kzx_NM_and_Kdiag(self, Z: jax.Array, ND_X: jax.Array) -> tuple:
        """(Kzx [N, M], Kdiag [N]) off ONE shared patch extraction — the
        per-step pair the last layer evaluates (`conv_gp/kernels.py:108-133`
        via `conv_gp/models.py:192-198`).  XLA CSE'd the two slice-form
        extractions into one; the Pallas extraction is a custom call it
        will not CSE, so the sharing is explicit here.

        Scalar-RBF over a FullView goes through the FUSED Pallas kernel
        (ops/pallas_cross.py): extraction, cross-covariance, exp and the
        patch sums run in one pass per direction and the [N, P, L] /
        [N, P, M] tensors never exist in HBM — forward or backward (the
        round-5 bytes audit attributed 35% of the flagship step to their
        materialized round trips)."""
        from deepcgp_tpu.ops import conv_cross, pallas_cross
        if (pallas_cross.kernel_supported(self)
                and pallas_cross.supported_for(self, Z.shape[0],
                                               ND_X.shape[0])):
            return pallas_cross.kzx_and_kdiag(self, Z, ND_X)
        patches = None
        if (self._kdiag_needs_patches()
                or not conv_cross.supports(self.base_kernel, self.view)):
            patches = self._patches(ND_X)
        NPM = self._patch_kernel_NPM(ND_X, Z, patches=patches)
        # The weight vector must match the NPM producer's patch order: the
        # conv_cross form emits row-major (TF) patch positions, while
        # _patches may be in Pallas-extraction order (see _weights).
        w = self._npm_weights(via_conv_cross=patches is None)
        return jnp.einsum('npm,p->nm', NPM, w), self.Kdiag(ND_X, patches)

    def _npm_weights(self, *, via_conv_cross: bool) -> jax.Array:
        """patch_weights/P in the patch order of :meth:`_patch_kernel_NPM`'s
        output: conv_cross (ops/conv_cross.py:78) enumerates patches
        row-major regardless of the extraction backend, so the Pallas
        permutation of :meth:`_weights` must NOT apply there."""
        w = (self.patch_weights if via_conv_cross else self._weights())
        return w / self.patch_weights.shape[0]

    def _patch_kernel_NPM(self, ND_X: jax.Array, Z: jax.Array,
                          patches: jax.Array | None = None) -> jax.Array:
        """[N, P, M] = k(x[p], z_m) per patch position.  Scalar-RBF over a
        FullView goes through the conv formulation (ops/conv_cross.py):
        the im2col tensor never hits HBM, which removes ~0.5ms/step of
        layout copies at the flagship shape.  ``patches`` (an extraction in
        :meth:`_patches` order) lets callers share ONE extraction across
        Kzx and Kdiag — XLA does not CSE the Pallas extraction custom
        calls the way it CSE'd the slice-form fusions."""
        from deepcgp_tpu.ops import conv_cross
        if patches is None and conv_cross.supports(self.base_kernel,
                                                   self.view):
            N = ND_X.shape[0]
            H, W = self.view.input_size
            return conv_cross.rbf_cross_from_images(
                ND_X.reshape(N, H, W, self.view.feature_maps), Z,
                self.base_kernel.variance, self.base_kernel.lengthscales,
                self.view.filter_size, self.view.stride, self.view.dilation)
        if patches is None:
            patches = self._patches(ND_X)
        return self.base_kernel.K(patches, self._Z_patch_order(Z)[None])

    def Kzx_NM(self, Z: jax.Array, ND_X: jax.Array) -> jax.Array:
        """[N, M] = mean_p w_p k(x[p], Z) — M-minor orientation (matches the
        conditional's pnm layout; avoids retiling the [M, N*P] base-kernel
        matrix, which profiled as the dominant copy at M=1024)."""
        from deepcgp_tpu.ops import conv_cross
        NPM = self._patch_kernel_NPM(ND_X, Z)                    # [N, P, M]
        w = self._npm_weights(via_conv_cross=conv_cross.supports(
            self.base_kernel, self.view))
        return jnp.einsum('npm,p->nm', NPM, w)

    def Kzx(self, Z: jax.Array, ND_X: jax.Array) -> jax.Array:
        return self.Kzx_NM(Z, ND_X).T

    def Kzz(self, Z: jax.Array) -> jax.Array:
        return self.base_kernel.K(Z)


@struct.dataclass
class ConvKernel(AdditivePatchKernel):
    """Weighted double patch sum (`conv_gp/kernels.py:79-137`):
    K(x, x') = sum_{ij} w_i w_j k(x[i], x'[j]) / P^2."""

    def K(self, ND_X: jax.Array, ND_X2: jax.Array | None = None) -> jax.Array:
        pc = self.view.patch_count
        L = self.view.patch_length
        p1 = self._patches(ND_X).reshape(-1, L)                 # [N*P, L]
        if ND_X2 is None:
            Kfull = self.base_kernel.K(p1)      # exact-f32 self-gram path
        else:
            Kfull = self.base_kernel.K(
                p1, self._patches(ND_X2).reshape(-1, L))
        N1 = ND_X.shape[0]
        N2 = N1 if ND_X2 is None else ND_X2.shape[0]
        Kfull = Kfull.reshape(N1, pc, N2, pc)
        w = self._weights()
        Kfull = Kfull * (w[None, :, None, None] * w[None, None, None, :])
        return jnp.sum(Kfull, axis=(1, 3)) / (pc ** 2)

    def Kdiag(self, ND_X: jax.Array,
              patches: jax.Array | None = None) -> jax.Array:
        pc = self.view.patch_count
        # Pairwise distances among one extraction's patches are invariant
        # to the within-patch element order -> any-order extraction is
        # safe.  Explicit X2: this gram is only weighted-summed into Kdiag
        # — never factorized — so it keeps the fast default-precision
        # matmul (the X2=None path requests exact-f32 for Cholesky-bound
        # grams).  (A stacked-slices einsum Gram that skips the im2col
        # measured 2.4x faster in ISOLATION but 6x slower inside the
        # S-vmapped step — XLA's lowering of the 6-D einsum under vmap is
        # pathological; benchmark inside the real program before swapping
        # this path.)
        if patches is None:
            patches = self._patches_any_order(ND_X)              # [N, P, L]
        NPP = self.base_kernel.K(patches, patches)               # [N, P, P]
        w = self._weights()
        W = w[:, None] * w[None, :]
        return jnp.sum(NPP * W, axis=(1, 2)) / (pc ** 2)

    def _kdiag_needs_patches(self) -> bool:
        return True

    # Kzx (= sum_p w_p k(z, x[p]) / P, `conv_gp/kernels.py:117-133`) is the
    # same contraction as AdditivePatchKernel's and is inherited from it in
    # the M-minor orientation.
