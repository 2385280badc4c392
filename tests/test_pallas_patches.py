"""Oracle tests for the Pallas L-minor patch extraction
(ops/pallas_patches.py) — exact-value parity with the slice-form im2col
(`conv_gp/views.py:34-44` semantics) across shapes/strides/dilations, VJP
parity, and end-to-end kernel-consumer equivalence of the transposed patch
order (pallas on/off must agree bit-for-reassociation on Kzx/Kdiag/K).

Runs the REAL kernel in Pallas interpret mode on CPU (the TPU lowering is
exercised by bench.py / the verify skill on hardware)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcgp_tpu.ops.pallas_patches import (_ref_transposed,
                                            extract_patches_transposed,
                                            transposed_patch_perm)
from deepcgp_tpu.ops.patches import extract_patches, out_size

SHAPES = [
    (10, 10, 10, 5, 1, 1),   # flagship last layer
    (28, 28, 1, 5, 2, 1),    # MNIST hidden conv
    (9, 11, 3, 3, 2, 2),     # odd sizes, stride+dilation
    (32, 32, 3, 5, 3, 1),    # CIFAR first layer
    (6, 6, 1, 3, 1, 2),      # dilation-only
]


@pytest.mark.parametrize("H,W,C,f,s,d", SHAPES)
def test_value_parity(H, W, C, f, s, d):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(7, H, W, C))
    got = extract_patches_transposed(x, f, s, d)
    ref = _ref_transposed(x, f, s, d)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("H,W,C,f,s,d", SHAPES[:3])
def test_perm_maps_to_tf_order(H, W, C, f, s, d):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, H, W, C))
    tf_order = extract_patches(x, f, s, d)
    perm = transposed_patch_perm(out_size(H, f, s, d), out_size(W, f, s, d))
    got = extract_patches_transposed(x, f, s, d)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(tf_order[:, perm]))


@pytest.mark.parametrize("H,W,C,f,s,d", SHAPES[:3])
def test_vjp_parity(H, W, C, f, s, d):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(5, H, W, C))
    g = jnp.asarray(rng.randn(*extract_patches_transposed(x, f, s, d).shape))
    d1 = jax.grad(
        lambda im: jnp.vdot(extract_patches_transposed(im, f, s, d), g))(x)
    d2 = jax.grad(lambda im: jnp.vdot(_ref_transposed(im, f, s, d), g))(x)
    # The Pallas col2im accumulates the overlapping windows in a different
    # (serial per-window) order than XLA's pad-sum tree — reassociation
    # noise only.
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-11, atol=1e-13)


@pytest.mark.slow
def test_kernel_consumers_order_invariant(monkeypatch):
    """ConvKernel / AdditivePatchKernel results are identical with the
    Pallas transposed-order extraction on vs off (weights permuted by
    `_weights`) — the legality condition of `_pallas_order`."""
    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.conv_kernels import (AdditivePatchKernel,
                                                 ConvKernel)
    from deepcgp_tpu.models.views import FullView

    rng = np.random.RandomState(3)
    view = FullView(input_size=(10, 10), filter_size=5, feature_maps=10,
                    stride=1)
    base = RBF.create(variance=1.3, lengthscales=0.9, dtype=jnp.float64)
    w = jnp.asarray(rng.rand(view.patch_count))
    X = jnp.asarray(rng.randn(6, 1000))
    Z = jnp.asarray(rng.randn(17, view.patch_length))
    for cls in (ConvKernel, AdditivePatchKernel):
        k = cls.create(base, view, patch_weights=w, dtype=jnp.float64)
        monkeypatch.setenv('DEEPCGP_PALLAS_EXTRACT', '1')
        a = (k.Kzx_NM(Z, X), k.Kdiag(X), k.K(X), k.K(X, X[:3]))
        monkeypatch.setenv('DEEPCGP_PALLAS_EXTRACT', '0')
        b = (k.Kzx_NM(Z, X), k.Kdiag(X), k.K(X), k.K(X, X[:3]))
        for p, q in zip(a, b):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                       rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_last_layer_elbo_invariant(monkeypatch):
    """Full-model ELBO + grads agree with the Pallas extraction on vs off
    (the seam bench.py's flagship exercises on hardware)."""
    from deepcgp_tpu.models.builder import BuilderFlags, build_model

    rng = np.random.RandomState(4)
    X = rng.randn(24, 10, 10, 3).astype(np.float64)
    Y = rng.randint(0, 10, size=(24, 1))
    flags = BuilderFlags(M='8,8', feature_maps='2', filter_sizes='3,3',
                         strides='2,1', num_samples=2, batch_size=8)

    def elbo_and_grads():
        model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                            dtype=jnp.float64)
        loss, grads = jax.value_and_grad(
            lambda m: -m.elbo(jnp.asarray(X.reshape(24, -1)),
                              jnp.asarray(Y), jax.random.PRNGKey(1)))(model)
        return loss, grads

    monkeypatch.setenv('DEEPCGP_PALLAS_EXTRACT', '1')
    l1, g1 = elbo_and_grads()
    monkeypatch.setenv('DEEPCGP_PALLAS_EXTRACT', '0')
    l2, g2 = elbo_and_grads()
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('H,W,C,f,s,d', SHAPES[:3])
def test_bf16_extraction_is_cast_of_slice_form(H, W, C, f, s, d):
    """out_dtype=bf16 emits EXACTLY the bf16 cast of the slice-form
    extraction (the kernel moves values untouched; the store rounds
    once)."""
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(4, H, W, C).astype(np.float32))
    got = extract_patches_transposed(X, f, s, d, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    want = _ref_transposed(X, f, s, d).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_bf16_extraction_backward_f32_accumulation():
    """The col2im backward of a bf16-emitting extraction accumulates in
    f32 and returns f32 image cotangents equal to the slice-form
    transpose applied to the (bf16) cotangent."""
    rng = np.random.RandomState(1)
    H = W = 8
    f, s, d = 3, 1, 1
    X = jnp.asarray(rng.randn(3, H, W, 2).astype(np.float32))
    G = jnp.asarray(rng.randn(3, 36, 18).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def loss(x):
        p = extract_patches_transposed(x, f, s, d, jnp.bfloat16)
        return jnp.sum(p.astype(jnp.float32) * G.astype(jnp.float32))

    gx = jax.grad(loss)(X)
    assert gx.dtype == X.dtype

    def loss_ref(x):
        return jnp.sum(_ref_transposed(x, f, s, d)
                       * G.astype(jnp.float32))

    gref = jax.grad(loss_ref)(X)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gref),
                               rtol=1e-6, atol=1e-6)


def test_bf16_patches_kernel_consumer_close(monkeypatch):
    """DEEPCGP_BF16_PATCHES=1 changes Kzx/Kdiag only by one bf16 rounding
    of the patch values (f32 norms, DEFAULT-precision cross products)."""
    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.conv_kernels import AdditivePatchKernel
    from deepcgp_tpu.models.views import FullView

    monkeypatch.setenv('DEEPCGP_PALLAS_EXTRACT', '1')
    rng = np.random.RandomState(2)
    view = FullView(input_size=(10, 10), filter_size=5, feature_maps=1,
                    stride=1)
    X = jnp.asarray(rng.randn(4, 100).astype(np.float32))
    Z = jnp.asarray(rng.randn(7, view.patch_length).astype(np.float32))
    kern = AdditivePatchKernel.create(
        RBF.create(variance=1.3, lengthscales=2.0, dtype=jnp.float32),
        view, dtype=jnp.float32)
    assert kern._pallas_order()

    off = kern.Kzx_NM(Z, X)
    off_d = kern.Kdiag(X)
    monkeypatch.setenv('DEEPCGP_BF16_PATCHES', '1')
    on = kern.Kzx_NM(Z, X)
    on_d = kern.Kdiag(X)
    assert np.abs(np.asarray(on) - np.asarray(off)).max() < 2e-2
    np.testing.assert_allclose(np.asarray(on_d), np.asarray(off_d),
                               rtol=1e-6)


def test_pick_block_raises_on_vmem_overflow():
    """A geometry whose single-image block exceeds the VMEM budget must
    raise a legible ValueError from the block picker, not die in Mosaic
    (ADVICE r4): supports() gates layer callers on the same bound, but
    direct extract_patches_transposed callers hit _pick_block first."""
    from deepcgp_tpu.ops import pallas_patches as pp
    # ~0.5M-elem image with a dense patch tensor: (HWC + PL)*4*2 >> 12MB.
    HWC = 512 * 512 * 4
    PL = 508 * 508 * 25 * 4
    assert pp._vmem_max_block(HWC, PL) == 0
    with pytest.raises(ValueError, match='VMEM budget'):
        pp._pick_block(8, HWC, PL)
    # And supports() refuses the same geometry instead of admitting it.
    from deepcgp_tpu.models.views import FullView
    view = FullView(input_size=(512, 512), filter_size=5, feature_maps=4,
                    stride=1)
    assert not pp.supports(view)
