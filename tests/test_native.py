"""Native C++ data pipeline vs its numpy fallback (same results, both paths).

The .so is compiled on first use by deepcgp_tpu.native.lib(); if no g++ is
available these tests exercise the fallback only and still pass."""

import numpy as np
import pytest

from deepcgp_tpu import native


rng = np.random.RandomState(0)


def test_builds_or_falls_back():
    handle = native.lib()
    # In this image g++ exists, so the library should actually build.
    assert handle is not None or native._tried


def test_fit_scaler_matches_numpy():
    X = rng.randn(500, 33) * 3.0 + 1.5
    X[:, 7] = 2.0  # constant column -> std 1.0
    mean, std = native.fit_scaler(X)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-12)
    expected_std = X.std(axis=0)
    expected_std[7] = 1.0
    np.testing.assert_allclose(std, expected_std, rtol=1e-10)


def test_standardize_matches_numpy():
    X = rng.randn(100, 17).astype(np.float32)
    mean, std = native.fit_scaler(X)
    out = native.standardize(X, mean, std, dtype=np.float32)
    np.testing.assert_allclose(
        out, ((X - mean) / std).astype(np.float32), rtol=1e-5, atol=1e-6)


def test_gather_rows():
    X = rng.randn(50, 4, 3).astype(np.float32)
    idx = rng.randint(0, 50, size=20)
    np.testing.assert_array_equal(native.gather_rows(X, idx), X[idx])


@pytest.mark.parametrize('stride', [1, 2])
def test_extract_patches_matches_device_op(stride):
    import jax.numpy as jnp
    from deepcgp_tpu.ops.patches import extract_patches as device_extract
    X = rng.randn(3, 9, 8, 2).astype(np.float32)
    out = native.extract_patches(X, 3, stride)
    expected = np.asarray(device_extract(jnp.asarray(X), 3, stride))
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_sample_patches_matches_direct_slicing():
    X = rng.randn(10, 12, 12, 3).astype(np.float32)
    img = rng.randint(0, 10, size=40).astype(np.int32)
    ys = rng.randint(0, 12 - 5, size=40).astype(np.int32)
    xs = rng.randint(0, 12 - 5, size=40).astype(np.int32)
    out = native.sample_patches(X, img, ys, xs, 5)
    for k in range(40):
        expected = X[img[k], ys[k]:ys[k] + 5, xs[k]:xs[k] + 5, :].reshape(-1)
        np.testing.assert_array_equal(out[k], expected)


def test_numpy_fallback_agrees_with_native(monkeypatch):
    handle = native.lib()
    if handle is None:
        pytest.skip("native lib unavailable; fallback is the only path")
    X = rng.randn(4, 10, 11, 2).astype(np.float32)
    native_out = native.extract_patches(X, 4, 2)
    monkeypatch.setattr(native, '_lib', None)
    monkeypatch.setattr(native, '_tried', True)
    fallback_out = native.extract_patches(X, 4, 2)
    np.testing.assert_allclose(native_out, fallback_out, rtol=1e-6)
