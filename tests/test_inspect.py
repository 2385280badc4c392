"""Inspection utilities (notebook-parity analysis surface)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcgp_tpu.models.builder import BuilderFlags, build_model
from deepcgp_tpu.utils import inspect as insp


def _tiny_model():
    rng = np.random.RandomState(0)
    X = rng.randn(64, 10, 10, 1).astype(np.float32)
    Y = rng.randint(0, 10, size=(64, 1))
    flags = BuilderFlags(M='8,8', feature_maps='2', filter_sizes='3,3',
                         strides='2,1', num_samples=2, batch_size=8)
    return build_model(flags, X, Y, jax.random.PRNGKey(0),
                       dtype=jnp.float32), X, Y


def test_layer_features_shapes():
    model, X, _ = _tiny_model()
    flat = X.reshape(64, -1)[:5]
    samples, means, variances = insp.layer_features(
        model, flat, jax.random.PRNGKey(1), num_samples=3)
    assert len(samples) == len(model.layers) == 2
    assert samples[0].shape == (3, 5, model.layers[0].num_outputs)
    assert means[-1].shape == (3, 5, 10)
    assert np.all(np.isfinite(samples[0]))


def test_inducing_patch_grid():
    model, _, _ = _tiny_model()
    patches = insp.inducing_patches(model.layers[0])
    assert patches.shape == (8, 3, 3, 1)
    grid = insp.inducing_patch_grid(model.layers[0], cols=4)
    assert grid.ndim == 2 and grid.max() <= 1.0 + 1e-6


def test_patch_embedding_pca_fallback():
    model, X, _ = _tiny_model()
    emb_z, emb_d = insp.patch_embedding(model.layers[0], X,
                                        max_data_patches=100)
    assert emb_z.shape == (8, 2)
    assert emb_d.shape[1] == 2


def test_patch_embedding_uses_umap_when_importable(monkeypatch):
    """The notebooks' figure is a UMAP embedding (`Inspect.ipynb`); PCA is
    only the documented offline substitute (umap-learn is absent from this
    image).  Pin that an importable `umap` module IS preferred: inject a
    stub recording the call and returning a recognizable embedding."""
    import sys
    import types

    calls = {}

    class _StubUMAP:
        def __init__(self, n_components):
            calls['n_components'] = n_components

        def fit_transform(self, joint):
            calls['n'] = len(joint)
            return np.full((len(joint), 2), 7.0)

    monkeypatch.setitem(sys.modules, 'umap',
                        types.SimpleNamespace(UMAP=_StubUMAP))
    model, X, _ = _tiny_model()
    emb_z, emb_d = insp.patch_embedding(model.layers[0], X,
                                        max_data_patches=100)
    assert calls['n_components'] == 2
    assert calls['n'] == len(emb_z) + len(emb_d)
    assert np.all(emb_z == 7.0) and np.all(emb_d == 7.0)


def test_noise_robustness_runs():
    model, X, Y = _tiny_model()
    accs = insp.noise_robustness(model, X[:32], Y[:32], jax.random.PRNGKey(2),
                                 noise_levels=(0.0, 0.5), batch_size=16,
                                 num_samples=2, max_points=32)
    assert set(accs) == {0.0, 0.5}
    for v in accs.values():
        assert 0.0 <= v <= 1.0
