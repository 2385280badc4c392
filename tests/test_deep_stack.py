"""Three-layer deep conv-GP end-to-end: builds, trains, and improves.

Unique coverage: the SECOND ConvLayer runs under the doubly-stochastic
vmap over S (layer 1 is sample-shared — models/dgp.py), so the conv-form
Kuf (ops/conv_cross.py) executes inside vmap with per-sample inputs; no
2-layer config reaches that combination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcgp_tpu.models.builder import BuilderFlags, build_model
from deepcgp_tpu.training import trainer
from deepcgp_tpu.training.trainer import TrainConfig


@pytest.mark.slow
def test_three_layer_model_trains():
    rng = np.random.RandomState(0)
    flags = BuilderFlags(M='8,8,8', feature_maps='2,2',
                         filter_sizes='5,3,3', strides='2,1,1',
                         num_samples=2, batch_size=8)
    K = 4
    protos = rng.randn(K, 16, 16, 1)
    y = rng.randint(0, K, size=(64, 1))
    X = protos[y[:, 0]] + 0.3 * rng.randn(64, 16, 16, 1)
    model = build_model(flags, X, y, jax.random.PRNGKey(0),
                        dtype=jnp.float64)
    assert len(model.layers) == 3
    # Geometry: 16 -f5/s2-> 6x6 (fm 2) -f3/s1-> 4x4 (fm 2) -> ConvKernel
    # last layer over 4x4x2 with f3 -> 2x2 patch grid.
    assert model.layers[0].view.patch_count == 36
    assert model.layers[1].view.patch_count == 16
    assert model.layers[2].kernel.view.patch_count == 4

    config = TrainConfig(optimizer='Adam', lr=0.01, lr_decay_steps=1000,
                         gamma=0.001, batch_size=8)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd = jnp.asarray(X.reshape(64, -1))
    Yd = jnp.asarray(y)
    state, elbos = trainer.run_chunk(state, config, Xd, Yd, 60)
    e = np.asarray(elbos)
    assert np.isfinite(e).all()
    assert e[-1] > e[0]

    # Prediction through the full stack.
    probs = trainer.predict_probs_scanned(
        state.model, Xd[:16], jax.random.PRNGKey(2), 8, 2)
    assert probs.shape == (16, 10)
    # Robust-max class probabilities are a Gauss-Hermite approximation;
    # they sum to 1 only up to quadrature error.
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0,
                               atol=5e-3)
