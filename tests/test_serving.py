"""Serving layer: padded batched prediction + rebuild from a run dir."""

import numpy as np

from deepcgp_tpu.mnist import MNIST, read_args
from deepcgp_tpu.serving import Predictor


def test_predictor_from_run_dir(tmp_path):
    args = read_args([
        '--name', 'serve', '-N', '64', '-M', '4,4',
        '--feature-maps', '2', '--filter-sizes', '5,5', '--strides', '2,2',
        '--test-every', '2', '--lr-decay-steps', '4', '--test-size', '32',
        '--num-samples', '2', '--batch-size', '8',
        '--log-dir', str(tmp_path), '--no-tensorboard'])
    exp = MNIST(args)
    try:
        exp.train_step()
    finally:
        exp.conclude()

    pred = Predictor.from_run_dir(str(tmp_path / 'serve'),
                                  exp.X_train, exp.Y_train,
                                  batch_size=8, num_samples=2)
    # Loaded parameters override the fresh init.
    np.testing.assert_allclose(
        np.asarray(pred.model.layers[0].q_mu),
        np.asarray(exp.state.model.layers[0].q_mu), rtol=1e-6)

    # Non-multiple-of-batch request exercises the padding path.
    X = exp.X_test[:13]
    probs = pred.predict_proba(X)
    assert probs.shape == (13, 10)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=5e-3)
    labels = pred.predict(X)
    assert labels.shape == (13,) and set(labels) <= set(range(10))

    dens = pred.log_density(X, exp.Y_test[:13])
    assert dens.shape == (13,) and np.all(dens <= 1e-6)


def test_predictor_raw_inputs_apply_training_scaler(tmp_path):
    """Raw disk-layout images served with raw=True must match predictions
    on pre-standardized inputs (the training scaler is persisted with the
    run and applied by the Predictor)."""
    import types
    from deepcgp_tpu.training import data

    args = read_args([
        '--name', 'raws', '-N', '64', '-M', '4,4',
        '--feature-maps', '2', '--filter-sizes', '5,5', '--strides', '2,2',
        '--test-every', '2', '--lr-decay-steps', '4', '--test-size', '16',
        '--num-samples', '2', '--batch-size', '8',
        '--log-dir', str(tmp_path), '--no-tensorboard'])
    exp = MNIST(args)
    try:
        exp.train_step()
    finally:
        exp.conclude()

    import os
    assert os.path.exists(tmp_path / 'raws' / 'preprocessing.npz')
    pred = Predictor.from_run_dir(str(tmp_path / 'raws'),
                                  exp.X_train, exp.Y_train,
                                  batch_size=8, num_samples=2, seed=7)
    assert pred.preprocessing is not None

    # Raw test rows (what a serving client would send).
    raw_flat, _, _, _ = data.load_dataset('mnist')
    raw = raw_flat[:8].reshape(8, 28, 28, 1)
    expected_std = ((raw.reshape(8, -1) - pred.preprocessing['mean'])
                    / pred.preprocessing['scale']).astype(np.float32)

    pred2 = Predictor.from_run_dir(str(tmp_path / 'raws'),
                                   exp.X_train, exp.Y_train,
                                   batch_size=8, num_samples=2, seed=7)
    p_raw = pred.predict_proba(raw, raw=True)
    p_std = pred2.predict_proba(expected_std)
    np.testing.assert_allclose(p_raw, p_std, rtol=1e-5, atol=1e-6)

    import pytest
    pred_no = Predictor(pred.model, batch_size=8, num_samples=2)
    with pytest.raises(ValueError, match='preprocessing'):
        pred_no.predict_proba(raw, raw=True)


def test_predictor_mesh_matches_single_device():
    """A mesh-backed Predictor (batch rows over 'data', patches over
    'model') returns the same probabilities and log-densities as the
    single-device one — serving scales over the training mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from deepcgp_tpu.models.builder import BuilderFlags, build_model
    from deepcgp_tpu.serving import Predictor

    rng = np.random.RandomState(0)
    flags = BuilderFlags(M='8,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', num_samples=2, batch_size=8)
    X = rng.randn(32, 12, 12, 1)
    Y = rng.randint(0, 10, size=(32, 1))
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float64)

    Xq = X[:20].reshape(20, -1)
    ref = Predictor(model, batch_size=8, num_samples=2)
    sh = Predictor(model, batch_size=8, num_samples=2,
                   mesh='data=4,model=2')
    p_ref = ref.predict_proba(Xq)
    p_sh = sh.predict_proba(Xq)
    np.testing.assert_allclose(p_sh, p_ref, rtol=1e-6, atol=1e-8)
    d_ref = ref.log_density(Xq, Y[:20])
    d_sh = sh.log_density(Xq, Y[:20])
    np.testing.assert_allclose(d_sh, d_ref, rtol=1e-6, atol=1e-8)
