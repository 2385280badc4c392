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
