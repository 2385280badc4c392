"""Coverage extras: scanned eval equivalence, k-means quality, TensorBoard
patch-covariance task, full-cov sampling."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from deepcgp_tpu.models.builder import BuilderFlags, build_model
from deepcgp_tpu.ops.kmeans import kmeans
from deepcgp_tpu.training import trainer


def _tiny():
    rng = np.random.RandomState(0)
    X = rng.randn(48, 8, 8, 1).astype(np.float32)
    Y = rng.randint(0, 10, size=(48, 1))
    flags = BuilderFlags(M='6,6', feature_maps='2', filter_sizes='3,3',
                         strides='2,1', num_samples=2, batch_size=8)
    return build_model(flags, X, Y, jax.random.PRNGKey(0),
                       dtype=jnp.float32), X, Y


def test_scanned_eval_matches_per_batch_eval():
    model, X, Y = _tiny()
    flat = jnp.asarray(X.reshape(48, -1))
    key = jax.random.PRNGKey(5)
    scanned = np.asarray(trainer.predict_probs_scanned(
        model, flat, key, batch_size=16, num_samples=2))
    # Same batches, same key-splitting order, one dispatch per batch.
    probs = []
    k = key
    for start in range(0, 48, 16):
        k, sub = jax.random.split(k)
        probs.append(np.asarray(trainer.predict_probs(
            model, flat[start:start + 16], sub, 2)))
    np.testing.assert_allclose(scanned, np.concatenate(probs), rtol=2e-5,
                               atol=1e-6)


def test_kmeans_recovers_separated_clusters():
    rng = np.random.RandomState(0)
    true_centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.concatenate([true_centers[i] + 0.1 * rng.randn(100, 2)
                        for i in range(3)])
    # k-means++ init (the last-layer inducing path); plain random init can
    # land in the two-seeds-in-one-cluster local optimum on purpose-built
    # data like this.
    out = np.asarray(kmeans(jax.random.PRNGKey(0), jnp.asarray(X), 3,
                            iters=20, init='k-means++'))
    # Each recovered center is within noise of one true center.
    d = np.linalg.norm(out[:, None, :] - true_centers[None], axis=-1)
    assert (d.min(axis=1) < 0.1).all()
    assert sorted(d.argmin(axis=1).tolist()) == [0, 1, 2]


def test_patch_covariance_logger_writes_image(tmp_path):
    from deepcgp_tpu.mnist import MNIST, read_args
    from deepcgp_tpu.utils.tensorboard import (PatchCovarianceLogger,
                                               TensorBoardLog)
    args = read_args([
        '--name', 'covlog', '-N', '48', '-M', '4,4',
        '--feature-maps', '2', '--filter-sizes', '5,5', '--strides', '2,2',
        '--test-every', '1', '--lr-decay-steps', '2', '--test-size', '16',
        '--num-samples', '2', '--batch-size', '8',
        '--log-dir', str(tmp_path), '--no-tensorboard'])
    exp = MNIST(args)
    try:
        tb = TensorBoardLog([PatchCovarianceLogger()], str(tmp_path / 'tb'),
                            'covlog')
        tb.write_entry(exp)
        tb.close()
    finally:
        exp.conclude()
    import os
    files = os.listdir(tmp_path / 'tb' / 'covlog')
    assert any(f.startswith('events') for f in files)


def test_sample_from_conditional_full_cov():
    model, X, _ = _tiny()
    layer = model.layers[1]  # SVGP last layer; input = hidden layer output
    rng = np.random.RandomState(1)
    flat = jnp.asarray(
        rng.randn(5, model.layers[0].num_outputs).astype(np.float32))
    sample, mean, var = layer.sample_from_conditional(
        flat, jax.random.PRNGKey(0), full_cov=True)
    assert mean.shape == (5, 10)
    assert var.shape == (5, 5, 10)
    assert sample.shape == (5, 10)
    assert np.isfinite(np.asarray(sample)).all()
    # Diagonal of the full covariance matches the diag-mode variance.
    _, _, var_diag = layer.sample_from_conditional(flat,
                                                   jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(var)[np.arange(5), np.arange(5)], np.asarray(var_diag),
        rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_regression_dgp_learns_step_function():
    """Gaussian-likelihood deep GP regression (the DGP core is likelihood-
    agnostic): ELBO improves and RMSE approaches the noise floor."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'examples'))
    from regression import build_regression_dgp
    from deepcgp_tpu.training.trainer import TrainConfig

    rng = np.random.RandomState(0)
    X = np.sort(rng.uniform(-3, 3, size=(128, 1)), axis=0)
    Y = np.where(X < 0, -1.0, 1.0) + 0.05 * rng.randn(128, 1)
    model = build_regression_dgp(X.astype(np.float32), num_inducing=16)
    config = TrainConfig(optimizer='Adam', lr=0.02, lr_decay_steps=2000,
                         gamma=0.001, batch_size=32)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd, Yd = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
    state, e0 = trainer.run_chunk(state, config, Xd, Yd, 50)
    state, e1 = trainer.run_chunk(state, config, Xd, Yd, 600)
    assert float(e1[-1]) > float(e0[0])
    mean, _ = state.model.predict_y(Xd, jax.random.PRNGKey(2), 10)
    rmse = float(jnp.sqrt(jnp.mean((jnp.mean(mean, 0) - Yd) ** 2)))
    assert rmse < 0.3, rmse


import pytest


@pytest.mark.parametrize('variant', ['white', 'acos'])
def test_training_variants_white_and_arccosine(variant):
    """Whitened layers and the ArcCosine base kernel must TRAIN (previous
    coverage only constructed them): finite improving ELBO over a chunk."""
    rng = np.random.RandomState(0)
    X = rng.randn(48, 8, 8, 1).astype(np.float32)
    Y = rng.randint(0, 10, size=(48, 1))
    flags = BuilderFlags(M='6,6', feature_maps='2', filter_sizes='3,3',
                         strides='2,1', num_samples=2, batch_size=8,
                         white=(variant == 'white'),
                         base_kernel='acos' if variant == 'acos' else 'rbf')
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float32)
    from deepcgp_tpu.training.trainer import TrainConfig
    config = TrainConfig(optimizer='Adam', lr=0.02, lr_decay_steps=1000,
                         gamma=0.001, batch_size=8)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd = jnp.asarray(X.reshape(48, -1))
    Yd = jnp.asarray(Y)
    state, elbos = trainer.run_chunk(state, config, Xd, Yd, 150)
    e = np.asarray(elbos)
    assert np.isfinite(e).all()
    assert e[-10:].mean() > e[:10].mean()


def test_mnist_parity_script_refuses_synthetic_data(tmp_path):
    """`make mnist-parity` must never 'pass' on the synthetic fallback: with
    no real mnist.npz the script exits 2 before building anything."""
    import subprocess, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DEEPCGP_DATA_DIR=str(tmp_path / 'nothing_here'))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'examples', 'mnist_parity.py')],
        env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 2
    assert 'real MNIST not found' in proc.stderr


def test_cifar_parity_script_refuses_synthetic_data(tmp_path):
    """`make cifar-parity` must never 'pass' on the synthetic fallback:
    with no real cifar10.npz the script exits 2 before building anything."""
    import subprocess, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, DEEPCGP_DATA_DIR=str(tmp_path / 'nothing_here'))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'examples', 'cifar_parity.py')],
        env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 2
    assert 'real CIFAR-10 not found' in proc.stderr
