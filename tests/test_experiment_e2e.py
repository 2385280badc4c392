"""End-to-end Experiment lifecycle on the CPU backend: train -> eval ->
CSV/TOML/TensorBoard/.npy artifacts -> checkpoint reload."""

import os

import numpy as np

from deepcgp_tpu.mnist import MNIST, read_args


def _args(tmp_path, *extra):
    return read_args([
        '--name', 'e2e', '-N', '64', '-M', '4,4',
        '--feature-maps', '2', '--filter-sizes', '5,5', '--strides', '2,2',
        '--test-every', '2', '--lr-decay-steps', '4', '--test-size', '32',
        '--num-samples', '2', '--batch-size', '8',
        '--log-dir', str(tmp_path),
        '--tensorboard-dir', str(tmp_path / 'tb'), *extra])


def test_experiment_full_lifecycle(tmp_path):
    exp = MNIST(_args(tmp_path))
    try:
        exp.train_step()
        exp.train_step()
    finally:
        exp.conclude()

    run_dir = tmp_path / 'e2e'
    csv_lines = (run_dir / 'log.csv').read_text().strip().splitlines()
    assert csv_lines[0].startswith('Entry,global_step,lr,test_accuracy')
    assert len(csv_lines) == 3  # header + 2 entries
    toml = (run_dir / 'options.toml').read_text()
    assert 'name = "e2e"' in toml and 'M = "4,4"' in toml
    assert os.path.exists(tmp_path / 'e2e.npy')

    # TensorBoard events written by the tensorboardX tasks.
    tb_run = tmp_path / 'tb' / 'e2e'
    assert any(f.startswith('events') for f in os.listdir(tb_run))

    # The .npy snapshot reloads into a fresh model via --load-model.
    exp2 = MNIST(_args(tmp_path, '--load-model', 'e2e', '--no-tensorboard'))
    try:
        assert exp2.global_step == 4
        np.testing.assert_allclose(
            np.asarray(exp2.state.model.layers[0].q_mu),
            np.asarray(exp.state.model.layers[0].q_mu), rtol=1e-6)
    finally:
        exp2.conclude()


def test_eval_key_fresh_per_step():
    """Eval MC noise decorrelates across epochs (the reference draws fresh
    samples each eval, `conv_gp/utils/log.py:62`) while staying reproducible:
    the key derives from (seed, global_step), not from seed alone."""
    from deepcgp_tpu.training.experiment import eval_key
    k100 = np.asarray(eval_key(0, 100))
    assert not np.array_equal(k100, np.asarray(eval_key(0, 200)))
    np.testing.assert_array_equal(k100, np.asarray(eval_key(0, 100)))
    assert not np.array_equal(k100, np.asarray(eval_key(1, 100)))


def test_natgrad_warm_start_flag(tmp_path):
    """--natgrad-warm-steps N runs N Adam steps before handing the warmed
    model to NatGrad: the variational state moves off the cold init, the
    global step stays 0 (the warm phase is a pre-phase, not schedule
    progress), and the subsequent NatGrad chunk trains normally."""
    cold = MNIST(_args(tmp_path, '--optimizer', 'NatGrad',
                       '--no-tensorboard'))
    cold.conclude()
    exp = MNIST(read_args([
        '--name', 'ngwarm', '-N', '64', '-M', '4,4',
        '--feature-maps', '2', '--filter-sizes', '5,5', '--strides', '2,2',
        '--test-every', '2', '--lr-decay-steps', '4', '--test-size', '32',
        '--num-samples', '2', '--batch-size', '8',
        '--log-dir', str(tmp_path), '--no-tensorboard',
        '--optimizer', 'NatGrad', '--natgrad-warm-steps', '3']))
    try:
        assert exp.global_step == 0
        assert exp.state.prev_model is not ()  # NatGrad state, not Adam's
        # The warm Adam phase moved the variational state off the cold init.
        assert not np.allclose(np.asarray(exp.state.model.layers[0].q_mu),
                               np.asarray(cold.state.model.layers[0].q_mu))
        exp.train_step()
        assert np.isfinite(exp.last_mean_elbo)
        assert exp.global_step == 2
    finally:
        exp.conclude()


def test_digits_experiment_real_data_lifecycle(tmp_path):
    """The UCI-digits entry wires REAL data through the full Experiment
    lifecycle (the only entry whose data needs no synthetic fallback):
    two chunks must improve the ELBO and write the standard artifacts."""
    from deepcgp_tpu.digits import Digits, read_args
    exp = Digits(read_args([
        '--name', 'dge2e', '-N', '256', '-M', '8',
        '--test-every', '5', '--lr-decay-steps', '10', '--test-size', '64',
        '--num-samples', '2', '--batch-size', '16',
        '--log-dir', str(tmp_path), '--no-tensorboard']))
    try:
        exp.train_step()
        first = exp.last_mean_elbo
        exp.train_step()
        second = exp.last_mean_elbo
    finally:
        exp.conclude()
    assert np.isfinite(first) and np.isfinite(second) and second > first
    csv_lines = ((tmp_path / 'dge2e') / 'log.csv').read_text().splitlines()
    assert len(csv_lines) == 3  # header + 2 entries
    assert os.path.exists(tmp_path / 'dge2e.npy')
