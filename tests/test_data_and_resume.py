"""Data-module preprocessing parity + full-state checkpoint/resume."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcgp_tpu.models.builder import BuilderFlags, build_model
from deepcgp_tpu.training import data, trainer
from deepcgp_tpu.training.arguments import default_parser, train_steps
from deepcgp_tpu.training.trainer import TrainConfig
from deepcgp_tpu.utils import checkpoint as ckpt


def _flags(**kw):
    f = types.SimpleNamespace(N=100, test_size=40, seed=0)
    f.__dict__.update(kw)
    return f


def test_mnist_preprocessing_standardized():
    xtr, ytr, xte, yte = data.mnist_data(_flags())
    assert xtr.shape == (100, 28, 28, 1) and xtr.dtype == np.float32
    assert ytr.shape == (100, 1)
    flat = xtr.reshape(100, -1)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=1e-4)
    stds = flat.std(axis=0)
    assert np.all((np.isclose(stds, 1.0, atol=1e-3)) | (stds < 1e-6))
    assert xte.shape == (40, 28, 28, 1)


def test_digits_real_data_pipeline():
    """The bundled UCI digits set is REAL data (no synthetic fallback):
    fixed deterministic split, train/test disjoint, MNIST-style per-pixel
    standardization with zero-variance border pixels left finite."""
    f = _flags(N=1438, test_size=359)
    xtr, ytr, xte, yte = data.digits_data(f)
    assert xtr.shape == (1438, 8, 8, 1) and xtr.dtype == np.float32
    assert xte.shape == (359, 8, 8, 1)
    assert ytr.shape == (1438, 1) and set(np.unique(ytr)) <= set(range(10))
    assert np.isfinite(xtr).all() and np.isfinite(xte).all()
    flat = xtr.reshape(len(xtr), -1)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=1e-4)
    stds = flat.std(axis=0)
    assert np.all(np.isclose(stds, 1.0, atol=1e-3) | (stds < 1e-6))
    # Deterministic split, and train/test rows disjoint (real scans are
    # unique up to a handful of near-duplicates; exact-row overlap must
    # be zero for the fixed split).
    xtr2, _, xte2, _ = data.digits_data(_flags(N=1438, test_size=359))
    assert np.array_equal(xtr, xtr2) and np.array_equal(xte, xte2)
    tr_rows = {r.tobytes() for r in flat}
    te_rows = {r.tobytes() for r in xte.reshape(len(xte), -1)}
    assert not (tr_rows & te_rows)
    # Every class present in both splits.
    assert len(np.unique(ytr)) == 10 and len(np.unique(yte)) == 10


def test_digits_loader_refuses_synthetic_fallback(monkeypatch, tmp_path):
    """Fault injection (VERDICT r4 #4b / ADVICE r4): with the real loader
    poisoned and no digits.npz, load_dataset('digits') must RAISE — never
    hand back synthetic blobs under a real-data label — and bench's probe
    must turn that into a None (JSON null) instead of a fake accuracy."""
    monkeypatch.setattr(data, '_load_digits_raw', lambda: None)
    monkeypatch.setenv('DEEPCGP_DATA_DIR', str(tmp_path))  # no npz either
    with pytest.raises(RuntimeError, match='refusing the synthetic'):
        data.load_dataset('digits')
    with pytest.raises(RuntimeError):
        data.digits_data(_flags(N=1438, test_size=359))
    # bench._digits_probe maps the refusal to None before any device work.
    import bench
    assert bench._digits_probe() is None
    # An explicit digits.npz (real data provided out-of-band) is honored.
    H = 8
    xtr = np.random.RandomState(0).rand(10, H * H)
    np.savez(tmp_path / 'digits.npz', x_train=xtr,
             y_train=np.zeros(10, np.int64), x_test=xtr[:3],
             y_test=np.zeros(3, np.int64))
    out = data.load_dataset('digits')
    assert out[0].shape == (10, 64)


def test_cifar_tail_moves_to_test_and_normalizes():
    # Synthetic CIFAR has 6000 train points; ask for 5000 so 1000 move.
    f = _flags(N=5000, test_size=None)
    xtr, ytr, xte, yte = data.cifar_data(f)
    assert xtr.shape == (5000, 32, 32, 3)
    assert xte.shape[0] == 1000 + 1000  # moved tail + original test
    # Accumulate in f64: the returned arrays are f32 and np.std in f32
    # carries ~0.3% accumulation error over 5M elements.
    flat64 = xtr.astype(np.float64)
    np.testing.assert_allclose(flat64.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat64.std(axis=(0, 1, 2)), 1.0, atol=1e-5)


def test_train_steps_formula():
    f = _flags(lr=0.01, lr_decay_steps=100000, test_every=50000)
    # log_0.1(5e-5/0.01) = 2.301; ceil(100000*2.301/50000) = 5
    assert train_steps(f) == 5


def test_default_parser_reference_flags():
    args = default_parser().parse_args(
        ['--name', 'x', '-M', '64,64', '--feature-maps', '4',
         '--last-kernel', 'add', '--white'])
    assert args.M == '64,64' and args.white and args.last_kernel == 'add'
    assert args.optimizer == 'Adam' and args.gamma == 0.001


def test_digits_parser_defaults_match_8x8_geometry():
    """The digits entry shrinks the reference MNIST defaults to the 8x8
    geometry (filter 5 -> 16 patches, N=1438/359 split constants)."""
    from deepcgp_tpu.digits import read_args
    args = read_args(['--name', 'x'])
    assert args.M == '64' and args.filter_sizes == '5' and args.strides == '1'
    assert args.last_kernel == 'conv' and args.feature_maps == ''
    assert args.N == 1438 and args.test_size == 359
    assert args.batch_size == 64 and args.test_every == 1000
    # The measured-headline 2-layer invocation parses cleanly too.
    args2 = read_args(['--name', 'x', '-M', '64,64', '--feature-maps', '10',
                       '--filter-sizes', '3,3', '--strides', '1,1'])
    assert args2.M == '64,64' and args2.feature_maps == '10'


def _tiny_state():
    rng = np.random.RandomState(0)
    X = rng.randn(32, 8, 8, 1).astype(np.float32)
    Y = rng.randint(0, 10, size=(32, 1))
    flags = BuilderFlags(M='4,4', feature_maps='2', filter_sizes='3,3',
                         strides='2,1', num_samples=2, batch_size=8)
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float32)
    config = TrainConfig(optimizer='Adam', lr=0.01, lr_decay_steps=100,
                         gamma=0.001, batch_size=8)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    return state, config, X, Y


@pytest.mark.slow
def test_full_state_checkpoint_roundtrip(tmp_path):
    state, config, X, Y = _tiny_state()
    Xd = jnp.asarray(X.reshape(32, -1))
    Yd = jnp.asarray(Y)
    state, _ = trainer.run_chunk(state, config, Xd, Yd, 3)

    ckpt.save_train_state(str(tmp_path), state)
    assert ckpt.latest_train_state_step(str(tmp_path)) == 3

    fresh, _, _, _ = _tiny_state()
    restored = ckpt.restore_train_state(str(tmp_path), fresh)
    assert int(restored.step) == 3
    # Optimizer moments restored too (reference .npy drops them).
    orig_mu = jax.tree_util.tree_leaves(state.opt_state)[0]
    rest_mu = jax.tree_util.tree_leaves(restored.opt_state)[0]
    np.testing.assert_allclose(np.asarray(orig_mu), np.asarray(rest_mu))
    np.testing.assert_allclose(np.asarray(restored.model.layers[0].q_mu),
                               np.asarray(state.model.layers[0].q_mu))
    # Training continues from the restored state.
    cont, elbos = trainer.run_chunk(restored, config, Xd, Yd, 2)
    assert int(cont.step) == 5 and np.all(np.isfinite(np.asarray(elbos)))


def test_full_state_keep_policy(tmp_path):
    state, config, X, Y = _tiny_state()
    Xd = jnp.asarray(X.reshape(32, -1))
    Yd = jnp.asarray(Y)
    for _ in range(5):
        state, _ = trainer.run_chunk(state, config, Xd, Yd, 1)
        ckpt.save_train_state(str(tmp_path), state, keep=2)
    import os
    snaps = [d for d in os.listdir(tmp_path) if d.startswith('state_')]
    assert len(snaps) == 2
    assert ckpt.latest_train_state_step(str(tmp_path)) == 5


def test_predict_density_and_compute_ll():
    state, config, X, Y = _tiny_state()
    model = state.model
    Xd = jnp.asarray(X.reshape(32, -1)[:8])
    Yd = jnp.asarray(Y[:8])
    key = jax.random.PRNGKey(3)
    ll = model.compute_log_likelihood(Xd, Yd, key)
    np.testing.assert_allclose(float(ll), float(model.elbo(Xd, Yd, key)))
    dens = model.predict_density(Xd, Yd, key, S=3)
    assert dens.shape == (8, 1)
    assert np.all(np.asarray(dens) <= 0.0 + 1e-6)


def test_legacy_snapshot_detected_by_metadata(tmp_path):
    """A pre-``prev_model`` snapshot is detected EXPLICITLY (the key is
    absent from the orbax tree metadata) and migrated by seeding prev_model
    from the restored model; non-legacy snapshots take the normal restore
    path (ADVICE r2: the old bare ``except Exception`` masked genuine
    restore failures as legacy-migration errors)."""
    import os

    import orbax.checkpoint as ocp
    state, config, X, Y = _tiny_state()
    ng_config = TrainConfig(optimizer='NatGrad', lr=0.01, lr_decay_steps=100,
                            gamma=0.001, batch_size=8)
    ng_state = trainer.init_state(state.model, ng_config,
                                  jax.random.PRNGKey(1))
    # Legacy format: the TrainState fields of that era — no prev_model.
    legacy_tree = {'model': ng_state.model, 'opt_state': ng_state.opt_state,
                   'step': ng_state.step, 'steps_back': ng_state.steps_back,
                   'key': ng_state.key}
    with ocp.PyTreeCheckpointer() as c:
        c.save(os.path.join(tmp_path, 'state_0'), legacy_tree, force=True)
    restored = ckpt.restore_train_state(str(tmp_path), ng_state)
    np.testing.assert_allclose(
        np.asarray(restored.prev_model.layers[0].q_mu),
        np.asarray(restored.model.layers[0].q_mu))
    # Current-format snapshots restore through the normal path.
    ckpt.save_train_state(str(tmp_path), ng_state.replace(
        step=jnp.asarray(9, jnp.int32)))
    again = ckpt.restore_train_state(str(tmp_path), ng_state)
    assert int(again.step) == 9


def test_latest_state_ignores_orbax_tmp_dirs(tmp_path):
    """A crash mid-save leaves 'state_N.orbax-checkpoint-tmp-*' dirs; resume
    must skip them instead of raising ValueError."""
    import os
    os.makedirs(tmp_path / 'state_5')
    os.makedirs(tmp_path / 'state_7.orbax-checkpoint-tmp-123456')
    assert ckpt.latest_train_state_step(str(tmp_path)) == 5


@pytest.mark.slow
def test_resume_runs_remainder_of_schedule(tmp_path):
    """A resumed run executes only the remaining chunks of the flags'
    schedule (full-state resume restores the step)."""
    from deepcgp_tpu.mnist import MNIST, read_args
    argv = ['--name', 'rem', '-N', '64', '-M', '4,4',
            '--feature-maps', '2', '--filter-sizes', '5,5',
            '--strides', '2,2', '--test-every', '2', '--lr-decay-steps', '4',
            '--test-size', '32', '--num-samples', '2', '--batch-size', '8',
            '--log-dir', str(tmp_path), '--no-tensorboard',
            '--full-state-ckpt']
    exp = MNIST(read_args(argv))
    total = train_steps(exp.flags)
    assert total >= 2
    try:
        exp.train_step()  # 1 of `total` chunks
    finally:
        exp.conclude()

    exp2 = MNIST(read_args(argv))
    assert int(exp2.state.step) == 2  # resumed
    exp2.run()
    # run() did total-1 more chunks: final step == total * test_every.
    assert exp2.global_step == total * 2


def test_reference_options_toml_maps_onto_our_flags():
    """The reference's committed run config (verbatim content of
    `notebooks/data/cifar_fm10/options.toml`) must parse and map 1:1 onto
    this CLI's flag namespace — a user's old run configs stay valid."""
    import io
    import tomllib
    REFERENCE_OPTIONS = b'''
name = "cifar_fm10"
lr_decay_steps = 100000
test_every = 25000
test_size = 10000
num_samples = 10
log_dir = "/scratch/work/blomqvk1/results/"
lr = 0.01
batch_size = 32
optimizer = "Adam"
M = "384,384"
feature_maps = "10"
filter_sizes = "5,5"
strides = "3,1"
base_kernel = "rbf"
white = false
last_kernel = "conv"
gamma = 0.001
identity_mean = false
tensorboard_dir = "/scratch/work/blomqvk1/results/tensorboard"
N = 50000
'''
    opts = tomllib.load(io.BytesIO(REFERENCE_OPTIONS))
    parser_dests = {a.dest for a in default_parser()._actions}
    parser_dests |= {'tensorboard_dir', 'N', 'fashion'}  # per-dataset extras
    unmapped = set(opts) - parser_dests
    assert not unmapped, f"reference flags with no home: {unmapped}"
    # And the values drive the builder's geometry parsing unchanged.
    from deepcgp_tpu.models.builder import parse_ints
    assert parse_ints(opts['M']) == [384, 384]
    assert parse_ints(opts['strides']) == [3, 1]


def test_fashion_flag_selects_fashion_dataset(tmp_path):
    """--fashion routes the MNIST entry through the fashion-MNIST loader
    (`conv_gp/mnist.py:15-16` semantics); with no real data the synthetic
    fallback warns with the fashion dataset name and the experiment still
    runs end-to-end."""
    import warnings
    from deepcgp_tpu.mnist import MNIST, read_args
    args = read_args([
        '--name', 'fashion_probe', '-N', '64', '-M', '4,4',
        '--feature-maps', '2', '--filter-sizes', '5,5', '--strides', '2,2',
        '--test-every', '2', '--lr-decay-steps', '4', '--test-size', '16',
        '--num-samples', '2', '--batch-size', '8', '--fashion',
        '--log-dir', str(tmp_path), '--no-tensorboard'])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        exp = MNIST(args)
    assert any('fashion_mnist' in str(w.message) for w in rec)
    try:
        exp.train_step()
        assert np.isfinite(exp.last_mean_elbo)
    finally:
        exp.conclude()
