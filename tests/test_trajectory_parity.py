"""Full-pipeline trajectory parity: the library's jitted f64 train loop must
match the independent reference-equation trainer (tests/oracle_trainer.py)
step-for-step — ELBO values and every trainable parameter — from shared
initialisation, minibatches, and Monte-Carlo noise.

This is SURVEY.md §7 stage-4 evidence ("train-curve parity on the
results/N1000_M100 config") obtainable without the real datasets: if the
assembled 2-layer ELBO+gradient trajectory of the rebuild tracks a literal
transcription of `conv_gp/layers.py:96-152` + `conv_gp/conditionals.py:6-67`
+ `conv_gp/kernels.py:79-178` + gpflow's gauss_kl/RobustMax/Adam to ~1e-9
relative over 50 optimizer steps, the model math is the reference's.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle_trainer as ot
from deepcgp_tpu.models.builder import BuilderFlags, build_model
from deepcgp_tpu.training import trainer
from deepcgp_tpu.training.trainer import TrainConfig

RTOL = 1e-6   # VERDICT r1 item 1 requirement: rel <= 1e-6 over >= 50 steps


pytestmark = pytest.mark.slow  # full-pipeline matrix / multi-process tests (fast tier skips)

def _assert_close(a, b, msg):
    """rtol 1e-6 with an atol floor scaled to the ARRAY's magnitude:
    near-zero elements of an O(s) array receive Adam updates whose
    denominator sqrt(v)+eps amplifies f64-level gradient differences, so a
    flat elementwise rtol on them measures noise, not parity.  The floor is
    1e-7 * max|array| (zero-size-safe), i.e. still 10x tighter than the
    1e-6 relative requirement at array scale."""
    scale = float(np.max(np.abs(b))) if b.size else 0.0
    np.testing.assert_allclose(a, b, rtol=RTOL,
                               atol=1e-7 * scale + 1e-12, err_msg=msg)


def _compare_params(model, oparams, step):
    for i, layer in enumerate(model.layers):
        p = oparams[i]
        is_last = i == len(model.layers) - 1
        base = (getattr(layer.kernel, 'base_kernel', layer.kernel)
                if is_last else layer.base_kernel)
        lookup = {
            'q_mu': lambda: layer.q_mu,
            'q_sqrt': lambda: jnp.tril(layer.q_sqrt),
            'Z': lambda: layer.Z,
            'raw_variance': lambda: base.raw_variance,
            'raw_lengthscales': lambda: base.raw_lengthscales,
            'raw_weight_variances': lambda: base.raw_weight_variances,
            'raw_bias_variance': lambda: base.raw_bias_variance,
            'patch_weights': lambda: layer.kernel.patch_weights,
        }
        for name in p:
            _assert_close(np.asarray(lookup[name]()), np.asarray(p[name]),
                          f'step {step} layer {i} param {name}')


def _run_trajectory(flags, X, Y, *, steps, lr=0.01, lr_decay_steps=100000,
                    seed=0, optimizer='Adam', gamma=0.001):
    model = build_model(flags, X, Y, jax.random.PRNGKey(seed),
                        dtype=jnp.float64)
    return _drive_trajectory(model, flags.batch_size, X, Y, steps=steps,
                             lr=lr, lr_decay_steps=lr_decay_steps, seed=seed,
                             optimizer=optimizer, gamma=gamma)


def _drive_trajectory(model, batch_size, X, Y, *, steps, lr=0.01,
                      lr_decay_steps=100000, seed=0, optimizer='Adam',
                      gamma=0.001):
    N = X.shape[0]
    # Perturb q_mu away from the symmetric zero init (SHARED by both
    # trainers): at exactly q_mu=0 everywhere the ELBO's q_mu gradients
    # cancel to f64 noise (~1e-16), and Adam's g/(|g|+eps) normalisation
    # turns that noise into arbitrary-sign updates — the trajectories
    # would diverge from seeds that carry no information about parity.
    prng = np.random.RandomState(seed + 100)
    layers = tuple(
        layer.replace(q_mu=layer.q_mu + 0.05 * jnp.asarray(
            prng.randn(*layer.q_mu.shape)))
        for layer in model.layers)
    model = model.replace(layers=layers)
    config = TrainConfig(optimizer=optimizer, lr=lr,
                         lr_decay_steps=lr_decay_steps, gamma=gamma,
                         batch_size=batch_size)
    state = trainer.init_state(model, config, jax.random.PRNGKey(seed + 1))

    oparams = ot.params_from_model(model)
    ostatics = ot.statics_from_model(model)
    oadam = ot.adam_init(oparams)
    out_dims = [layer.num_outputs for layer in model.layers]
    S = model.num_samples

    oracle_loss_and_grad = jax.jit(jax.value_and_grad(
        lambda p, xb, yb, zs: -ot.elbo(p, ostatics, xb, yb, zs, N)))
    step_jit = jax.jit(lambda s, x, y: trainer.train_step(s, config, x, y))

    rng = np.random.RandomState(seed + 2)
    Xd = jnp.asarray(X.reshape(N, -1), jnp.float64)
    Yd = jnp.asarray(Y)
    key = state.key
    for t in range(steps):
        idx = rng.randint(0, N, size=batch_size)
        xb, yb = Xd[idx], Yd[idx]

        # Replicate the library step's PRNG path to share the MC noise.
        key, k_mc = jax.random.split(key)
        zs = ot.noise_like(k_mc, S, batch_size, out_dims, jnp.float64)

        state, elbo_lib = step_jit(state, xb, yb)
        loss_o, grads_o = oracle_loss_and_grad(oparams, xb, yb, zs)
        lr_t = ot.learning_rate(lr, lr_decay_steps, t)
        if optimizer == 'NatGrad':
            gamma_t = ot.gamma_schedule(t, gamma)
            oparams, oadam = ot.natgrad_adam_step(oparams, grads_o, oadam,
                                                  lr_t, gamma_t)
        else:
            oparams, oadam = ot.adam_step(oparams, grads_o, oadam, lr_t)

        np.testing.assert_allclose(float(elbo_lib), -float(loss_o),
                                   rtol=RTOL, err_msg=f'ELBO at step {t}')
        _compare_params(state.model, oparams, t + 1)
    return state, oparams


def test_trajectory_parity_two_layer():
    """2-layer assembly (`conv_gp/models.py:43-70`): ConvLayer with
    identity mean + ConvKernel SVGP last layer, 50 Adam steps."""
    rng = np.random.RandomState(0)
    X = rng.randn(96, 12, 12, 1)
    Y = rng.randint(0, 10, size=(96, 1))
    flags = BuilderFlags(M='6,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', identity_mean=True, num_samples=3,
                         batch_size=8)
    _run_trajectory(flags, X, Y, steps=50)


def test_trajectory_parity_natgrad():
    """NatGrad wiring (`conv_gp/experiment.py:90-108`): natural gradient on
    (q_mu, q_sqrt) + Adam on hyperparameters, vs the textbook XiNat
    transcription (explicit inverses, per-GP loop) — 30 steps.  Catches
    formula-level natgrad errors at f64; the f32 multi-step canary in
    test_training.py covers the numerical-conditioning class that f64
    parity cannot see."""
    rng = np.random.RandomState(2)
    X = rng.randn(96, 12, 12, 1)
    Y = rng.randint(0, 10, size=(96, 1))
    flags = BuilderFlags(M='6,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', num_samples=3, batch_size=8)
    _run_trajectory(flags, X, Y, steps=30, optimizer='NatGrad')


@pytest.mark.slow
def test_trajectory_parity_n1000_m100_config():
    """The `results/N1000_M100` config (reference options.toml: N=1000,
    M=100, lr=0.01, defaults otherwise => single ConvKernel SVGP layer on
    28x28 images, filter 5, batch 32, S=10), 50 Adam steps."""
    rng = np.random.RandomState(1)
    X = rng.randn(1000, 28, 28, 1)
    Y = rng.randint(0, 10, size=(1000, 1))
    flags = BuilderFlags(M='100', feature_maps='', filter_sizes='5',
                         strides='1', num_samples=10, batch_size=32)
    _run_trajectory(flags, X, Y, steps=50)


def test_trajectory_parity_acos():
    """ArcCosine order-0 base kernel (`conv_gp/models.py:118-119`, gpflow 1.2
    ArcCosine formulas): full-trajectory parity of the acos hidden layer —
    Kuu/Kuf/KL all flow through the weighted-product/acos math and its
    weight_variances/bias_variance gradients."""
    rng = np.random.RandomState(3)
    X = rng.randn(96, 12, 12, 1)
    Y = rng.randint(0, 10, size=(96, 1))
    flags = BuilderFlags(M='6,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', base_kernel='acos', num_samples=3,
                         batch_size=8)
    _run_trajectory(flags, X, Y, steps=25)


def test_trajectory_parity_white():
    """--white (`conv_gp/layers.py:89,145`): identity q_sqrt init, whitened
    conditional (no unwhitening backsubstitution) and identity-prior KL on
    BOTH layers."""
    rng = np.random.RandomState(4)
    X = rng.randn(96, 12, 12, 1)
    Y = rng.randint(0, 10, size=(96, 1))
    flags = BuilderFlags(M='6,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', white=True, num_samples=3,
                         batch_size=8)
    _run_trajectory(flags, X, Y, steps=25)


def test_trajectory_parity_last_kernel_rbf_ard():
    """--last-kernel rbf (`conv_gp/models.py:160-168`): plain ARD RBF over
    the flattened hidden-layer output, per-dimension lengthscale gradients,
    k-means-on-data inducing init."""
    rng = np.random.RandomState(5)
    X = rng.randn(96, 12, 12, 1)
    Y = rng.randint(0, 10, size=(96, 1))
    flags = BuilderFlags(M='6,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', last_kernel='rbf', num_samples=3,
                         batch_size=8)
    _run_trajectory(flags, X, Y, steps=25)


def test_trajectory_parity_last_kernel_add():
    """--last-kernel add (`conv_gp/kernels.py:15-77`): AdditivePatchKernel's
    per-position weighted-mean Kdiag (vs ConvKernel's double sum) with
    trainable patch weights."""
    rng = np.random.RandomState(6)
    X = rng.randn(96, 12, 12, 1)
    Y = rng.randint(0, 10, size=(96, 1))
    flags = BuilderFlags(M='6,8', feature_maps='2', filter_sizes='5,3',
                         strides='2,1', last_kernel='add', num_samples=3,
                         batch_size=8)
    _run_trajectory(flags, X, Y, steps=25)


def test_trajectory_parity_random_partial_patchwise():
    """RandomPartialView + PatchwiseConv2d (`conv_gp/views.py:70-114`,
    `conv_gp/mean_functions.py:43-59`): hidden layer over a fixed random
    subset of stride-1 patch positions with the patchwise centre-pixel mean.
    Not reachable from the reference CLI flags (the builder only constructs
    FullView) — assembled directly, like the reference's own tests."""
    import jax.numpy as jnp

    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.conv_kernels import ConvKernel
    from deepcgp_tpu.models.dgp import DGP
    from deepcgp_tpu.models.layers import ConvLayer, SVGPLayer
    from deepcgp_tpu.models.likelihoods import MultiClass
    from deepcgp_tpu.models.mean_functions import PatchwiseConv2d, Zero
    from deepcgp_tpu.models.views import FullView, RandomPartialView

    rng = np.random.RandomState(7)
    N = 96
    X = rng.randn(N, 12, 12, 1)
    Y = rng.randint(0, 10, size=(N, 1))

    view1 = RandomPartialView(input_size=(12, 12), filter_size=5,
                              feature_maps=1, patch_count=9, seed=11)
    base1 = RBF.create(5.0, 5.0, dtype=jnp.float64)
    Z1 = jnp.asarray(rng.randn(6, 25))
    layer1 = ConvLayer.create(
        base1, view1, Z1,
        mean_function=PatchwiseConv2d.create(5, 1, dtype=jnp.float64),
        gp_count=1, q_sqrt_scale=1e-5, dtype=jnp.float64)

    # Layer-1 output: patch_count=9 -> 3x3 single-map image.
    view2 = FullView(input_size=(3, 3), filter_size=3, feature_maps=1,
                     stride=1)
    base2 = RBF.create(5.0, 5.0, dtype=jnp.float64)
    Z2 = jnp.asarray(rng.randn(8, 9))
    layer2 = SVGPLayer.create(ConvKernel.create(base2, view2,
                                                dtype=jnp.float64),
                              Z2, num_outputs=10,
                              mean_function=Zero(output_dim=10),
                              dtype=jnp.float64)

    model = DGP(layers=(layer1, layer2), likelihood=MultiClass(10),
                num_data=N, num_samples=3)
    _drive_trajectory(model, 8, X, Y, steps=25, seed=7)
