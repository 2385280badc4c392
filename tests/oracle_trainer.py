"""Full-pipeline reference-equation trainer (float64 oracle).

An INDEPENDENT literal transcription of the reference's complete training
math — model assembly, patch extraction, kernels, conditional, KLs,
robust-max likelihood, doubly-stochastic ELBO, Adam — written in the
reference's own layouts and equation order, with gradients by autodiff of
the transcribed forward math:

* RBF per gpflow 1.2 ``Stationary.square_dist`` (expanded form, no clamp);
* patch extraction per ``tf.extract_image_patches`` ordering
  (`conv_gp/views.py:34-44`), via literally-constructed gather indices;
* ``conditional`` per `conv_gp/conditionals.py:6-67` (P-major layout,
  map-style per-patch solves);
* ``MultiOutputConvKernel`` per `conv_gp/layers.py:12-50`;
* ``ConvLayer.conditional_ND`` / ``KL`` per `conv_gp/layers.py:96-152`
  (frozen-Z prior, patch-major output reshape);
* ``ConvKernel.Kzx``/``Kdiag`` per `conv_gp/kernels.py:106-137`;
* final ``SVGP_Layer`` per its call-site contract (`conv_gp/models.py:192-198`,
  the reference `conditional` with P=1);
* ``gauss_kl`` per gpflow 1.2 (dense solves + slogdet — deliberately NOT the
  triangular-solve form the library uses);
* robust-max variational expectations per gpflow ``RobustMax.prob_is_largest``
  (explicit per-class loop);
* DGP ELBO per Salimbeni-Deisenroth: S reparameterised sample paths,
  jitter-floored sampling noise, N/batch scaling
  (`conv_gp/models.py:66-70` call contract);
* Adam in the exact optax ``scale_by_adam`` formulation the trainer uses.

``tests/test_trajectory_parity.py`` drives this trainer and the library's
jitted ``trainer.train_step`` from SHARED initial parameters, minibatches,
and Monte-Carlo noise, and requires the ELBO + parameter trajectories to
match step-for-step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

JITTER = 1e-3           # reference gpflowrc:10
POSITIVE_LOWER = 1e-6   # gpflow Log1pe lower bound


# ------------------------------------------------------------ primitives
def log1pe(x):
    """gpflow Log1pe forward: softplus(x) + lower."""
    return jnp.logaddexp(x, 0.0) + POSITIVE_LOWER


def rbf_K(raw_variance, raw_lengthscales, X, X2=None):
    """gpflow 1.2 RBF: variance * exp(-0.5 * square_dist(X/ls, X2/ls)),
    square_dist in the expanded form Xs - 2 X X2^T + X2s (no clamping)."""
    var = log1pe(raw_variance)
    ls = log1pe(raw_lengthscales)
    X = X / ls
    X2 = X if X2 is None else X2 / ls
    Xs = jnp.sum(jnp.square(X), axis=-1)
    X2s = jnp.sum(jnp.square(X2), axis=-1)
    d2 = Xs[:, None] - 2.0 * X @ X2.T + X2s[None, :]
    return var * jnp.exp(-0.5 * d2)


def rbf_Kdiag(raw_variance, raw_lengthscales, X):
    return jnp.full(X.shape[:-1], 1.0, X.dtype) * log1pe(raw_variance)


def acos_weighted_product(raw_wv, raw_bv, X, X2=None):
    """gpflow 1.2 ArcCosine._weighted_product."""
    w = log1pe(raw_wv)
    b = log1pe(raw_bv)
    if X2 is None:
        return jnp.sum(w * jnp.square(X), axis=1) + b
    return (w * X) @ X2.T + b


def acos_K(p, X, X2=None, order=0):
    """gpflow 1.2 ArcCosine.K, order 0 (`conv_gp/models.py:118-119` builds
    ``kernels.ArcCosine(patch_length, order=0)``): K = variance/pi * J(theta)
    with theta = acos(jittered cos), J_0 = pi - theta; the order-0 norm
    factors are (.)^0 = 1."""
    var = log1pe(p['raw_variance'])
    denom_X = jnp.sqrt(acos_weighted_product(p['raw_weight_variances'],
                                             p['raw_bias_variance'], X))
    if X2 is None:
        X2 = X
        denom_X2 = denom_X
    else:
        denom_X2 = jnp.sqrt(acos_weighted_product(p['raw_weight_variances'],
                                                  p['raw_bias_variance'], X2))
    numerator = acos_weighted_product(p['raw_weight_variances'],
                                      p['raw_bias_variance'], X, X2)
    cos_theta = numerator / denom_X[:, None] / denom_X2[None, :]
    jitter = 1e-15  # gpflow's f64 guard (the oracle runs in f64)
    theta = jnp.arccos(jitter + (1.0 - 2.0 * jitter) * cos_theta)
    assert order == 0
    J = math.pi - theta
    return var * (1.0 / math.pi) * J


def acos_Kdiag(p, X, order=0):
    """gpflow 1.2 ArcCosine.Kdiag: variance/pi * J(0) * product^order;
    J_0(0) = pi, so order 0 is just the variance."""
    assert order == 0
    var = log1pe(p['raw_variance'])
    return jnp.full(X.shape[:-1], 1.0, X.dtype) * var


def base_K(kind, p, X, X2=None):
    """Per-layer base-kernel dispatch (`conv_gp/models.py:114-121`)."""
    if kind == 'acos':
        return acos_K(p, X, X2)
    return rbf_K(p['raw_variance'], p['raw_lengthscales'], X, X2)


def base_Kdiag(kind, p, X):
    if kind == 'acos':
        return acos_Kdiag(p, X)
    return rbf_Kdiag(p['raw_variance'], p['raw_lengthscales'], X)


def _patch_pixel_indices(H, W, filter_size, stride):
    """Flat pixel indices [P, fh*fw] in tf.extract_image_patches order,
    built with literal loops."""
    Hout = (H - filter_size) // stride + 1
    Wout = (W - filter_size) // stride + 1
    rows = []
    for i in range(Hout):
        for j in range(Wout):
            pix = []
            for di in range(filter_size):
                for dj in range(filter_size):
                    pix.append((i * stride + di) * W + (j * stride + dj))
            rows.append(pix)
    return np.asarray(rows, dtype=np.int32)


def extract_patches_NPL(NHWC_X, filter_size, stride):
    """[N,H,W,C] -> [N,P,L] with (fh, fw, C) fastest-last-C element order
    (`conv_gp/views.py:34-44`)."""
    N, H, W, C = NHWC_X.shape
    idx = _patch_pixel_indices(H, W, filter_size, stride)
    flat = NHWC_X.reshape(N, H * W, C)
    patches = flat[:, idx.reshape(-1), :]            # [N, P*fh*fw, C]
    P = idx.shape[0]
    return patches.reshape(N, P, idx.shape[1] * C)


def conditional(Kmn, Kmm, Knn, f, *, full_cov=False, q_sqrt=None,
                white=False):
    """Literal transcription of `conv_gp/conditionals.py:6-67`.
    Kmn: [P,M,N]; Kmm: [M,M]; Knn: [P,N] or [P,N,N]; f: [M,R];
    q_sqrt: [R,M,M].  Returns (fmean [N,P,R], fvar [R,P,N(,N)])."""
    R = f.shape[1]
    Lm = jnp.linalg.cholesky(Kmm)

    def solve_A(MN_Kmn):
        return lax.linalg.triangular_solve(Lm, MN_Kmn, left_side=True,
                                           lower=True)
    A = jax.vmap(solve_A)(Kmn)                       # P x M x N

    if full_cov:
        fvar = Knn - jnp.einsum('pmn,pmk->pnk', A, A)
        fvar = jnp.tile(fvar[None], (R, 1, 1, 1))
    else:
        fvar = Knn - jnp.sum(jnp.square(A), axis=1)  # P x N
        fvar = jnp.tile(fvar[None], (R, 1, 1))

    if not white:
        def backsub(MN_A):
            return lax.linalg.triangular_solve(Lm.T, MN_A, left_side=True,
                                               lower=False)
        A = jax.vmap(backsub)(A)

    fmean = jnp.tensordot(A, f, ((1,), (0,)))        # P x N x R
    fmean = jnp.transpose(fmean, (1, 0, 2))          # N x P x R

    if q_sqrt is not None:
        L = jnp.tril(q_sqrt)                         # R x M x M
        LTA = jnp.tensordot(L, A, ((1,), (1,)))      # R x M x P x N
        if full_cov:
            fvar = fvar + jnp.tensordot(LTA, LTA, ((1,), (1,)))
        else:
            fvar = fvar + jnp.sum(jnp.square(LTA), axis=1)
    return fmean, fvar


def gauss_kl(q_mu, q_sqrt, K=None):
    """gpflow 1.2 gauss_kl via dense solves + slogdet (R small: python loop).
    q_mu [M,R]; q_sqrt [R,M,M]; K shared [M,M] or None (whitened)."""
    M, R = q_mu.shape
    Lq = jnp.tril(q_sqrt)
    kl = jnp.zeros((), q_mu.dtype)
    if K is not None:
        logdet_K = jnp.linalg.slogdet(K)[1]
    for r in range(R):
        S = Lq[r] @ Lq[r].T
        m = q_mu[:, r]
        if K is None:
            trace = jnp.trace(S)
            mKm = m @ m
            logdet_prior = 0.0
        else:
            trace = jnp.trace(jnp.linalg.solve(K, S))
            mKm = m @ jnp.linalg.solve(K, m)
            logdet_prior = logdet_K
        logdet_S = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diag(Lq[r]))))
        kl = kl + 0.5 * (trace + mKm - M - logdet_S + logdet_prior)
    return kl


def prob_is_largest(Y, mu, var, num_classes, num_gh=20):
    """gpflow RobustMax.prob_is_largest, explicit per-class loop.
    Y [N,1] int; mu, var [N,K].  Returns [N,1]."""
    gh_x, gh_w = np.polynomial.hermite.hermgauss(num_gh)
    gh_x = jnp.asarray(gh_x, mu.dtype)
    gh_w = jnp.asarray(gh_w, mu.dtype)
    mu_sel = jnp.take_along_axis(mu, Y, axis=1)      # [N,1]
    var_sel = jnp.take_along_axis(var, Y, axis=1)
    X = mu_sel + gh_x[None, :] * jnp.sqrt(
        jnp.clip(2.0 * var_sel, 1e-10, np.inf))      # [N,H]
    prod = jnp.ones_like(X)
    for j in range(num_classes):
        dist = (X - mu[:, j:j + 1]) / jnp.sqrt(
            jnp.clip(var[:, j:j + 1], 1e-10, np.inf))
        cdf = 0.5 * (1.0 + lax.erf(dist / math.sqrt(2.0)))
        cdf = cdf * (1.0 - 2e-4) + 1e-4
        prod = prod * jnp.where(Y == j, jnp.ones_like(cdf), cdf)
    p = prod @ gh_w / math.sqrt(math.pi)
    return p[:, None]


def multiclass_variational_expectations(Y, mu, var, num_classes, eps=1e-3):
    p = prob_is_largest(Y, mu, var, num_classes)
    return p * math.log(1.0 - eps) + \
        (1.0 - p) * math.log(eps / (num_classes - 1.0))


# ------------------------------------------------------------ layer forwards
def _partial_patch_indices(H, W, filter_size, flat_indices):
    """Pixel indices [P, fh*fw] for a RandomPartialView's selected stride-1
    patch positions (reference extracts by literal slices,
    `conv_gp/views.py:106-114`); ``flat_indices`` index the full stride-1
    grid row-major."""
    Wout = W - filter_size + 1
    rows = []
    for flat in flat_indices:
        i, j = flat // Wout, flat % Wout
        pix = []
        for di in range(filter_size):
            for dj in range(filter_size):
                pix.append((i + di) * W + (j + dj))
        rows.append(pix)
    return np.asarray(rows, dtype=np.int32)


def layer_patches_NPL(st, NHWC_X):
    if st.get('patch_indices') is not None:
        N, H, W, C = NHWC_X.shape
        idx = _partial_patch_indices(H, W, st['filter_size'],
                                     st['patch_indices'])
        flat = NHWC_X.reshape(N, H * W, C)
        patches = flat[:, idx.reshape(-1), :]
        return patches.reshape(N, idx.shape[0], idx.shape[1] * C)
    return extract_patches_NPL(NHWC_X, st['filter_size'], st['stride'])


def conv_layer_forward(p, st, ND_X):
    """`conv_gp/layers.py:96-135`.  ``p``: dict(q_mu, q_sqrt, Z, + base
    kernel raw params); ``st``: static geometry dict with ``base_kernel`` in
    ('rbf', 'acos'), ``mean`` in ('zero', 'conv2d', 'patchwise'), and
    optional ``patch_indices`` (RandomPartialView)."""
    N = ND_X.shape[0]
    H, W = st['input_size']
    NHWC_X = ND_X.reshape(N, H, W, st['feature_maps'])
    NPL = layer_patches_NPL(st, NHWC_X)
    PNL = jnp.transpose(NPL, (1, 0, 2))
    M = p['Z'].shape[0]
    kind = st.get('base_kernel', 'rbf')

    Kuu = base_K(kind, p, p['Z']) + \
        jnp.eye(M, dtype=ND_X.dtype) * JITTER        # layers.py:18-21
    Kuf = jax.vmap(lambda NL: base_K(kind, p, p['Z'], NL))(PNL)  # P x M x N
    Knn = jax.vmap(lambda NL: base_Kdiag(kind, p, NL))(PNL)

    mean, var = conditional(Kuf, Kuu, Knn, p['q_mu'], full_cov=False,
                            q_sqrt=p['q_sqrt'], white=st['white'])
    R = p['q_mu'].shape[1]
    P = PNL.shape[0]
    var = jnp.transpose(var, (2, 1, 0)).reshape(N, P * R)
    mean = mean.reshape(N, P * R)

    if st['mean'] == 'conv2d':
        # Conv2dMean: centre-pixel copy of channel 0 into output map 0,
        # zeros elsewhere, flattened (`conv_gp/mean_functions.py:28-41`).
        f, s = st['filter_size'], st['stride']
        c = f // 2
        Ho = (H - f) // s + 1
        Wo = (W - f) // s + 1
        center = NHWC_X[:, c:c + s * Ho:s, c:c + s * Wo:s, 0]
        maps = [center] + [jnp.zeros_like(center)] * (R - 1)
        mean = mean + jnp.stack(maps, axis=-1).reshape(N, -1)
    elif st['mean'] == 'patchwise':
        # PatchwiseConv2d over the view's mean_view (= the selected patches,
        # `conv_gp/views.py:116-117`): matmul with the centre-pixel delta
        # kernel, [N, P] (`conv_gp/mean_functions.py:43-59`; R = 1).
        f = st['filter_size']
        C = st['feature_maps']
        kernel = np.zeros((f * f * C, 1))
        kernel[(f // 2 * f + f // 2) * C + 0, 0] = 1.0
        pw = jnp.einsum('npl,lo->npo', NPL, jnp.asarray(kernel, ND_X.dtype))
        mean = mean + pw[..., 0]
    return mean, var


def conv_layer_kl(p, st):
    """`conv_gp/layers.py:137-152`: prior Kuu from the FROZEN Z snapshot,
    current kernel hyperparameters."""
    if st['white']:
        return gauss_kl(p['q_mu'], p['q_sqrt'], None)
    Z0 = st['Z0']
    M = Z0.shape[0]
    Kp = base_K(st.get('base_kernel', 'rbf'), p, Z0) + \
        jnp.eye(M, dtype=Z0.dtype) * JITTER
    return gauss_kl(p['q_mu'], p['q_sqrt'], Kp)


def last_layer_forward(p, st, ND_X):
    """Final SVGP layer (the external SVGP_Layer's conditional is the
    reference `conditional` at P=1) with the last-kernel dispatch of
    `conv_gp/models.py:160-191`:

    * 'conv' — ConvKernel double patch sum (`conv_gp/kernels.py:79-137`);
    * 'add'  — AdditivePatchKernel per-position weighted mean
               (`conv_gp/kernels.py:15-77`);
    * 'rbf'  — plain ARD RBF on the flattened input
               (`conv_gp/models.py:160-168`)."""
    N = ND_X.shape[0]
    last = st.get('last_kernel', 'conv')
    M = p['Z'].shape[0]

    if last == 'rbf':
        Kzx = rbf_K(p['raw_variance'], p['raw_lengthscales'], p['Z'], ND_X)
        Kmm = rbf_K(p['raw_variance'], p['raw_lengthscales'], p['Z']) + \
            jnp.eye(M, dtype=ND_X.dtype) * JITTER
        Kdiag = rbf_Kdiag(p['raw_variance'], p['raw_lengthscales'], ND_X)
    else:
        H, W = st['input_size']
        C = st['feature_maps']
        NHWC_X = ND_X.reshape(N, H, W, C)
        patches = extract_patches_NPL(NHWC_X, st['filter_size'],
                                      st['stride'])
        P = patches.shape[1]
        L = patches.shape[2]
        w = p['patch_weights']

        # Kzx: both patch kernels share the weighted patch MEAN contraction
        # (`conv_gp/kernels.py:63-77,117-133`).
        Kzx = rbf_K(p['raw_variance'], p['raw_lengthscales'], p['Z'],
                    patches.reshape(N * P, L))
        Kzx = jnp.sum(Kzx.reshape(M, N, P) * w, axis=2) / P

        # Kuu dispatch (`conv_gp/kernels.py:172-174`): Kzz + jitter I.
        Kmm = rbf_K(p['raw_variance'], p['raw_lengthscales'], p['Z']) + \
            jnp.eye(M, dtype=ND_X.dtype) * JITTER

        if last == 'conv':
            # ConvKernel.Kdiag: per-image weighted double sum / P^2
            # (`conv_gp/kernels.py:106-115`).
            W2 = w[None, :] * w[:, None]
            Kdiag = jax.vmap(
                lambda pn: jnp.sum(rbf_K(p['raw_variance'],
                                         p['raw_lengthscales'],
                                         pn) * W2))(patches) / (P ** 2)
        else:
            # AdditivePatchKernel.Kdiag: weighted mean of per-position
            # Kdiags (`conv_gp/kernels.py:53-61`).
            PN = jax.vmap(lambda pl: rbf_Kdiag(
                p['raw_variance'], p['raw_lengthscales'], pl))(
                    jnp.transpose(patches, (1, 0, 2)))
            Kdiag = jnp.mean(PN * w[:, None], axis=0)

    mean, var = conditional(Kzx[None], Kmm, Kdiag[None], p['q_mu'],
                            full_cov=False, q_sqrt=p['q_sqrt'],
                            white=st['white'])
    return mean[:, 0, :], var[:, 0].T                # [N,R], [N,R]


def last_layer_kl(p, st):
    """External SVGP_Layer KL: prior Kuu from the CURRENT Z."""
    if st['white']:
        return gauss_kl(p['q_mu'], p['q_sqrt'], None)
    M = p['Z'].shape[0]
    Kp = rbf_K(p['raw_variance'], p['raw_lengthscales'], p['Z']) + \
        jnp.eye(M, dtype=p['Z'].dtype) * JITTER
    return gauss_kl(p['q_mu'], p['q_sqrt'], Kp)


# ------------------------------------------------------------ DGP ELBO
def elbo(params, statics, X, Y, z_list, num_data, num_classes=10):
    """Salimbeni-Deisenroth doubly-stochastic minibatch ELBO with EXPLICIT
    reparameterisation noise ``z_list`` (one [S,N,O_l] array per layer)."""
    n_layers = len(params)
    S = z_list[0].shape[0]

    def sample_path(zs):
        F = X
        mean = var = None
        for i in range(n_layers):
            if i < n_layers - 1:
                mean, var = conv_layer_forward(params[i], statics[i], F)
            else:
                mean, var = last_layer_forward(params[i], statics[i], F)
            F = mean + zs[i] * jnp.sqrt(var + JITTER)
        return mean, var

    Fmean, Fvar = jax.vmap(sample_path)(tuple(z_list))  # [S,N,K] each
    ve = jax.vmap(lambda m, v: multiclass_variational_expectations(
        Y, m, v, num_classes))(Fmean, Fvar)             # [S,N,1]
    ell = jnp.sum(jnp.mean(ve, axis=0))

    kl = jnp.zeros((), X.dtype)
    for i in range(n_layers):
        if i < n_layers - 1:
            kl = kl + conv_layer_kl(params[i], statics[i])
        else:
            kl = kl + last_layer_kl(params[i], statics[i])
    scale = num_data / X.shape[0]
    return scale * ell - kl


# ------------------------------------------------------------ Adam trainer
ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def adam_init(params):
    zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    return {'m': zeros(params), 'v': zeros(params), 't': 0}


def adam_step(params, grads, opt, lr):
    t = opt['t'] + 1
    m = jax.tree_util.tree_map(
        lambda m_, g: ADAM_B1 * m_ + (1 - ADAM_B1) * g, opt['m'], grads)
    v = jax.tree_util.tree_map(
        lambda v_, g: ADAM_B2 * v_ + (1 - ADAM_B2) * g * g, opt['v'], grads)
    def upd(p, m_, v_):
        mhat = m_ / (1 - ADAM_B1 ** t)
        vhat = v_ / (1 - ADAM_B2 ** t)
        return p - lr * mhat / (jnp.sqrt(vhat) + ADAM_EPS)
    params = jax.tree_util.tree_map(upd, params, m, v)
    return params, {'m': m, 'v': v, 't': t}


def learning_rate(lr0, decay_steps, step):
    """Staircase exponential decay (`conv_gp/experiment.py:72-73`)."""
    return lr0 * 0.1 ** (step // decay_steps)


# -------------------------------------------------------- natural gradient
# Literal transcription of gpflow's NatGradOptimizer with the default XiNat
# transform (Salimbeni, Eleftheriadis & Hensman 2018, eq. 10-12), per
# independent GP with EXPLICIT inverses — textbook form, deliberately
# structurally different from the library's batched solve-based
# implementation (training/optim.py) so agreement is evidence, not
# tautology.


def gamma_schedule(step, gamma0):
    """min((step/100 * 1e-3 + gamma0), 1) — `conv_gp/experiment.py:74-80`
    with steps_back = 0 (no failures on these smooth parity problems)."""
    return min(step / 100.0 * 1e-3 + gamma0, 1.0)


def natgrad_update(q_mu, q_sqrt, dq_mu, dq_sqrt, gamma):
    """One XiNat step for all R GPs of a layer (columns of q_mu [M, R],
    slices of q_sqrt [R, M, M]); loss gradients dq_* in the same layout."""
    M, R = q_mu.shape
    new_mu = []
    new_W = []
    for r in range(R):
        m = q_mu[:, r]
        W = jnp.tril(q_sqrt[r])
        S = W @ W.T

        # Expectation parameters eta = (m, S + m m^T); pull the loss
        # gradient (dm, dW) back through xi = (m, chol(S)) as a function
        # of eta via autodiff of the LITERAL map.
        eta1, eta2 = m, S + jnp.outer(m, m)

        def xi_of_eta(e1, e2):
            return e1, jnp.linalg.cholesky(e2 - jnp.outer(e1, e1))

        _, vjp = jax.vjp(xi_of_eta, eta1, eta2)
        deta1, deta2 = vjp((dq_mu[:, r], jnp.tril(dq_sqrt[r])))

        # Natural parameters theta = (S^-1 m, -1/2 S^-1), stepped along
        # dL/deta, then mapped back (explicit inverses, f64).
        Sinv = jnp.linalg.inv(S)
        theta1 = Sinv @ m - gamma * deta1
        theta2 = -0.5 * Sinv - gamma * deta2

        S_new = jnp.linalg.inv(-2.0 * theta2)
        m_new = S_new @ theta1
        new_mu.append(m_new)
        new_W.append(jnp.linalg.cholesky(S_new))
    return jnp.stack(new_mu, axis=1), jnp.stack(new_W, axis=0)


def natgrad_adam_step(params, grads, opt, lr, gamma):
    """The reference's NatGrad wiring (`conv_gp/experiment.py:90-108`):
    natural-gradient step on every layer's (q_mu, q_sqrt), Adam on all the
    other parameters (variational grads zeroed so their moments stay 0 and
    Adam leaves them untouched)."""
    variational = {}
    masked = []
    for i, p in enumerate(params):
        variational[i] = natgrad_update(p['q_mu'], p['q_sqrt'],
                                        grads[i]['q_mu'],
                                        grads[i]['q_sqrt'], gamma)
        g = dict(grads[i])
        g['q_mu'] = jnp.zeros_like(g['q_mu'])
        g['q_sqrt'] = jnp.zeros_like(g['q_sqrt'])
        masked.append(g)
    params, opt = adam_step(params, masked, opt, lr)
    for i, (mu_new, W_new) in variational.items():
        params[i] = dict(params[i])
        params[i]['q_mu'] = mu_new
        params[i]['q_sqrt'] = W_new
    return params, opt


# ------------------------------------------------ bridge from built models
def params_from_model(model):
    """Mirror a deepcgp_tpu DGP's trainable parameters into the oracle's
    plain-dict representation (shared initialisation)."""
    from deepcgp_tpu.models.base_kernels import ArcCosine
    params = []
    for i, layer in enumerate(model.layers):
        is_last = i == len(model.layers) - 1
        base = getattr(layer.kernel, 'base_kernel', layer.kernel) \
            if is_last else layer.base_kernel
        p = {
            'q_mu': jnp.asarray(layer.q_mu),
            'q_sqrt': jnp.tril(jnp.asarray(layer.q_sqrt)),
            'Z': jnp.asarray(layer.Z),
            'raw_variance': jnp.asarray(base.raw_variance),
        }
        if isinstance(base, ArcCosine):
            p['raw_weight_variances'] = jnp.asarray(base.raw_weight_variances)
            p['raw_bias_variance'] = jnp.asarray(base.raw_bias_variance)
        else:
            p['raw_lengthscales'] = jnp.asarray(base.raw_lengthscales)
        if is_last and hasattr(layer.kernel, 'patch_weights'):
            p['patch_weights'] = jnp.asarray(layer.kernel.patch_weights)
        params.append(p)
    return params


def statics_from_model(model):
    from deepcgp_tpu.models.base_kernels import ArcCosine
    from deepcgp_tpu.models.conv_kernels import ConvKernel
    from deepcgp_tpu.models.mean_functions import (Conv2dMean,
                                                   PatchwiseConv2d, Zero)
    from deepcgp_tpu.models.views import RandomPartialView
    statics = []
    for i, layer in enumerate(model.layers):
        is_last = i == len(model.layers) - 1
        if is_last:
            view = getattr(layer.kernel, 'view', None)
            if view is None:
                st = {'last_kernel': 'rbf', 'white': layer.white}
                statics.append(st)
                continue
            st = {
                'last_kernel': 'conv' if isinstance(layer.kernel, ConvKernel)
                else 'add',
            }
        else:
            base = layer.base_kernel
            view = layer.view
            st = {'base_kernel': 'acos' if isinstance(base, ArcCosine)
                  else 'rbf'}
        st.update({
            'input_size': tuple(view.input_size),
            'filter_size': view.filter_size,
            'stride': view.stride,
            'feature_maps': view.feature_maps,
            'white': layer.white,
        })
        if isinstance(view, RandomPartialView):
            st['patch_indices'] = tuple(view.patch_indices)
        if not is_last:
            st['Z0'] = jnp.asarray(layer.Z0)
            if isinstance(layer.mean_function, PatchwiseConv2d):
                st['mean'] = 'patchwise'
            elif isinstance(layer.mean_function, Conv2dMean):
                st['mean'] = 'conv2d'
            else:
                assert isinstance(layer.mean_function, Zero)
                st['mean'] = 'zero'
        statics.append(st)
    return statics


def noise_like(k_mc, S, N, out_dims, dtype):
    """Replicate deepcgp_tpu.models.dgp.DGP.propagate's PRNG path: one
    split + mc_normal per layer, shapes [S, N, O_l].  mc_normal is the
    library's rbg-backed draw — using the identical helper keeps the oracle
    in bit-lockstep with the trainer (the oracle's independence is about
    the MATH; both sides only need the same iid N(0,1) stream)."""
    from deepcgp_tpu.models.dgp import mc_normal
    zs = []
    key = k_mc
    for O in out_dims:
        key, sub = jax.random.split(key)
        zs.append(mc_normal(sub, (S, N, O), dtype))
    return zs
