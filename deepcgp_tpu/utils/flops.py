"""Analytic FLOP accounting for one optimizer step (SURVEY.md §3.3 cost
lines; VERDICT r1 weak #7: the bench reported steps/s only, so nobody knew
whether the chip ran at 5% or 50% MFU).

Counts the matmul-shaped work that can land on the MXU — cross-covariances,
triangular solves, Choleskys, the conditional's mean / q_sqrt einsums and the
KL solves — for the doubly-stochastic forward pass, and models the backward
pass with the standard fwd+bwd ~= 3x forward multiplier.  Elementwise work
(exp epilogues, reparameterisation, likelihood quadrature) is bandwidth- not
FLOP-bound and is deliberately excluded, so the MFU figure is a *useful-work*
number in the conventional sense.

The analytic count is cross-checkable against XLA's own
``compiled.cost_analysis()['flops']`` (bench.py prints both).
"""

from __future__ import annotations

import re


def _conv_layer_flops(layer, N: int):
    """(per-evaluation flops, once-per-step flops) for a hidden ConvLayer.

    Geometry: P patch positions, M inducing patches of dim L, R GPs per
    position, batch N (reference hot path `conv_gp/layers.py:96-135` +
    `conditionals.py:6-67`).
    """
    P = layer.patch_count
    M = layer.num_inducing
    R = layer.gp_count
    L = layer.Z.shape[1]
    solves = 1 if layer.white else 2
    per_eval = (
        2 * P * N * M * L          # Kuf cross-covariance matmul
        + solves * P * N * M * M   # triangular solve(s), P*N rhs of size M
        + 2 * P * N * M * R        # fmean = A f
        + 2 * R * P * N * M * M    # q_sqrt variance term (A L per output GP)
    )
    per_step = (
        2 * M * M * L              # Kuu
        + M ** 3 // 3              # chol(Kuu)
        + (R + 1) * M ** 3         # KL: R M-rhs triangular solves + chol
    )
    return per_eval, per_step


def _svgp_layer_flops(layer, N: int):
    """Same for the last SVGPLayer (patch-sum ConvKernel/AdditivePatchKernel
    or plain RBF; dispatch mirrors `conv_gp/kernels.py:172-178`)."""
    M = layer.num_inducing
    R = layer.num_outputs
    L = layer.Z.shape[1]
    P = layer.kernel.view.patch_count if hasattr(layer.kernel, 'view') else 1
    solves = 1 if layer.white else 2
    per_eval = (
        2 * P * N * M * L          # Kzx (patch-summed when P > 1)
        + solves * N * M * M
        + 2 * N * M * R
        + 2 * R * N * M * M
    )
    per_step = (
        2 * M * M * L
        + M ** 3 // 3
        + (R + 1) * M ** 3
    )
    return per_eval, per_step


def training_step_flops(model, batch_size: int) -> float:
    """Analytic MXU FLOPs of ONE optimizer step (forward + backward).

    The first layer's conditional is evaluated once and sampled S times
    (sample-independent input — models/dgp.py); every later layer runs S
    evaluations.  Backward pass modelled as 2x forward (fwd+bwd = 3x).
    """
    S = model.num_samples
    total = 0.0
    for i, layer in enumerate(model.layers):
        if hasattr(layer, 'gp_count'):
            per_eval, per_step = _conv_layer_flops(layer, batch_size)
        else:
            per_eval, per_step = _svgp_layer_flops(layer, batch_size)
        evals = 1 if i == 0 else S
        total += evals * per_eval + per_step
    return 3.0 * total


# Peak dense-matmul throughput per chip, FLOP/s.  The library computes in
# f32, which the v5e MXU executes via bf16x3-style passes below the bf16
# peak; MFU is conventionally quoted against the bf16 peak, so the figure
# here is conservative.
TPU_PEAK_FLOPS = {
    'v5e': 197e12,        # TPU v5e / v5litepod, bf16
    'v5p': 459e12,
    'v4': 275e12,
    'v6e': 918e12,
}


def device_peak_flops(device) -> float:
    kind = getattr(device, 'device_kind', '').lower()
    # Real device_kind strings spell the litepod variants 'TPU v5 lite' /
    # 'TPU v6 lite'; normalize to the short 'v5e'/'v6e' aliases first.
    kind = re.sub(r'v(\d+)\s*lite', r'v\1e', kind)
    for key, peak in TPU_PEAK_FLOPS.items():
        if key in kind:
            return peak
    return float('nan')
