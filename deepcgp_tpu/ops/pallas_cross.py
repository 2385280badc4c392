"""Fused patch-extraction -> RBF cross-covariance Pallas kernel.

The last layer's per-step pair (Kzx [N, M], Kdiag [N]) — the patch-sum
kernel of `conv_gp/kernels.py:106-133` evaluated through
`conv_gp/models.py:192-198` — computed straight from the HBM-resident
image in ONE Pallas pass per direction, so the [N, P, L] im2col tensor
NEVER exists in HBM, forward or backward (VERDICT r4 next #1).

Why: the round-5 bytes audit (tools/bytes_audit.py) attributed 261.7 us of
the 978.7 us flagship device step to `layers.py:395` — the remat'd
backward of the extraction->cross chain — plus ~85 us of forward
extraction/assembly: 35% of the step on ~10 GFLOP of work, i.e. ~27 TF/s
effective, limited by materialized [320, 36, 250] / [320, 36, 384]
intermediates and their layout-hampered conv-style lowerings, not by the
math.  Both tensors fit VMEM per image block, so the fused kernel runs the
whole chain at MXU rate with HBM traffic = images + Z + [N, M] outputs.

Math (scalar-lengthscale RBF, `models/base_kernels.py:56-69` semantics,
gamma = -0.5 / lengthscale^2):

    patches[n]   = im2col(x_n)                 (transposed patch order,
                                                ops/pallas_patches.py)
    K[n,p,m]     = var * exp(gamma * max(pn_p + zn_m - 2 patches Z^T, 0))
    Kzx[n,m]     = sum_p u_p K[n,p,m]          (u = perm(w)/P)
    Kd[n,p,q]    = var * exp(gamma * max(pn_p + pn_q - 2 patches patches^T, 0))
    Kdiag[n]     = sum_pq wkd_p wkd_q Kd[n,p,q] / P^2   (ConvKernel only)

The clamp mirrors ops/distances.py::square_distance (f32 safety).  The
custom VJP recomputes patches/K in VMEM and emits dimg (via the shared
col2im), dZ, and the scalar/vector hyperparameter gradients as per-block
partials summed outside — nothing [N, P, *]-shaped touches HBM.

In-kernel matmuls run FULL f32 by default — strictly more precise than
the DEFAULT (single-pass bf16) XLA contractions they replace, and
measured perf-identical at shipped geometries (the kernels are
extraction/issue-bound, not MXU-pass-bound; see `_bf16`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepcgp_tpu.ops import pallas_linalg
from deepcgp_tpu.ops.patches import out_size
from deepcgp_tpu.ops.pallas_patches import col2im_into, extract_into

# VMEM working set per image is dominated by the [P, M] kernel/cotangent
# values and the [P, L] patches; the budget keeps block_b * per-image well
# under the 16MB scoped stack (backward holds ~3 [P, M]-sized values live).
_VMEM_BUDGET = 13 << 20


def _per_image_bytes(P: int, L: int, M: int, itemsize: int) -> int:
    lane = 128
    Lp = -(-L // lane) * lane
    Mp = -(-M // lane) * lane
    Pp = -(-P // lane) * lane
    # patches + dpatches, ~3 live [P, M] values, gram/S values [P, P].
    return itemsize * (2 * P * Lp + 3 * P * Mp + 3 * P * Pp)


def _pick_block(N: int, P: int, L: int, M: int, itemsize: int = 4) -> int:
    """Largest batch block that (a) divides N, (b) fits the VMEM budget,
    and (c) satisfies Mosaic's output-tiling rule — the [b, M] / [b, 1]
    output blocks need their second-to-last dim divisible by 8 OR equal
    to the full array dim (b == N).  Returns 0 when no legal block exists
    (gates refuse the geometry)."""
    per_img = _per_image_bytes(P, L, M, itemsize)
    fixed = 2 * itemsize * M * (-(-L // 128) * 128)      # Z + dZ
    cap = max((_VMEM_BUDGET - fixed) // per_img, 0)
    cap = min(int(cap), N, int(os.environ.get('DEEPCGP_PALLAS_CROSS_BLOCK',
                                              '32')))
    Pp = -(-P // 128) * 128
    for b in range(cap, 0, -1):
        if N % b != 0 or not (b % 8 == 0 or b == N):
            continue
        # Selection matrices (segu + seg0 [b, bP], qt [bP, Ppad]) ride the
        # backward's working set — admit b only if they fit too.
        sel = itemsize * b * P * (2 * b + Pp)
        if fixed + b * per_img + sel <= _VMEM_BUDGET:
            return b
    return 0


def _bf16(interpret: bool) -> bool:
    """Matmul operand precision inside the kernels.  Default FULL f32 —
    measured perf-IDENTICAL to bf16 operands at the flagship geometry
    (58.1 vs 57.2 us; the kernel is extraction/issue-bound, not
    MXU-pass-bound), and strictly MORE precise than the DEFAULT
    single-pass-bf16 XLA contractions this path replaces.
    DEEPCGP_PALLAS_CROSS_BF16=1 opts in to bf16 operands (f32
    accumulate) for geometries where the MXU rate dominates; interpret
    mode (CPU oracles) always stays f32."""
    return (not interpret
            and os.environ.get('DEEPCGP_PALLAS_CROSS_BF16', '0') == '1')


def _geometry(view):
    H, W = view.input_size
    C = view.feature_maps
    f, s, d = view.filter_size, view.stride, view.dilation
    Hout, Wout = out_size(H, f, s, d), out_size(W, f, s, d)
    return H, W, C, f, s, d, Hout, Wout


# Mosaic note (hard-won, see the round-5 bisect): rank-1 values inside a
# TPU Pallas kernel crash this Mosaic version's layout inference
# (`layout.h:320 Check failed: arr.size() >= layout_rank`), so EVERY
# intermediate below stays >= 2-D — axis reductions keep dims or run as
# dot_generals against a ones vector, vector params are read as [1, P]
# rows, and outer products are contractions over a singleton dim.  No
# transposes of skinny matrices either ([1, M] -> [M, 1] relayouts); the
# column/row form each consumer needs is produced directly by the
# contraction that computes it.  MULTI-axis reductions hit the same
# assert (bisect5 case e: sum(axis=(1, 2)) SIGABRTs where every chained
# single-axis sum passes) — all reductions below go one axis at a time.
# Also avoided, same-assert suspects never cleared by the construct
# sweep: [b, P] -> [b*P, 1] reshapes (lane->sublane relayout; the flat
# row norm is computed directly in [bP, 1] form instead) and dropping a
# TRAILING unit dim ([b, P, 1] -> [b, P]).
#
# Second Mosaic failure class (round-5 digits geometry, M=64):
# [bP, M] <-> [b, P, M] reshapes lower as "unsupported shape cast" when
# M < 128 lanes.  Every patch-axis fold/unfold around the flat [bP, M]
# kernel matrix therefore runs as a 2-D matmul against small selection
# matrices built OUTSIDE the kernel: segu [b, bP] with
# segu[n, n*P+p] = u_p (kzx = segu @ K; AU = segu^T @ dKzx), seg0 its
# 0/1 indicator, and qt [bP, P] with qt[n*P+p, p] = 1 (folds a [1, bP]
# row of per-(n, p) partials to the [1, P] patch gradient).


def _zn_row(Zv):
    """[1, M] row of squared Z norms without a 1-D value or a transpose:
    ones [1, L] contracted with (Z*Z) over L."""
    ones = jnp.ones((1, Zv.shape[1]), Zv.dtype)
    return lax.dot_general(ones, Zv * Zv, (((1,), (1,)), ((), ())),
                           preferred_element_type=Zv.dtype)


def _make_dot(bf16):
    """dot_general, optionally with bf16 operands + f32 accumulation (the
    DEFAULT-precision semantics of the XLA path this kernel replaces).
    See :func:`_bf16` for the measured default (full f32 — the kernels
    are extraction/issue-bound, so the operand precision is perf-neutral
    at shipped geometries)."""
    def dot(a, b, dims, batch=((), ())):
        out_dt = a.dtype
        if bf16:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return lax.dot_general(a, b, (dims, batch),
                               preferred_element_type=out_dt)
    return dot


# --------------------------------------------------------------- forward
def _fwd_kernel(img_ref, z_ref, scal_ref, segu_ref, wkd_ref, kzx_ref, kd_ref,
                patches_ref, *, f, stride, dilation, Hout, Wout, C,
                with_kdiag, bf16):
    b = img_ref.shape[0]
    P = Hout * Wout
    M, L = z_ref.shape
    var = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    dot = _make_dot(bf16)

    extract_into(img_ref[:], patches_ref, f=f, stride=stride,
                 dilation=dilation, Hout=Hout, Wout=Wout, C=C)
    patches = patches_ref[:]                                # [b, P, L]
    Zv = z_ref[:]                                           # [M, L]
    zn = _zn_row(Zv)                                        # [1, M]

    flat = patches.reshape(b * P, L)
    pnc = jnp.sum(flat * flat, axis=1, keepdims=True)       # [bP, 1]
    cross = dot(flat, Zv, ((1,), (1,)))                     # [bP, M]
    D = pnc + zn - 2.0 * cross
    K = var * jnp.exp(gamma * jnp.maximum(D, 0.0))
    # Kzx[n] = sum_p u_p K[n*P+p]: one [b, bP] x [bP, M] matmul against
    # the weight-selection matrix (see the Mosaic note — no [bP, M] ->
    # [b, P, M] shape cast; Mosaic rejects it at M < 128).
    kzx_ref[:] = dot(segu_ref[:], K, ((1,), (0,)))

    if with_kdiag:
        pn = jnp.sum(patches * patches, axis=-1)            # [b, P]
        G = dot(patches, patches, ((2,), (2,)),
                batch=((0,), (0,)))                         # [b, P, P]
        E = pn[:, :, None] + pn[:, None, :] - 2.0 * G
        Kd = var * jnp.exp(gamma * jnp.maximum(E, 0.0))
        w2 = wkd_ref[:]                                     # [1, P]
        # Outer product as a contraction over the singleton dim: [P, P].
        W2 = lax.dot_general(w2, w2, (((0,), (0,)), ((), ())),
                             preferred_element_type=w2.dtype) / (P * P)
        kd_ref[:] = jnp.sum(jnp.sum(Kd * W2[None], axis=2), axis=1,
                            keepdims=True)
    else:
        kd_ref[:] = jnp.zeros_like(kd_ref)


def _fwd_call(NHWC_X, Z, variance, gamma, u, wkd, view, with_kdiag,
              interpret):
    N = NHWC_X.shape[0]
    H, W, C, f, s, d, Hout, Wout = _geometry(view)
    P, (M, L) = Hout * Wout, Z.shape
    dt = NHWC_X.dtype
    b = _pick_block(N, P, L, M, dt.itemsize)
    img = NHWC_X.reshape(N, H, W * C)
    scal = jnp.stack([jnp.asarray(variance, dt),
                      jnp.asarray(gamma, dt)]).reshape(1, 2)
    kern = functools.partial(_fwd_kernel, f=f, stride=s, dilation=d,
                             Hout=Hout, Wout=Wout, C=C,
                             with_kdiag=with_kdiag, bf16=_bf16(interpret))
    segu = jnp.kron(jnp.eye(b, dtype=dt), u.reshape(1, P).astype(dt))
    kzx, kd = pl.pallas_call(
        kern,
        grid=(N // b,),
        in_specs=[
            pl.BlockSpec((b, H, W * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((M, L), lambda i: (0, 0)),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, b * P), lambda i: (0, 0)),
            pl.BlockSpec((1, P), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((b, M), lambda i: (i, 0)),
                   pl.BlockSpec((b, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, M), dt),
                   jax.ShapeDtypeStruct((N, 1), dt)],
        scratch_shapes=[pltpu.VMEM((b, P, L), dt)],
        interpret=interpret,
    )(img, Z, scal, segu, wkd.reshape(1, P).astype(dt))
    return kzx, kd[:, 0]


# -------------------------------------------------------------- backward
def _bwd_kernel(img_ref, z_ref, scal_ref, segu_ref, seg0_ref, qt_ref,
                wkd_ref, dkzx_ref, dkd_ref,
                dimg_ref, dz_ref, misc_ref,
                patches_ref, *, f, stride, dilation, Hout, Wout, C,
                with_kdiag, bf16):
    b = img_ref.shape[0]
    P = Hout * Wout
    M, L = z_ref.shape
    var = scal_ref[0, 0]
    gamma = scal_ref[0, 1]
    dot = _make_dot(bf16)

    extract_into(img_ref[:], patches_ref, f=f, stride=stride,
                 dilation=dilation, Hout=Hout, Wout=Wout, C=C)
    patches = patches_ref[:]                                # [b, P, L]
    Zv = z_ref[:]
    zn = _zn_row(Zv)                                        # [1, M]

    flat = patches.reshape(b * P, L)
    pnc = jnp.sum(flat * flat, axis=1, keepdims=True)       # [bP, 1]
    cross = dot(flat, Zv, ((1,), (1,)))                     # [bP, M]
    D = pnc + zn - 2.0 * cross
    Dhat = jnp.maximum(D, 0.0)
    K = var * jnp.exp(gamma * Dhat)                          # [bP, M]
    one = jnp.ones((), K.dtype)

    A = dkzx_ref[:]                                          # [b, M]
    # AU[n*P+p] = u_p * A[n]: the selection-matrix transpose (see the
    # Mosaic note — no [b, P, M] -> [bP, M] shape cast).
    AU = dot(segu_ref[:], A, ((0,), (0,)))                   # [bP, M]
    AUK = AU * K                                             # [bP, M]
    # Chained single-axis reductions only (see the Mosaic note above).
    dvar = jnp.sum(jnp.sum(AUK, axis=1, keepdims=True),
                   axis=0, keepdims=True) / var              # [1, 1]
    dgamma = jnp.sum(jnp.sum(AUK * Dhat, axis=1, keepdims=True),
                     axis=0, keepdims=True)
    # d/dD of var*exp(gamma*max(D,0)): gamma*K on D > 0, else 0.
    T = AUK * (gamma * jnp.where(D > 0, one, 0.0 * one))
    dflat = dot(T, Zv, ((1,), (0,))) * -2.0                  # [bP, L]
    dZ = dot(T, flat, ((0,), (0,))) * -2.0                   # [M, L]
    dpn = jnp.sum(T, axis=1, keepdims=True)                  # [bP, 1]
    # dzn in COLUMN form directly (a [1, M] -> [M, 1] relayout is a
    # Mosaic-suspect transpose): T^T-contraction against a ones column.
    ones_x = jnp.ones((b * P, 1), K.dtype)
    dzn_col = dot(T, ones_x, ((0,), (0,)))                   # [M, 1]
    # du_p = sum_{n, m} A[n, m] K[n*P+p, m]: F[n, j] = sum_m A[n, m] K[j, m]
    # masked to each image's own rows (seg0), folded over n, then over the
    # patch replicas (qt) — three 2-D matmuls, no 3-D reshape of K.
    F = dot(A, K, ((1,), (1,)))                              # [b, bP]
    ones_b = jnp.ones((1, b), K.dtype)
    t_row = dot(ones_b, F * seg0_ref[:], ((1,), (0,)))       # [1, bP]
    du = dot(t_row, qt_ref[:], ((1,), (0,)))                 # [1, P]

    if with_kdiag:
        pn = jnp.sum(patches * patches, axis=-1)             # [b, P]
        G = dot(patches, patches, ((2,), (2,)),
                batch=((0,), (0,)))                          # [b, P, P]
        E = pn[:, :, None] + pn[:, None, :] - 2.0 * G
        Ehat = jnp.maximum(E, 0.0)
        Kd = var * jnp.exp(gamma * Ehat)
        w2 = wkd_ref[:]                                      # [1, P]
        W2 = lax.dot_general(w2, w2, (((0,), (0,)), ((), ())),
                             preferred_element_type=w2.dtype) / (P * P)
        dd = dkd_ref[:]                                      # [b, 1]
        base = dd[:, :, None] * W2[None] * Kd                # [b, P, P]
        bsum = jnp.sum(jnp.sum(base, axis=2), axis=1, keepdims=True)
        dvar = dvar + jnp.sum(bsum, axis=0, keepdims=True) / var
        gsum = jnp.sum(jnp.sum(base * Ehat, axis=2), axis=1, keepdims=True)
        dgamma = dgamma + jnp.sum(gsum, axis=0, keepdims=True)
        S = base * (gamma * jnp.where(E > 0, one, 0.0 * one))
        Ssym = S + jnp.swapaxes(S, 1, 2)
        dflat = dflat + dot(Ssym, patches, ((2,), (1,)),
                            batch=((0,), (0,))).reshape(b * P, L) * -2.0
        dpn3 = jnp.sum(Ssym, axis=2, keepdims=True)          # [b, P, 1]
        # dKdiag/dw_r = d/P^2 * sum_q w_q (Kd_rq + Kd_qr).
        KdS = Kd + jnp.swapaxes(Kd, 1, 2)
        tmp = jnp.sum(KdS * w2[:, None, :], axis=2)          # [b, P]
        tmp = (dd * tmp) / (P * P)                           # [b, P]
        dwkd = dot(ones_b, tmp, ((1,), (0,)))                # [1, P]
    else:
        dpn3 = None
        dwkd = jnp.zeros((1, P), K.dtype)

    # pn = sum_l patches^2  =>  dpatches += 2 * patches * dpn.  The kdiag
    # contribution is applied in [b, P, 1] form (no [b, P] -> [bP, 1]
    # reshape — another Mosaic-suspect relayout).
    dpatches = (dflat + 2.0 * flat * dpn).reshape(b, P, L)
    if with_kdiag:
        dpatches = dpatches + 2.0 * patches * dpn3
    col2im_into(dpatches, dimg_ref, f=f, stride=stride, dilation=dilation,
                Hout=Hout, Wout=Wout, C=C)
    # zn enters every row of D identically: dZ += 2 Z * dzn (per-m scalar).
    dz_ref[0] = dZ + 2.0 * Zv * dzn_col
    # Packed scalar/vector partials (Mosaic's output-tiling rule forbids
    # (1, 2)/(1, P)-shaped blocks over (nb, *)-shaped arrays; one padded
    # [8, PL] row-block per grid step, static-slice ref stores):
    # row 0 = du, row 1 = dwkd, row 2 = [dvar, dgamma, 0, ...].
    misc_ref[:] = jnp.zeros_like(misc_ref)
    misc_ref[0:1, 0:P] = du
    misc_ref[1:2, 0:P] = dwkd
    misc_ref[2:3, 0:1] = dvar
    misc_ref[2:3, 1:2] = dgamma


def _bwd_call(NHWC_X, Z, variance, gamma, u, wkd, view, with_kdiag,
              interpret, dkzx, dkd):
    N = NHWC_X.shape[0]
    H, W, C, f, s, d, Hout, Wout = _geometry(view)
    P, (M, L) = Hout * Wout, Z.shape
    dt = NHWC_X.dtype
    b = _pick_block(N, P, L, M, dt.itemsize)
    nb = N // b
    img = NHWC_X.reshape(N, H, W * C)
    scal = jnp.stack([jnp.asarray(variance, dt),
                      jnp.asarray(gamma, dt)]).reshape(1, 2)
    kern = functools.partial(_bwd_kernel, f=f, stride=s, dilation=d,
                             Hout=Hout, Wout=Wout, C=C,
                             with_kdiag=with_kdiag, bf16=_bf16(interpret))
    PL = -(-max(P, 2) // 128) * 128
    segu = jnp.kron(jnp.eye(b, dtype=dt), u.reshape(1, P).astype(dt))
    seg0 = jnp.asarray(np.kron(np.eye(b), np.ones((1, P))), dt)
    qt = jnp.asarray(np.tile(np.eye(P), (b, 1)), dt)         # [bP, P]
    dimg, dz, misc = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((b, H, W * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((M, L), lambda i: (0, 0)),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b, b * P), lambda i: (0, 0)),
            pl.BlockSpec((b, b * P), lambda i: (0, 0)),
            pl.BlockSpec((b * P, P), lambda i: (0, 0)),
            pl.BlockSpec((1, P), lambda i: (0, 0)),
            pl.BlockSpec((b, M), lambda i: (i, 0)),
            pl.BlockSpec((b, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, H, W * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, M, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((8, PL), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W * C), dt),
            jax.ShapeDtypeStruct((nb, M, L), dt),
            jax.ShapeDtypeStruct((nb * 8, PL), dt),
        ],
        scratch_shapes=[pltpu.VMEM((b, P, L), dt)],
        interpret=interpret,
    )(img, Z, scal, segu, seg0, qt, wkd.reshape(1, P).astype(dt),
      dkzx, dkd.reshape(N, 1))
    # Per-block partials -> full gradients (tiny [nb, ...] sums).
    dimg = dimg.reshape(NHWC_X.shape)
    dZ = jnp.sum(dz, axis=0)
    misc = misc.reshape(nb, 8, PL)
    dvar = jnp.sum(misc[:, 2, 0]).astype(jnp.asarray(variance).dtype)
    dgamma = jnp.sum(misc[:, 2, 1]).astype(jnp.asarray(gamma).dtype)
    du = jnp.sum(misc[:, 0, :P], axis=0).astype(u.dtype)
    dwkd = jnp.sum(misc[:, 1, :P], axis=0).astype(wkd.dtype)
    return dimg, dZ, dvar, dgamma, du, dwkd


# ------------------------------------------------------------ custom VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_conv_rbf_cross(NHWC_X, Z, variance, gamma, u, wkd, view,
                         with_kdiag: bool = True):
    """(Kzx [N, M], Kdiag [N]) fused off the image (see module docstring).

    ``u`` [P]: Kzx patch weights in TRANSPOSED extraction order, already
    divided by P; ``wkd`` [P]: Kdiag weights in the same order (the 1/P^2
    lives in the kernel).  ``gamma`` = -0.5 / lengthscale^2.  ``view`` and
    ``with_kdiag`` are static (nondiff).  Interpret mode off-TPU so CPU
    tests execute the real kernels."""
    return _fwd_call(NHWC_X, Z, variance, gamma, u, wkd, view, with_kdiag,
                     jax.default_backend() != 'tpu')


def _vjp_fwd(NHWC_X, Z, variance, gamma, u, wkd, view, with_kdiag):
    out = _fwd_call(NHWC_X, Z, variance, gamma, u, wkd, view, with_kdiag,
                    jax.default_backend() != 'tpu')
    return out, (NHWC_X, Z, variance, gamma, u, wkd)


def _vjp_bwd(view, with_kdiag, res, cts):
    NHWC_X, Z, variance, gamma, u, wkd = res
    dkzx, dkd = cts
    return _bwd_call(NHWC_X, Z, variance, gamma, u, wkd, view, with_kdiag,
                     jax.default_backend() != 'tpu',
                     dkzx.astype(NHWC_X.dtype), dkd.astype(NHWC_X.dtype))


fused_conv_rbf_cross.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------- gating
def kernel_supported(kernel) -> bool:
    """True when ``kernel`` (an AdditivePatchKernel/ConvKernel instance)
    may evaluate its (Kzx, Kdiag) pair through the fused path: scalar-
    lengthscale RBF base, FullView geometry, VMEM-fitting block, knob on
    (default ON on TPU after the round-5 end-to-end A/B — flagship Adam
    997.0 -> 1003.9 steps/s, flagship NatGrad 720.3 -> 779.7 (+8.2%),
    NatGrad ELBO trace bit-comparable (-15180.3 vs -15180.4), digits
    probe engages the M=64 forms and stays >= 0.97; DEEPCGP_PALLAS_CROSS=0
    disables for A/B, DEEPCGP_PALLAS_FORCE=1 enables off-TPU in interpret
    mode)."""
    from deepcgp_tpu.models.base_kernels import RBF
    from deepcgp_tpu.models.conv_kernels import AdditivePatchKernel
    from deepcgp_tpu.models.views import FullView

    default = ('1' if jax.default_backend() == 'tpu'
               or pallas_linalg.forced() else '0')
    if os.environ.get('DEEPCGP_PALLAS_CROSS', default) == '0':
        return False
    if not isinstance(kernel, AdditivePatchKernel):   # ConvKernel subclasses
        return False
    view = kernel.view
    if not isinstance(view, FullView):
        return False
    base = kernel.base_kernel
    if not (isinstance(base, RBF) and jnp.ndim(base.raw_lengthscales) == 0):
        return False
    P = view.patch_count
    L = view.patch_length
    # Geometry-only pre-check (M-independent); supported_for adds the
    # M-dependent Z/dZ/[P, M] terms before the layer actually dispatches.
    return _per_image_bytes(P, L, 0, 4) < _VMEM_BUDGET // 2


def supported_for(kernel, M: int, N: int | None = None) -> bool:
    """Full admission check including the inducing count M and (when
    known) the batch N — a legal Mosaic block must exist for it."""
    if not kernel_supported(kernel):
        return False
    view = kernel.view
    P, L = view.patch_count, view.patch_length
    fixed = 2 * 4 * M * (-(-L // 128) * 128)
    if fixed + _per_image_bytes(P, L, M, 4) > _VMEM_BUDGET:
        return False
    return N is None or _pick_block(N, P, L, M) > 0


def kzx_and_kdiag(kernel, Z, ND_X):
    """The fused evaluation of ``kernel.Kzx_NM_and_Kdiag(Z, ND_X)``.

    ConvKernel: Kdiag = the weighted double patch sum (in-kernel gram).
    AdditivePatchKernel (non-Conv): RBF Kdiag is the constant
    variance * mean(w) — computed outside, no gram."""
    from deepcgp_tpu.models.conv_kernels import ConvKernel
    from deepcgp_tpu.ops.pallas_patches import transposed_patch_perm

    view = kernel.view
    base = kernel.base_kernel
    N = ND_X.shape[0]
    H, W = view.input_size
    NHWC = ND_X.reshape(N, H, W, view.feature_maps)
    P = view.patch_count
    perm = jnp.asarray(transposed_patch_perm(view.out_image_height,
                                             view.out_image_width))
    w_t = jnp.take(kernel.patch_weights, perm, axis=0)
    gamma = -0.5 / jnp.square(base.lengthscales)
    with_kdiag = isinstance(kernel, ConvKernel)
    kzx, kdiag = fused_conv_rbf_cross(
        NHWC, Z, base.variance, gamma, w_t / P, w_t, view, with_kdiag)
    if not with_kdiag:
        kdiag = kernel.Kdiag(ND_X)   # constant-variance RBF path
    return kzx, kdiag
