"""Batch-parallel Cholesky + triangular inverse (Pallas base, blocked driver).

Why this exists: XLA's TPU cholesky/triangular-solve custom calls process a
BATCHED input serially per batch element — profiled on v5e:
chol([3,384,384]) ~92us but chol([20,384,384]) ~1.25ms, and the [20,384,384]
M-rhs TRSM ~610us (tools/roofline.py, natgrad config).  The NatGrad update
(training/optim.py:natgrad_update) factorizes a [2*R, M, M] stack every
step, so those two calls were ~45% of its step time.

TPU-native replacement (reference being rebuilt: the gpflow NatGradOptimizer
linear algebra, `conv_gp/experiment.py:90-108`):

* the 128x128 *base cases* run in ONE Pallas kernel, vectorized across the
  whole batch in VMEM (a [B,128,128] panel is only B*65KB) — the serial
  128-iteration column/row recurrences are amortized over all B lanes
  instead of being re-run per batch element;
* the *panel-level* work (panel solve, trailing SYRK update, inverse
  assembly) is plain-JAX batched einsums — XLA batched MATMULS parallelize
  across batch just fine; it is only the factorization custom calls that
  serialize — at Precision.HIGHEST, matching the f32 arithmetic of the
  custom calls they replace.

The driver returns BOTH chol(A) and chol(A)^-1: the NatGrad consumer needs
exactly that pair (W_new = W * J Lgf^-T J), and the explicit inverse is
numerically safe there because G = I + O(gamma) is near-identity.  This is
NOT wired into the conditional's Kuu solve chain (where an explicit
triangular inverse of an ill-conditioned kernel matrix degraded f32
training — see the round-2 tri_inverse note in CLAUDE.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default driver panel.  Measured end-to-end on v5e (NatGrad flagship,
# M=384 -> 6/12/3 panels): panel=32 -> 380 steps/s, panel=64 -> 426.6,
# panel=128 -> 414.6.  64 balances the two costs: fewer panels means
# fewer dispatch-bound tiny block einsums in the driver (the panel=32
# loss), while the base kernel's serial recurrence depth stays half of
# panel=128's (74us/call at 128 vs 21us at 64).
PANEL = int(os.environ.get('DEEPCGP_PALLAS_PANEL', '64'))


def forced() -> bool:
    """DEEPCGP_PALLAS_FORCE=1 makes the TPU-only Pallas gates
    (linalg._chol_inv_impl, optim._use_pallas_factor) take the Pallas path
    on ANY backend — in interpret mode off-TPU — so a CPU mesh test can
    cover the pjit+pallas_call composition a real multi-chip TPU run would
    execute (VERDICT r3 missing #2)."""
    return bool(os.environ.get('DEEPCGP_PALLAS_FORCE'))


def _interp(interpret: bool | None) -> bool:
    """None -> auto: interpret mode anywhere but a real TPU backend."""
    if interpret is None:
        return jax.default_backend() != 'tpu'
    return interpret


# Dead end (round 4, measured): a gen-5 MINI-PANEL variant of the base
# kernels — narrow per-column row/panel updates inside a width-8 block,
# then ONE full-width rank-8 trailing pass per block — was built on the
# theory that the kernel is VMEM-bandwidth bound (rank-1 passes re-read
# the trailing block P times).  It measured NEUTRAL-to-worse (NatGrad
# flagship 600.2 -> 604.1 steps/s, per-call 23.6 -> 25.2us): at P=64 the
# full 2P=128-lane width is exactly ONE lane tile, so every rank-1 pass
# is already minimal in VPU instructions, and instruction issue (b x
# rows/8 vregs x 2 ops per step), not VMEM traffic, is the binding
# resource — rank-w blocking keeps the same instruction count and adds
# the narrow phase-1/2 ops.  Don't re-try at single-tile widths.


def _chol_inv_base_kernel(D_ref, L_ref, Linv_ref, W_ref):
    """Base case: D [b, P, P] (symmetric; lower triangle meaningful) ->
    L = chol(D) and Linv = L^-1, all batch lanes advanced together.

    ONE serial recurrence of P steps — the irreducible sequential depth
    of a Cholesky — with every step a VPU op, so the cost is (nearly)
    independent of b instead of linear in it.

    The recurrence is STATICALLY UNROLLED: a lax.fori_loop body here
    costs ~2us of loop machinery per iteration on Mosaic (768 iterations
    made the kernel no faster than the serial XLA custom call it
    replaces); with static j every column/pivot access is a static slice
    and the whole factorization is one straight-line vector program.

    Fourth-generation AUGMENTED-ELIMINATION formulation.  The third
    generation ran two chained P-step phases (sliced rank-1 Cholesky
    downdates, then row-streaming forward substitution for the inverse),
    each on <=P-lane-wide values — at the shipped P=64 every VPU op
    wasted the upper half of its 128-lane tile as padding.  This one
    runs Gaussian elimination on the augmented working matrix W = [D | I]
    ([b, P, 2P], lane-exact at P=64): step j emits the factor column
    (cvec = W[j:, j] * rsqrt(pivot)), emits the inverse ROW
    (Linv[j, :] = W[j, P:] * rsqrt(pivot) — row j of the elimination
    product M satisfies diag(1/l_jj) M = L^-1 and is final before step j
    reads it), and applies ONE full-width rank-1 update to the rows
    below.  The left-half arithmetic is the exact Cholesky downdate
    (W[i,k] -= W[i,j] W[j,k] / pivot); the right half applies the same
    multipliers to I, i.e. forward substitution re-ordered.  Relative to
    generation three this merges the inverse phase into the padding
    lanes the factor phase already paid for — half the vector ops and
    ONE dependency chain of P steps instead of two chained ones.
    Processed left-half columns take unmasked pollution (never read
    again); right-half lanes > j of row j are structural zeros.
    """
    b, P, _ = D_ref.shape
    dtype = D_ref.dtype
    rid = lax.broadcasted_iota(jnp.int32, (P, P), 0)
    cid = lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (rid == cid).astype(dtype)

    W_ref[:, :, :P] = D_ref[:]
    W_ref[:, :, P:] = jnp.broadcast_to(eye, (b, P, P))
    L_ref[:] = jnp.zeros((b, P, P), dtype)
    for j in range(P):
        rowj = W_ref[:, j:j + 1, :]                        # [b, 1, 2P]
        rsq = lax.rsqrt(rowj[:, :, j:j + 1])               # [b, 1, 1]
        Linv_ref[:, j:j + 1, :] = rowj[:, :, P:] * rsq
        colj = W_ref[:, j:, j:j + 1]                       # [b, P-j, 1] live
        cvec = colj * rsq
        L_ref[:, j:, j:j + 1] = cvec
        if j + 1 < P:
            W_ref[:, j + 1:, :] = (
                W_ref[:, j + 1:, :] - (cvec[:, 1:] * rsq) * rowj)


def _chol_inv_base_kernel_upper(D_ref, R_ref, Rinv_ref, W_ref):
    """Upper-triangular mirror of :func:`_chol_inv_base_kernel`:
    D [b, P, P] symmetric -> R UPPER-triangular with R R^T = D, and
    Rinv = R^-1 (upper).  Same augmented-elimination structure, the
    recurrence running from the bottom-right corner — this IS the
    Cholesky of the index-reversed matrix without materializing the
    [..., ::-1, ::-1] reverses the NatGrad exchange identity otherwise
    needs; the live block is the LEADING W[:, :j, :j], and row j of the
    right half has structural zeros in lanes < j."""
    b, P, _ = D_ref.shape
    dtype = D_ref.dtype
    rid = lax.broadcasted_iota(jnp.int32, (P, P), 0)
    cid = lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (rid == cid).astype(dtype)

    W_ref[:, :, :P] = D_ref[:]
    W_ref[:, :, P:] = jnp.broadcast_to(eye, (b, P, P))
    R_ref[:] = jnp.zeros((b, P, P), dtype)
    for j in range(P - 1, -1, -1):
        rowj = W_ref[:, j:j + 1, :]                        # [b, 1, 2P]
        rsq = lax.rsqrt(rowj[:, :, j:j + 1])               # [b, 1, 1]
        Rinv_ref[:, j:j + 1, :] = rowj[:, :, P:] * rsq
        colj = W_ref[:, :j + 1, j:j + 1]                   # [b, j+1, 1] live
        cvec = colj * rsq
        R_ref[:, :j + 1, j:j + 1] = cvec
        if j > 0:
            W_ref[:, :j, :] = (
                W_ref[:, :j, :] - (cvec[:, :j] * rsq) * rowj)


def _tri_inv_base_kernel(L_ref, X_ref):
    """Batched base case: L [b, P, P] LOWER-triangular -> X = L^-1, all
    batch lanes advanced together.  This is exactly the forward-
    substitution phase of :func:`_chol_inv_base_kernel` (same sliced,
    statically-unrolled structure), taking an existing factor instead of
    computing one."""
    b, P, _ = L_ref.shape
    dtype = L_ref.dtype
    colid = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    L = L_ref[:]
    LT = jnp.swapaxes(L, 1, 2)          # LT[:, p, i] = L[i, p]
    X_ref[:] = jnp.zeros((b, P, P), dtype)
    for i in range(P):
        onehot = (colid == i).astype(dtype)
        lii = L[:, i:i + 1, i:i + 1]
        if i == 0:
            X_ref[:, :1, :] = onehot / lii
            continue
        w = LT[:, :i, i:i + 1]                             # [b, i, 1]
        contrib = jnp.sum(w * X_ref[:, :i, :], axis=1, keepdims=True)
        X_ref[:, i:i + 1, :] = (onehot - contrib) / lii


def tri_inv_base(L: jax.Array, *, interpret: bool | None = None) -> jax.Array:
    """[b, P, P] lower-triangular -> L^-1, one Pallas call."""
    interpret = _interp(interpret)
    b, P, _ = L.shape
    out = jax.ShapeDtypeStruct((b, P, P), L.dtype)
    return pl.pallas_call(
        _tri_inv_base_kernel,
        out_shape=out,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(L)


def tri_inv_doubling(L: jax.Array, *, block: int = 128,
                     interpret: bool | None = None) -> jax.Array:
    """L [..., M, M] lower-triangular -> L^-1 by recursive block DOUBLING:

        inv([[A, 0], [B, C]]) = [[A^-1, 0], [-C^-1 B A^-1, C^-1]]

    The M/block diagonal blocks invert together in ONE batched Pallas base
    call, then log2(M/block) levels of batched einsums merge pairs — every
    level is two MXU matmuls over all pairs at once.  XLA's own
    triangular-solve lowering for the same inverse is a SERIAL sweep of
    [128,128] custom calls plus an InvertDiagBlocks call (m1024 trace:
    TRSM 138us + IDB 81us/step); this form is latency-flat in M/block.

    Construction precision is HIGHEST, matching :func:`chol_inv_batched`'s
    block substitution.  Requires M % block == 0 and M/block a power of
    two (the shipped use is M=1024, block=128 -> 3 levels).
    """
    *batch, M, M2 = L.shape
    nb = M // block
    assert M == M2 and M % block == 0 and nb & (nb - 1) == 0, (L.shape, block)
    HI = lax.Precision.HIGHEST
    Lf = L.reshape((-1, M, M))
    Bn = Lf.shape[0]

    dblocks = jnp.stack(
        [Lf[:, k * block:(k + 1) * block, k * block:(k + 1) * block]
         for k in range(nb)], axis=1).reshape(Bn * nb, block, block)
    inv = tri_inv_base(dblocks, interpret=interpret)
    invs = [inv.reshape(Bn, nb, block, block)[:, k] for k in range(nb)]

    s = block
    while s < M:
        pairs = len(invs) // 2
        Ainv = jnp.stack(invs[0::2], axis=1)               # [Bn, pairs, s, s]
        Cinv = jnp.stack(invs[1::2], axis=1)
        Bblk = jnp.stack(
            [Lf[:, (2 * p + 1) * s:(2 * p + 2) * s, 2 * p * s:(2 * p + 1) * s]
             for p in range(pairs)], axis=1)
        X21 = -jnp.einsum(
            'bpij,bpjk->bpik', Cinv,
            jnp.einsum('bpij,bpjk->bpik', Bblk, Ainv, precision=HI),
            precision=HI)
        z = jnp.zeros_like(X21)
        merged = jnp.concatenate([
            jnp.concatenate([Ainv, z], axis=-1),
            jnp.concatenate([X21, Cinv], axis=-1)], axis=-2)
        invs = [merged[:, p] for p in range(pairs)]
        s *= 2
    return invs[0].reshape(*batch, M, M)


def _base_call(kernel, D: jax.Array, *, interpret: bool | None = None):
    interpret = _interp(interpret)
    b, P, _ = D.shape
    out = jax.ShapeDtypeStruct((b, P, P), D.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((b, P, 2 * P), D.dtype)],
        interpret=interpret,
    )(D)


def chol_inv_base(D: jax.Array, *, interpret: bool | None = None):
    """[b, P, P] symmetric -> (chol(D), chol(D)^-1), one Pallas call."""
    return _base_call(_chol_inv_base_kernel, D, interpret=interpret)


def chol_inv_base_upper(D: jax.Array, *, interpret: bool | None = None):
    """[b, P, P] symmetric -> (R, R^-1) with R upper, R R^T = D."""
    return _base_call(_chol_inv_base_kernel_upper, D, interpret=interpret)


def _assemble_blocks(blocks: dict, np_: int, B: int, P: int, dtype):
    """dict {(i, j): [B, P, P]} -> dense [B, np*P, np*P]; missing blocks are
    structural zeros.  The dict-of-blocks + concat assembly is the fast
    form: zero-init [B, M, M] arrays with .at[].set lower as non-fused
    full-buffer dynamic-update-slice copies (CLAUDE.md dead end)."""
    zero = jnp.zeros((B, P, P), dtype)
    return jnp.concatenate([
        jnp.concatenate([blocks.get((i, j), zero) for j in range(np_)],
                        axis=2)
        for i in range(np_)], axis=1)


def _factor_blocks_lower(A: jax.Array, P: int, np_: int,
                         interpret: bool | None):
    """Shared right-looking factor phase: A [B, M, M] SPD ->
    (Lb {(i,k): block of L, i >= k}, Dinv {k: inverse of diag block k}).
    Panel solve L21 = A21 Lkk^-T and trailing downdate are batched MXU
    matmuls (these parallelize over B; only the custom-call factorizations
    don't)."""
    HI = lax.Precision.HIGHEST
    Lb, Dinv = {}, {}
    rem = A
    for k in range(np_):
        Lkk, Lkkinv = chol_inv_base(rem[:, :P, :P], interpret=interpret)
        Lb[(k, k)] = Lkk
        Dinv[k] = Lkkinv
        if k + 1 < np_:
            A21 = rem[:, P:, :P]                             # [B, m, P]
            L21 = jnp.einsum('brp,bqp->brq', A21, Lkkinv, precision=HI)
            rem = rem[:, P:, P:] - jnp.einsum(
                'brp,bsp->brs', L21, L21, precision=HI)
            for i in range(k + 1, np_):
                Lb[(i, k)] = L21[:, (i - k - 1) * P:(i - k) * P]
    return Lb, Dinv


def _sym_from_tril(D: jax.Array) -> jax.Array:
    """Symmetrize a square block from its LOWER triangle:
    tril(D) + tril(D, -1)^T.  Bit-identical to D when D is already
    symmetric; makes the upper-factor drivers below consume only the
    lower triangle of their input (see `_factor_blocks_upper`)."""
    return jnp.tril(D) + jnp.swapaxes(jnp.tril(D, -1), -1, -2)


def _factor_blocks_upper(A: jax.Array, P: int, np_: int,
                         interpret: bool | None):
    """Upper mirror of :func:`_factor_blocks_lower`: the recurrence starts
    at the bottom-right corner, so R (upper, R R^T = A) comes out with
    zero index-reverse ops.  Returns (Rb {(i,k): block, i <= k}, Dinv,
    Rcols {k: the UNSPLIT [B, kP, P] panel above diag block k}) — the
    right-looking solver consumes the panels whole (one meaty update
    einsum per step instead of k dispatch-bound [B, P, P] products).

    Reads ONLY the lower triangle of A: panel solves take the lower
    block-row (A21, the transpose of the A12 the math names — identical
    values for symmetric A, contracted directly by dot_general with no
    transpose op), and diagonal blocks are symmetrized from their lower
    triangle.  This lets the NatGrad caller pass G as a tril-masked
    matmul epilogue — I + gamma*tril(W^T dW) — instead of materializing
    sym(phi(W^T dW)) through a [R, M, M] transpose + two assembly passes
    (~260us/step at M=1024, round-5 roofline).  Bit-identical for
    symmetric inputs."""
    HI = lax.Precision.HIGHEST
    Rb, Dinv, Rcols = {}, {}, {}
    rem = A
    for k in range(np_ - 1, 0, -1):
        Rkk, Rkkinv = chol_inv_base_upper(_sym_from_tril(rem[:, -P:, -P:]),
                                          interpret=interpret)
        Rb[(k, k)] = Rkk
        Dinv[k] = Rkkinv
        A21 = rem[:, -P:, :-P]                               # [B, P, kP]
        R12 = jnp.einsum('bpr,bqp->brq', A21, Rkkinv, precision=HI)
        rem = rem[:, :-P, :-P] - jnp.einsum(
            'brp,bsp->brs', R12, R12, precision=HI)
        Rcols[k] = R12
        for i in range(k):
            Rb[(i, k)] = R12[:, i * P:(i + 1) * P]
    Rb[(0, 0)], Dinv[0] = chol_inv_base_upper(_sym_from_tril(rem),
                                              interpret=interpret)
    return Rb, Dinv, Rcols


def chol_inv_batched(A: jax.Array, *, panel: int = PANEL,
                     interpret: bool | None = None):
    """Blocked right-looking Cholesky of a batch of SPD matrices, plus the
    explicit inverse of the factor: A [B, M, M] (M a multiple of 128) ->
    (L, Linv) with L lower-triangular, L L^T = A, Linv = L^-1.

    Non-PD batch elements yield NaN in their L/Linv (rsqrt of a negative
    pivot) exactly like jnp.linalg.cholesky — callers' finite checks keep
    working.
    """
    B, M, M2 = A.shape
    P = min(panel, M)
    assert M == M2 and M % P == 0, (B, M, M2, panel)
    np_ = M // P
    HI = lax.Precision.HIGHEST

    if np_ == 1:
        return chol_inv_base(A, interpret=interpret)

    Lb, Dinv = _factor_blocks_lower(A, P, np_, interpret)

    # Block forward substitution for the full inverse:
    #   X[k][k] = Dinv_k;  X[i][c] = -Dinv_i sum_{c<=l<i} L[i][l] X[l][c].
    Xb = {}
    for c in range(np_):
        Xb[(c, c)] = Dinv[c]
        for i in range(c + 1, np_):
            acc = 0.0
            for l in range(c, i):
                acc = acc + jnp.einsum('bij,bjk->bik', Lb[(i, l)],
                                       Xb[(l, c)], precision=HI)
            Xb[(i, c)] = -jnp.einsum('bij,bjk->bik', Dinv[i], acc,
                                     precision=HI)

    return (_assemble_blocks(Lb, np_, B, P, A.dtype),
            _assemble_blocks(Xb, np_, B, P, A.dtype))


def chol_factor_batched(A: jax.Array, *, panel: int = 128,
                        interpret: bool | None = None) -> jax.Array:
    """Factor-ONLY blocked Cholesky: A [B, M, M] SPD -> L lower-triangular
    with L L^T = A.  The factor phase of :func:`chol_inv_batched` without
    the O(np^3/6) block inverse assembly — for callers that build the
    inverse some other way (linalg._chol_inv_impl's M>512 route pairs this
    with :func:`tri_inv_doubling`).

    Why: XLA's [1024,1024] Cholesky custom call is a SERIAL block-panel
    recurrence (~206us/step on the m1024 config, tools/roofline.py); here
    the 8 P=128 base cases are near-free at batch 1 (the base kernel's
    VPU instruction count scales with b*rows) and the panel solve /
    trailing-downdate MXU einsums run at the bf16x6 matmul rate.
    """
    B, M, M2 = A.shape
    P = min(panel, M)
    assert M == M2 and M % P == 0, (B, M, M2, panel)
    np_ = M // P

    if np_ == 1:
        L, _ = chol_inv_base(A, interpret=interpret)
        return L

    Lb, _ = _factor_blocks_lower(A, P, np_, interpret)
    return _assemble_blocks(Lb, np_, B, P, A.dtype)


def chol_inv_batched_upper(A: jax.Array, *, panel: int = PANEL,
                           interpret: bool | None = None):
    """Upper-triangular mirror of :func:`chol_inv_batched`:
    A [B, M, M] SPD -> (R, Rinv) with R UPPER-triangular, R R^T = A,
    Rinv = R^-1.  Equivalent to flipping both index axes of
    ``chol_inv_batched(A[..., ::-1, ::-1])`` but with zero reverse ops:
    the blocked recurrence simply starts at the bottom-right corner.

    Block identities (R = [[R11, R12], [0, R22]]):
        A22 = R22 R22^T          (trailing base case first)
        R12 = A12 R22^-T         (panel solve)
        A11 - R12 R12^T = R11 R11^T   (leading-block recursion)
    and for X = R^-1 (upper): X[c][c] = Dinv_c,
        X[i][c] = -Dinv_i sum_{i<l<=c} R[i][l] X[l][c]   (i < c).
    """
    B, M, M2 = A.shape
    P = min(panel, M)
    assert M == M2 and M % P == 0, (B, M, M2, panel)
    np_ = M // P
    HI = lax.Precision.HIGHEST

    if np_ == 1:
        return chol_inv_base_upper(_sym_from_tril(A), interpret=interpret)

    Rb, Dinv, _ = _factor_blocks_upper(A, P, np_, interpret)

    Xb = {}
    for c in range(np_):
        Xb[(c, c)] = Dinv[c]
        for i in range(c - 1, -1, -1):
            acc = 0.0
            for l in range(i + 1, c + 1):
                acc = acc + jnp.einsum('bij,bjk->bik', Rb[(i, l)],
                                       Xb[(l, c)], precision=HI)
            Xb[(i, c)] = -jnp.einsum('bij,bjk->bik', Dinv[i], acc,
                                     precision=HI)

    return (_assemble_blocks(Rb, np_, B, P, A.dtype),
            _assemble_blocks(Xb, np_, B, P, A.dtype))


def chol_right_solve_upper(A: jax.Array, X: jax.Array, *,
                           panel: int = PANEL,
                           precision=lax.Precision.HIGHEST,
                           interpret: bool | None = None) -> jax.Array:
    """A [B, M, M] SPD, X [B, N, M] -> Y = X R^-T where R is the UPPER
    Cholesky-like factor (R R^T = A), WITHOUT materializing R^-1.

    Why: the NatGrad consumer (training/optim.py:natgrad_update) only ever
    uses R^-1 as ``W_new = W R^-T``.  Assembling the explicit inverse costs
    the O(np^3/6) block forward-substitution loop of
    :func:`chol_inv_batched_upper` — ~50 dispatch-bound [B, P, P] einsums
    at np=6 (~150us/step on the NatGrad flagship, tools/roofline.py
    per-source table) — plus the final [B, M, M] x [B, M, M] apply
    (~49us).  Solving the PRODUCT directly is block back-substitution
    on Y R^T = X, in RIGHT-LOOKING form: at step k (np-1 .. 0)

        Y_k  = rem_k Rkk^-T                      (one [B, N, P] product)
        rem  = rem[:, :, :-P] - Y_k Rcol_k^T     (ONE [B,N,P]x[B,kP,P])

    where Rcol_k is the unsplit [B, kP, P] factor panel straight out of
    :func:`_factor_blocks_upper`.  2*np einsums total vs the left-looking
    np(np+1)/2 dispatch-bound [B, N, P]x[B, P, P] products (np=8 at
    M=1024: 16 vs 36 dispatches), same FLOPs, and the trailing update is
    one meaty MXU matmul per step.

    The factor phase is identical to :func:`chol_inv_batched_upper`
    (Pallas base cases at HIGHEST); ``precision`` governs only the
    back-substitution products, whose result feeds the caller's state.
    """
    B, M, M2 = A.shape
    P = min(panel, M)
    assert M == M2 and M % P == 0, (B, M, M2, panel)
    np_ = M // P

    if np_ == 1:
        _, Dinv0 = chol_inv_base_upper(_sym_from_tril(A),
                                       interpret=interpret)
        return jnp.einsum('bnp,bqp->bnq', X, Dinv0, precision=precision)

    # Shared factor phase; the diagonal Rkk blocks it stores are unused
    # here (back-substitution needs only the panels and Dinv).
    _, Dinv, Rcols = _factor_blocks_upper(A, P, np_, interpret)

    Yb = {}
    rem = X
    for k in range(np_ - 1, 0, -1):
        Yk = jnp.einsum('bnp,bqp->bnq', rem[:, :, -P:], Dinv[k],
                        precision=precision)
        Yb[k] = Yk
        rem = rem[:, :, :-P] - jnp.einsum('bnp,brp->bnr', Yk, Rcols[k],
                                          precision=precision)
    Yb[0] = jnp.einsum('bnp,bqp->bnq', rem, Dinv[0], precision=precision)
    return jnp.concatenate([Yb[k] for k in range(np_)], axis=2)
