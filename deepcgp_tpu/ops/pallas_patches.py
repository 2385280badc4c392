"""Pallas L-minor patch extraction (im2col born in its consumer layout).

Why this exists: the slice-form im2col (`ops/patches.py::extract_patches`,
rebuilding `conv_gp/views.py:34-44` / `conv_gp/layers.py:23-32`) births a
[N, Hout, Wout, fh*fw, C] stack whose layout XLA then relays repeatedly on
its way into the cross-covariance / patch-gram matmuls — ~126us/step of the
flagship's 251us copies bucket is the last layer's [320,36,250] tensor
bouncing between {0,1,2}/{2,1,0}/{2,0,1} layouts (tools/roofline.py,
2026-08-18).  Both XLA-level attacks measured as dead ends (minor-axis
concat 555->334 steps/s; native conv-order extraction 805.8->782.0 — see
CLAUDE.md).  This kernel writes the [N, P, L] tensor directly from the
HBM-resident image, L-minor, in ONE pass — the layout its matmuls consume.

The trick that makes every store contiguous: emit patches in TRANSPOSED
patch order p' = ox * Hout + oy (column-major over the output grid) instead
of TF's row-major p = oy * Wout + ox.  For a fixed (filter row dy, output
column ox) the source is one contiguous 2D window of the image value,

    img[b, dy*dil : dy*dil + Hout (step stride), ox*stride*C : +f*C]

and the destination is the contiguous block
``out[b, ox*Hout:(ox+1)*Hout, dy*f*C:(dy+1)*f*C]`` — f * Wout static
assignments, zero in-register shuffles, zero masked single-sublane stores.
The within-patch element order is TF's (fh, fw, C) — only the PATCH order
changes, so [L]-indexed parameters (inducing patches Z, ARD lengthscales)
need no permutation; [P]-indexed ones (patch weights) ride
:func:`transposed_patch_perm`.  Legal wherever the consumer reduces over P
or permutes its P-weights consistently — the patch-sum kernels
(`conv_gp/kernels.py:15-137`), where P only ever appears inside a weighted
sum.  NOT legal for hidden ConvLayer outputs (P is the output identity).

Backward: extraction is linear; the custom VJP transposes the equivalent
slice-form program (``jax.linear_transpose``), which XLA fuses into the
pad+add col2im it already executes well (~11us/step at the flagship shape).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepcgp_tpu.ops.patches import extract_patches, out_size

# Max VMEM block: out [b, P, L] f32 at the flagship shape is b * 36KB;
# b=64 keeps the out + img blocks ~2.6MB of the 16MB VMEM budget.
_BLOCK_N = int(os.environ.get('DEEPCGP_PALLAS_EXTRACT_BLOCK', '64'))


def transposed_patch_perm(Hout: int, Wout: int) -> np.ndarray:
    """int32 [P]: ``patches_tp[:, i, :] == patches_tf[:, perm[i], :]``.

    Index i is the transposed (column-major) patch index i = ox*Hout + oy;
    perm[i] = oy*Wout + ox is its TF row-major position.  Apply the same
    gather to any [P]-indexed quantity (patch weights) consumed against
    transposed-order patches."""
    i = np.arange(Hout * Wout)
    oy, ox = i % Hout, i // Hout
    return (oy * Wout + ox).astype(np.int32)


def _extract_kernel(img_ref, out_ref, *, f, stride, dilation, Hout, Wout, C):
    """img [b, H, W*C] -> out [b, Wout*Hout, f*f*C] (transposed patch order).

    Thin pallas_call body around :func:`extract_into` (shared with the
    fused cross-covariance kernel, ops/pallas_cross.py)."""
    extract_into(img_ref[:], out_ref, f=f, stride=stride, dilation=dilation,
                 Hout=Hout, Wout=Wout, C=C)


def extract_into(img, out_ref, *, f, stride, dilation, Hout, Wout, C):
    """Write the transposed-order im2col of ``img`` (a [b, H, W*C] VALUE)
    into ``out_ref`` (a [b, Wout*Hout, f*f*C] ref — kernel output or VMEM
    scratch).

    f * Wout static assignments, each a contiguous [b, Hout, f*C] window
    copy (unaligned offsets are static — Mosaic emits the lane/sublane
    shifts).  ``stride`` steps the source sublanes (strided value slice)
    and the lane window start; ``dilation`` spaces the filter rows.
    """
    fC = f * C

    def _rows(row0):
        if stride == 1:
            return img[:, row0:row0 + Hout, :]
        # A strided 3D value slice lowers as a gather Mosaic rejects
        # ("Only 2D gather is supported"); static single-row slices +
        # concat lower fine and cost Hout register moves per dy.
        return jnp.concatenate(
            [img[:, row0 + oy * stride:row0 + oy * stride + 1, :]
             for oy in range(Hout)], axis=1)

    for dy in range(f):
        rows = _rows(dy * dilation)                    # [b, Hout, W*C]
        for ox in range(Wout):
            lane0 = ox * stride * C
            if dilation == 1:
                # Filter columns are lane-contiguous: one [b, Hout, f*C]
                # window per (dy, ox).
                out_ref[:, ox * Hout:(ox + 1) * Hout,
                        dy * fC:(dy + 1) * fC] = (
                    rows[:, :, lane0:lane0 + fC].astype(out_ref.dtype))
            else:
                # x-dilation spaces the filter columns by dilation*C lanes.
                for dx in range(f):
                    out_ref[:, ox * Hout:(ox + 1) * Hout,
                            (dy * f + dx) * C:(dy * f + dx + 1) * C] = (
                        rows[:, :, lane0 + dx * dilation * C:
                             lane0 + dx * dilation * C + C]
                        .astype(out_ref.dtype))


# VMEM budget for one grid step's blocks (img + patches, x2 for Mosaic's
# double buffering), conservatively below the 16MB scoped stack.
_VMEM_BUDGET = 12 << 20


def _vmem_max_block(HWC: int, PL: int, itemsize: int = 4) -> int:
    """Largest batch-block b with b*(HWC + PL)*itemsize*2 <= budget."""
    return max(_VMEM_BUDGET // (2 * itemsize * (HWC + PL)), 0)


def _pick_block(N: int, HWC: int, PL: int) -> int:
    """Largest divisor of N that is <= _BLOCK_N AND fits the VMEM budget
    (grid blocks must tile N).  Raises when even a single-image block
    exceeds the budget — layer callers never get here (supports() gates on
    the same bound), but a direct caller on a too-large geometry should
    fail with a legible error, not die inside Mosaic (ADVICE r4)."""
    vmax = _vmem_max_block(HWC, PL)
    if vmax < 1:
        raise ValueError(
            f"pallas patch extraction: a single-image block (HWC={HWC}, "
            f"PL={PL}) exceeds the {_VMEM_BUDGET >> 20}MB VMEM budget; use "
            "the slice-form ops.patches.extract_patches for this geometry")
    cap = min(N, _BLOCK_N, vmax)
    for b in range(max(cap, 1), 0, -1):
        if N % b == 0:
            return b
    return 1


def _pallas_extract(NHWC_X: jax.Array, filter_size: int, stride: int,
                    dilation: int, *, interpret: bool,
                    out_dtype=None) -> jax.Array:
    N, H, W, C = NHWC_X.shape
    Hout = out_size(H, filter_size, stride, dilation)
    Wout = out_size(W, filter_size, stride, dilation)
    P, L = Hout * Wout, filter_size * filter_size * C
    img = NHWC_X.reshape(N, H, W * C)     # layout-free (W, C adjacent minor)
    b = _pick_block(N, H * W * C, P * L)
    kern = functools.partial(_extract_kernel, f=filter_size, stride=stride,
                             dilation=dilation, Hout=Hout, Wout=Wout, C=C)
    out = pl.pallas_call(
        kern,
        grid=(N // b,),
        in_specs=[pl.BlockSpec((b, H, W * C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((b, P, L), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, P, L),
                                       out_dtype or NHWC_X.dtype),
        interpret=interpret,
    )(img)
    return out


def _ref_transposed(NHWC_X: jax.Array, filter_size: int, stride: int,
                    dilation: int) -> jax.Array:
    """Slice-form reference producing the SAME output (transposed patch
    order) — the oracle for tests and the linear map the backward
    transposes."""
    N = NHWC_X.shape[0]
    Hout = out_size(NHWC_X.shape[1], filter_size, stride, dilation)
    Wout = out_size(NHWC_X.shape[2], filter_size, stride, dilation)
    NPL = extract_patches(NHWC_X, filter_size, stride, dilation)
    return NPL.reshape(N, Hout, Wout, -1).swapaxes(1, 2).reshape(
        N, Hout * Wout, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def extract_patches_transposed(NHWC_X: jax.Array, filter_size: int,
                               stride: int = 1, dilation: int = 1,
                               out_dtype=None) -> jax.Array:
    """[N, H, W, C] -> [N, P, L] in transposed patch order, L-minor, via one
    Pallas pass (interpret mode off-TPU so CPU tests cover the kernel).

    ``out_dtype=jnp.bfloat16`` makes the kernel EMIT bf16 patches (cast at
    the store, halving the tensor's HBM footprint); DEFAULT-precision MXU
    consumers round their operands to bf16 anyway, so the cross-covariance
    products see the same values — only f32 epilogues (norms) change, at
    one rounding of normalized image data.  The backward keeps an f32
    col2im accumulation regardless (bf16 cotangents upcast in VMEM)."""
    return _pallas_extract(NHWC_X, filter_size, stride, dilation,
                           interpret=jax.default_backend() != 'tpu',
                           out_dtype=out_dtype)


def _col2im_kernel(g_ref, out_ref, acc_ref, *, f, stride, dilation, Hout,
                   Wout, C):
    """Transpose of :func:`_extract_kernel`: g [b, Wout*Hout, f*f*C] ->
    dimg [b, H, W*C], accumulating the overlapping windows in a VMEM
    scratch (each image element belongs to up to f*f patches).  Same 30
    static window moves as the forward, plus the adds."""
    col2im_into(g_ref[:], acc_ref, f=f, stride=stride, dilation=dilation,
                Hout=Hout, Wout=Wout, C=C)
    out_ref[:] = acc_ref[:]


def col2im_into(g, acc_ref, *, f, stride, dilation, Hout, Wout, C):
    """Accumulate the col2im of ``g`` (a [b, Wout*Hout, f*f*C] VALUE in
    transposed patch order) into ``acc_ref`` (a zero-initialised
    [b, H, W*C] ref).  Shared with the fused cross-covariance backward
    (ops/pallas_cross.py).

    Three forms (DEEPCGP_COL2IM_FORM knob):

    * 'rmw' (default): the original shifted-slice accumulation — f*Wout
      overlapping read-modify-writes through the ref (x Hout rows when
      stride > 1).  MEASURED FASTEST at the flagship shape (1005 steps/s
      end-to-end).
    * 'dot': per-(dy, ox) lane placement as a matmul against an
      iota-built 0/1 selection matrix [fC, WC], f-way value
      accumulation, f band RMWs.  MEASURED DEAD END at the flagship
      shape (961 steps/s, -4.4%): 30 extra [192, 50]x[50, 100] dots cost
      more issue slots than the shortened RMW chain saves — same lesson
      as the gen-5 mini-panel base kernels (CLAUDE.md).  Kept for
      geometries with much wider fC/WC where shift instruction count
      dominates.
    * 'tree': lane placement by zero-padded concat into VALUES (same VPU
      shift work as 'rmw'), per-dy value accumulation, f band RMWs at
      stride 1 / one store per covered row otherwise — shortens the
      serialized ref chain 6x without adding MXU work.
    """
    b, H, WC = acc_ref.shape
    fC = f * C
    dt = acc_ref.dtype
    form = os.environ.get('DEEPCGP_COL2IM_FORM', 'rmw')

    if form in ('dot', 'tree'):
        acc_ref[:] = jnp.zeros((b, H, WC), dt)
        if form == 'dot':
            # S_ox[j, c] = 1 iff lane j of a dy-piece lands at image lane
            # c = ox*stride*C + j + (j // C)*(dilation - 1)*C.
            j_grid = jax.lax.broadcasted_iota(jnp.int32, (fC, WC), 0)
            c_grid = jax.lax.broadcasted_iota(jnp.int32, (fC, WC), 1)
            tgt = j_grid + (j_grid // C) * (dilation - 1) * C
        # Per-dy lane-placed accumulators [b, Hout, WC] (values, not refs).
        accs = []
        for dy in range(f):
            accv = None
            for ox in range(Wout):
                piece = g[:, ox * Hout:(ox + 1) * Hout,
                          dy * fC:(dy + 1) * fC]        # [b, Hout, fC]
                if form == 'dot':
                    S = (c_grid == tgt
                         + ox * stride * C).astype(piece.dtype)
                    contrib = jax.lax.dot_general(
                        piece.reshape(b * Hout, fC), S,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=dt).reshape(b, Hout, WC)
                else:
                    # Zero-padded lane placement; dilation spaces the
                    # filter columns by dilation*C lanes.
                    lane0 = ox * stride * C
                    parts, cur = [], 0

                    def _fill(upto, parts=parts):
                        nonlocal cur
                        if upto > cur:
                            parts.append(jnp.zeros((b, Hout, upto - cur),
                                                   dt))
                            cur = upto
                    if dilation == 1:
                        _fill(lane0)
                        parts.append(piece.astype(dt))
                        cur += fC
                    else:
                        for dx in range(f):
                            _fill(lane0 + dx * dilation * C)
                            parts.append(
                                piece[:, :, dx * C:(dx + 1) * C]
                                .astype(dt))
                            cur += C
                    _fill(WC)
                    contrib = (jnp.concatenate(parts, axis=2)
                               if len(parts) > 1 else parts[0])
                accv = contrib if accv is None else accv + contrib
            accs.append(accv)
        if stride == 1:
            # Rows dy..dy+Hout-1 are contiguous: one band RMW per dy
            # (f-deep dependency chain vs the old f*Wout-deep one).
            for dy in range(f):
                r0 = dy * dilation
                acc_ref[:, r0:r0 + Hout, :] = (
                    acc_ref[:, r0:r0 + Hout, :] + accs[dy])
            return
        # stride > 1: each covered output row r = dy*dilation + oy*stride
        # is written ONCE with the in-value sum of its contributions.
        by_row = {}
        for dy in range(f):
            for oy in range(Hout):
                by_row.setdefault(dy * dilation + oy * stride,
                                  []).append((dy, oy))
        for r, pairs in sorted(by_row.items()):
            tot = None
            for dy, oy in pairs:
                sl = accs[dy][:, oy:oy + 1, :]
                tot = sl if tot is None else tot + sl
            acc_ref[:, r:r + 1, :] = tot
        return

    acc_ref[:] = jnp.zeros((b, H, WC), dt)

    def _acc(rows, lo, width, piece):
        # Strided ref slices don't lower (same Mosaic gather limit as the
        # forward); stride>1 accumulates row-by-row instead.
        if stride == 1:
            acc_ref[:, rows[0]:rows[0] + Hout, lo:lo + width] = (
                acc_ref[:, rows[0]:rows[0] + Hout, lo:lo + width] + piece)
        else:
            for oy in range(Hout):
                r = rows[0] + oy * stride
                acc_ref[:, r:r + 1, lo:lo + width] = (
                    acc_ref[:, r:r + 1, lo:lo + width]
                    + piece[:, oy:oy + 1])

    for ox in range(Wout):
        lane0 = ox * stride * C
        for dy in range(f):
            row0 = dy * dilation
            gblk = g[:, ox * Hout:(ox + 1) * Hout,
                     dy * fC:(dy + 1) * fC]             # [b, Hout, fC]
            if dilation == 1:
                _acc((row0,), lane0, fC, gblk)
            else:
                for dx in range(f):
                    _acc((row0,), lane0 + dx * dilation * C, C,
                         gblk[:, :, dx * C:(dx + 1) * C])


def _pallas_col2im(g: jax.Array, img_shape, filter_size: int, stride: int,
                   dilation: int, *, interpret: bool,
                   out_dtype=None) -> jax.Array:
    N, H, W, C = img_shape
    Hout = out_size(H, filter_size, stride, dilation)
    Wout = out_size(W, filter_size, stride, dilation)
    P, L = Hout * Wout, filter_size * filter_size * C
    b = _pick_block(N, H * W * C, P * L)
    kern = functools.partial(_col2im_kernel, f=filter_size, stride=stride,
                             dilation=dilation, Hout=Hout, Wout=Wout, C=C)
    out = pl.pallas_call(
        kern,
        grid=(N // b,),
        in_specs=[pl.BlockSpec((b, P, L), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((b, H, W * C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W * C), out_dtype or g.dtype),
        scratch_shapes=[pltpu.VMEM((b, H, W * C), out_dtype or g.dtype)],
        interpret=interpret,
    )(g)
    return out.reshape(N, H, W, C)


def _fwd(NHWC_X, filter_size, stride, dilation, out_dtype):
    # The primal rides along only for its static shape/dtype (it is a step
    # input either way, so this adds no residual memory).
    return (extract_patches_transposed(NHWC_X, filter_size, stride, dilation,
                                       out_dtype),
            NHWC_X)


def _bwd(filter_size, stride, dilation, out_dtype, res, g):
    # Pallas col2im: the XLA transpose of the slice-form program relayouts
    # the [N, P, L] cotangent back through the stacked-intermediate layouts
    # (~80us/step of fresh copies at the flagship shape, measured) — the
    # mirrored kernel accumulates the overlapping windows in VMEM instead.
    dimg = _pallas_col2im(g, res.shape, filter_size, stride, dilation,
                          interpret=jax.default_backend() != 'tpu',
                          out_dtype=res.dtype)
    return (dimg.astype(res.dtype),)


extract_patches_transposed.defvjp(_fwd, _bwd)


def supports(view) -> bool:
    """True when the Pallas path may replace the slice-form extraction for
    PATCH-SUM consumers over ``view``: FullView geometry (partial views
    select patches by TF index), a whole-image row [H, W*C] that fits VMEM
    comfortably, and the knob on (default ON; DEEPCGP_PALLAS_EXTRACT=0
    disables for A/B)."""
    from deepcgp_tpu.models.views import FullView
    from deepcgp_tpu.ops import pallas_linalg
    default = ('1' if jax.default_backend() == 'tpu'
               or pallas_linalg.forced() else '0')
    if os.environ.get('DEEPCGP_PALLAS_EXTRACT', default) == '0':
        return False
    if not isinstance(view, FullView):
        return False
    H, W = view.input_size
    # Admit a geometry only when at least a b=1 grid block (image row +
    # patch row, x2 double buffering) fits the VMEM budget — gating on the
    # raw image size alone admitted shapes whose [b, P, L] out block blew
    # the scoped stack and died in Mosaic instead of falling back.
    return _vmem_max_block(H * W * view.feature_maps,
                           view.patch_count * view.patch_length) >= 1
