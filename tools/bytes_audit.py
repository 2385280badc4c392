"""Per-op HBM-bytes roofline of a training step (VERDICT r4 next #1).

FLOPs got the three-figure treatment (model / hardware / XLA — PARITY.md
"FLOP accounting"); this gives bytes the same: every HLO instruction's
operand+output buffer bytes are parsed from the OPTIMIZED module text,
joined with the per-op device durations of a `jax.profiler` trace
(tools/roofline.py machinery), and aggregated per bucket — so each bucket
reads as (us/step, MB/step, achieved GB/s), and the program total is
compared against the analytic MODEL-MINIMAL traffic
(`utils/flops.training_step_min_bytes`: minibatch in, params fwd+bwd,
grads, moments, updated params — nothing else).

Conventions / caveats (stated so the table is honest):
* bytes(op) = sum of operand + output buffer sizes of the fused op.  For
  HBM-resident buffers this is the op's HBM traffic; operands that are
  small enough for XLA to keep in registers/VMEM across consumers are
  still counted, so per-op figures are an UPPER bound on true traffic —
  an op measuring well above HBM bandwidth is compute/VMEM-resident, not
  magic.
* an instruction inside the step scan executes steps/unroll times per
  chunk; summing the unroll twins' (bytes / unroll) gives bytes/step,
  mirroring the duration accounting (CLAUDE.md roofline note).

Usage (TPU; single client, no timeouts — CLAUDE.md rules):
    nohup python tools/bytes_audit.py --config flagship \
        > /tmp/bytes_audit.log 2>&1 &
Pass --parse-only to re-bucket the newest trace + a saved HLO text without
touching the TPU.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import roofline  # noqa: E402  (build_and_warm, parse_trace, buckets)

_DTYPE_BYTES = {
    'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 'f8e4m3fn': 1, 'f8e5m2': 1,
    's64': 8, 'u64': 8, 's32': 4, 'u32': 4, 's16': 2, 'u16': 2,
    's8': 1, 'u8': 1, 'pred': 1,
}

_SHAPE_RE = re.compile(
    r'\b(' + '|'.join(_DTYPE_BYTES) + r')\[([0-9,]*)\]')


def _line_bytes(line: str) -> int:
    """Sum of all shaped-buffer bytes mentioned on one HLO text line
    (output shape(s) + every shaped operand)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(line):
        n = 1
        if dims:
            for d in dims.split(','):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=')


def hlo_instruction_bytes(hlo_text: str) -> dict:
    """{instruction name: operand+output bytes} from optimized HLO text.

    Fusion bodies are skipped: a fused computation's internal lines live
    in a separate `%fused_computation` block whose values never touch HBM;
    only the top-level entry/while-body instructions carry real buffers.
    Pallas/custom-calls appear as single `custom-call` instructions whose
    operand/result shapes are exactly their HBM surface.
    """
    out = {}
    in_fused = False
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if stripped.endswith('{') and '=' not in stripped.split('(')[0]:
            # computation header, e.g. '%fused_computation.12 (...) ... {'
            in_fused = stripped.startswith(('%fused_computation',
                                            'fused_computation'))
            continue
        if stripped == '}':
            in_fused = False
            continue
        if in_fused:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        out[name] = out.get(name, 0) + _line_bytes(line)
    return out


def build_compiled(config: str, steps: int):
    """Lower+compile the SAME run_chunk program the trace executes and
    return its optimized-HLO text + the scan unroll factor."""
    import jax

    from deepcgp_tpu.training import trainer
    state, tc, Xd, Yd = roofline.build_and_warm(config, steps)
    compiled = trainer.run_chunk.lower(state, tc, Xd, Yd, steps).compile()
    hlo_text = compiled.as_text()
    unroll = trainer.scan_unroll(tc, steps)
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla_bytes = float(ca.get('bytes accessed', float('nan')))
    return state, tc, Xd, Yd, hlo_text, unroll, xla_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='flagship',
                    choices=['flagship', 'natgrad', 'm1024', 'm1024-natgrad'])
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--trace-dir', default='/tmp/deepcgp_bytes')
    ap.add_argument('--hlo-cache', default='/tmp/deepcgp_bytes_hlo.txt')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--parse-only', action='store_true')
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        from deepcgp_tpu.training import trainer
        from deepcgp_tpu.utils import profiling

        roofline._log(f"devices: {jax.devices()}")
        (state, tc, Xd, Yd, hlo_text, unroll,
         xla_bytes) = build_compiled(args.config, args.steps)
        with open(args.hlo_cache, 'w') as f:
            f.write(f"# unroll={unroll} xla_bytes={xla_bytes}\n")
            f.write(hlo_text)
        t0 = time.time()
        state, elbos = trainer.run_chunk(state, tc, Xd, Yd, args.steps)
        jax.block_until_ready(elbos)
        wall = time.time() - t0
        roofline._log(f"steady-state: {args.steps / wall:.1f} steps/s")
        os.system(f'rm -rf {args.trace_dir}')
        with profiling.trace(args.trace_dir):
            state, elbos = trainer.run_chunk(state, tc, Xd, Yd, args.steps)
            jax.block_until_ready(elbos)
    else:
        with open(args.hlo_cache) as f:
            header = f.readline()
            hlo_text = f.read()
        m = re.match(r'# unroll=(\d+) xla_bytes=([\d.e+naN]+)', header)
        unroll, xla_bytes = int(m.group(1)), float(m.group(2))
        wall = float('nan')

    per_op, op_meta, total, path = roofline.parse_trace(args.trace_dir)
    op_bytes = hlo_instruction_bytes(hlo_text)
    roofline._log(f"trace: {path}; HLO instructions with bytes: "
                  f"{len(op_bytes)}; trace ops: {len(per_op)}")

    # Join: per-op (us/step, MB/step, achieved GB/s).
    rows = []
    matched_bytes = 0.0
    for name, dur in per_op.items():
        b = op_bytes.get(name)
        mb_step = (b / unroll / 1e6) if b else 0.0
        if b:
            matched_bytes += b / unroll
        us_step = dur / args.steps * 1e6
        execs = args.steps / unroll
        gbps = (b * execs / dur / 1e9) if (b and dur > 0) else float('nan')
        rows.append((name, us_step, mb_step, gbps))

    buckets_t = collections.Counter()
    buckets_b = collections.Counter()
    for name, us_step, mb_step, _ in rows:
        bk = roofline.bucket_of(name, op_meta.get(name, ''))
        buckets_t[bk] += us_step
        buckets_b[bk] += mb_step

    from deepcgp_tpu.utils import flops as flops_lib
    # Model-minimal bytes: pytree byte-count only, no device work.
    min_bytes = float('nan')
    try:
        if not args.parse_only:
            min_bytes = flops_lib.training_step_min_bytes(
                state.model, tc.batch_size)
    except Exception as e:
        roofline._log(f"min-bytes unavailable: {e}")

    us_total = total / args.steps * 1e6
    mb_total = sum(buckets_b.values())
    print(f"== {args.config} bytes roofline: {us_total:.1f} us/step device, "
          f"{mb_total:.1f} MB/step (HLO-matched; XLA cost-analysis "
          f"{xla_bytes / unroll / 1e6:.1f} MB/step), "
          f"program bandwidth {mb_total / us_total * 1e6 / 1e3:.2f} TB/s ==")
    if min_bytes == min_bytes:
        print(f"model-minimal traffic: {min_bytes / 1e6:.1f} MB/step -> "
              f"program moves {mb_total * 1e6 / min_bytes:.1f}x the floor "
              f"(see utils/flops.training_step_min_bytes convention)")
    print("-- buckets (per step) --")
    print(f"{'bucket':24s} {'us':>9s} {'MB':>9s} {'GB/s':>8s}")
    for bk, us in buckets_t.most_common():
        mb = buckets_b[bk]
        bw = mb / us * 1e3 if us else float('nan')
        print(f"{bk:24s} {us:9.1f} {mb:9.2f} {bw:8.0f}")
    print(f"-- top {args.top} ops by MB/step --")
    for name, us_step, mb_step, gbps in sorted(
            rows, key=lambda r: -r[2])[:args.top]:
        meta = op_meta.get(name, '')[:90]
        print(f"{mb_step:8.2f} MB {us_step:8.1f} us {gbps:8.0f} GB/s  "
              f"{name[:60]}  | {meta}")
    print(f"-- top {args.top} ops by us/step (with their bytes) --")
    for name, us_step, mb_step, gbps in sorted(
            rows, key=lambda r: -r[1])[:args.top]:
        meta = op_meta.get(name, '')[:90]
        print(f"{us_step:8.1f} us {mb_step:8.2f} MB {gbps:8.0f} GB/s  "
              f"{name[:60]}  | {meta}")


if __name__ == '__main__':
    main()
