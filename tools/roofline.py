"""Per-op roofline of the flagship training step (VERDICT r2 next-#1).

Builds the flagship CIFAR-10 2-layer config (or M=1024 MNIST with
``--config m1024``), warms up ``trainer.run_chunk``, takes a
``jax.profiler`` device trace of one steady-state chunk, and aggregates
device time per op with a bucket attribution (conv-Kuf, solves/chol,
q_sqrt term, sampling/elementwise, copies, KL, optimizer, ...).

Output: a sorted bucket table + the top individual ops on stdout —
the numbers behind PARITY.md's roofline section.

Usage (TPU; keep it a single client, no timeouts — CLAUDE.md rules):
    nohup python tools/roofline.py > /tmp/roofline.log 2>&1 &
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_and_warm(config: str, steps: int):
    import jax
    import jax.numpy as jnp

    from deepcgp_tpu.models.builder import BuilderFlags, build_model
    from deepcgp_tpu.training import trainer
    from deepcgp_tpu.training.trainer import TrainConfig

    rng = np.random.RandomState(0)
    if config in ('m1024', 'm1024-natgrad'):
        flags = BuilderFlags(M='1024', feature_maps='', filter_sizes='5',
                             strides='1', num_samples=10, batch_size=128,
                             last_kernel='rbf')
        X = rng.randn(2048, 28, 28, 1).astype(np.float32)
        optimizer = 'NatGrad' if config.endswith('natgrad') else 'Adam'
    elif config == 'natgrad':
        flags = BuilderFlags(M='384,384', feature_maps='10',
                             filter_sizes='5,5', strides='3,1',
                             num_samples=10, batch_size=32)
        X = rng.randn(2048, 32, 32, 3).astype(np.float32)
        optimizer = 'NatGrad'
    else:
        flags = BuilderFlags(M='384,384', feature_maps='10',
                             filter_sizes='5,5', strides='3,1',
                             num_samples=10, batch_size=32)
        X = rng.randn(2048, 32, 32, 3).astype(np.float32)
        optimizer = 'Adam'
    Y = rng.randint(0, 10, size=(X.shape[0], 1))

    t0 = time.time()
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float32)
    _log(f"model built in {time.time() - t0:.1f}s")
    tc = TrainConfig(optimizer=optimizer, lr=0.01, lr_decay_steps=100000,
                     gamma=0.001, batch_size=flags.batch_size)
    state = trainer.init_state(model, tc, jax.random.PRNGKey(1))
    Xd = jnp.asarray(X.reshape(X.shape[0], -1))
    Yd = jnp.asarray(Y)
    t0 = time.time()
    state, elbos = trainer.run_chunk(state, tc, Xd, Yd, steps)
    jax.block_until_ready(elbos)
    _log(f"warmup (compile + {steps} steps) in {time.time() - t0:.1f}s")
    return state, tc, Xd, Yd


# Bucket attribution: ordered (first match wins).  Patterns run against the
# fused op's name AND its 'source'/'tf_op'-style metadata args joined.
BUCKETS = [
    ('conv-Kuf', r'conv_cross|conv_general_dilated|%conv|convolution'),
    ('chol/solve', r'cholesky|triangular|trsm|potrf|getrf|custom-call'),
    ('qsqrt-term', r'qsqrt|q_sqrt|LTA'),
    ('kl', r'gauss_kl|prior_kl|logdet'),
    ('optimizer', r'adam|natgrad|scale_by|optim'),
    ('sampling/likelihood', r'random|normal|threefry|erf|hermite|'
                            r'likelihood|logsumexp|softmax'),
    ('copies/layout', r'^copy|copy\.|transpose|bitcast|reshape'),
    ('matmul-other', r'dot|fusion.*dot|gemm'),
    ('elementwise-fusion', r'fusion|exp|multiply|add|subtract'),
]


def bucket_of(name: str, meta: str) -> str:
    hay = (name + ' ' + meta).lower()
    for bucket, pat in BUCKETS:
        if re.search(pat, hay):
            return bucket
    return 'other'


def parse_trace(trace_dir: str):
    """Aggregate device-lane event durations from the Chrome trace."""
    paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    assert paths, f"no trace json under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    # Identify device lanes: process names containing 'TPU' / 'device'.
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tid_names[(e['pid'], e['tid'])] = e['args'].get('name', '')
    device_pids = {pid for pid, n in pid_names.items()
                   if re.search(r'tpu|device|/device', n, re.I)}
    # Prefer the 'XLA Ops' lane: the trace also carries module/step wrapper
    # lanes ('XLA Modules', 'Steps') whose spans each re-cover the whole
    # program — counting them triples the total and buries the real ops in
    # an 'other' bucket.
    op_lanes = {k for k, n in tid_names.items()
                if k[0] in device_pids and re.search(r'xla ops', n, re.I)}
    per_op = collections.Counter()
    op_meta = {}
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        tname = tid_names.get((e['pid'], e['tid']), '')
        if op_lanes:
            if (e['pid'], e['tid']) not in op_lanes:
                continue
        elif re.search(r'host|python', tname, re.I):
            continue
        name = e.get('name', '')
        # Wrapper spans (the jitted module, the scan's while loop) cover the
        # whole chunk; their inner ops are recorded separately — skip them.
        if (name == '0' or name.startswith('jit_')
                or re.match(r'while\.?\d*$', name)):
            continue
        dur = e.get('dur', 0) / 1e6  # us -> s
        args = e.get('args', {}) or {}
        meta = ' '.join(str(v) for v in args.values())
        per_op[name] += dur
        op_meta.setdefault(name, meta)
        total += dur
    return per_op, op_meta, total, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='flagship',
                    choices=['flagship', 'natgrad', 'm1024', 'm1024-natgrad'])
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--trace-dir', default='/tmp/deepcgp_roofline')
    ap.add_argument('--bucket-detail', default=None,
                    help="also print the top ops of this bucket "
                         "(e.g. copies/layout)")
    ap.add_argument('--parse-only', action='store_true',
                    help="re-parse the newest trace under --trace-dir "
                         "without touching the TPU")
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        from deepcgp_tpu.training import trainer
        from deepcgp_tpu.utils import profiling

        _log(f"devices: {jax.devices()}")
        state, tc, Xd, Yd = build_and_warm(args.config, args.steps)

        # Steady-state timing (no trace overhead).
        t0 = time.time()
        state, elbos = trainer.run_chunk(state, tc, Xd, Yd, args.steps)
        jax.block_until_ready(elbos)
        wall = time.time() - t0
        _log(f"steady-state: {args.steps / wall:.1f} steps/s")

        os.system(f'rm -rf {args.trace_dir}')
        with profiling.trace(args.trace_dir):
            state, elbos = trainer.run_chunk(state, tc, Xd, Yd, args.steps)
            jax.block_until_ready(elbos)
    else:
        wall = float('nan')

    per_op, op_meta, total, path = parse_trace(args.trace_dir)
    _log(f"trace: {path}; device total {total * 1e3:.1f} ms over "
         f"{args.steps} steps = {total / args.steps * 1e6:.1f} us/step")

    buckets = collections.Counter()
    for name, dur in per_op.items():
        buckets[bucket_of(name, op_meta.get(name, ''))] += dur

    print(f"== {args.config}: {args.steps / wall:.1f} steps/s, "
          f"{total / args.steps * 1e6:.1f} us/step device time ==")
    print("-- buckets (per step) --")
    for b, dur in buckets.most_common():
        print(f"{b:24s} {dur / args.steps * 1e6:9.1f} us  "
              f"{100 * dur / total:5.1f}%")
    print("-- top 30 ops (per step) --")
    for name, dur in per_op.most_common(30):
        meta = op_meta.get(name, '')[:110]
        print(f"{dur / args.steps * 1e6:9.1f} us  {100 * dur / total:5.1f}%  "
              f"{name[:80]}  | {meta}")

    if args.bucket_detail:
        print(f"-- top 25 ops in bucket '{args.bucket_detail}' --")
        rows = [(name, dur) for name, dur in per_op.most_common()
                if bucket_of(name, op_meta.get(name, ''))
                == args.bucket_detail]
        for name, dur in rows[:25]:
            meta = op_meta.get(name, '')[:140]
            print(f"{dur / args.steps * 1e6:9.1f} us  "
                  f"{100 * dur / total:5.1f}%  {name[:80]}  | {meta}")


if __name__ == '__main__':
    main()
