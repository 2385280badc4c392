"""Turnkey MNIST accuracy-parity reproduction.

TWO separate acceptance targets, both reference-committed artifacts with
the same schedule family (single ConvKernel SVGP layer, lr 0.01,
lr_decay_steps 25000, test_every 5000, continuous decay, 15 epochs):

* default        — N=60000, M=64  (`/root/reference/results/N60000_M64/`),
                   final accuracy 0.9769;
* ``--m1024``    — N=60000, M=1024 (`.../results/N60000_M1024/`), the
                   north-star headline, final accuracy 0.9865.

Schedule provenance (the two disagree — both are honored):
* the artifact's lr column is 0.01 * 0.1^(t/25000) — CONTINUOUS decay —
  and the log has 15 rows (75k steps, run until lr reached 1e-5);
* the reference's CURRENT source uses staircase decay
  (`conv_gp/experiment.py:71-73`) and `arguments.py::train_steps` would
  stop the same flags at 60k steps.
This script reproduces the ARTIFACT (continuous decay, 15 epochs) because
that is what produced the 0.9769 number being asserted.  The default
threshold carries a small margin (0.974) for cross-framework trajectory
variance (different PRNG, different minibatch draws); pass
--threshold 0.9769 for the exact-or-better check.

Usage (requires the REAL dataset — this script refuses the synthetic
fallback):

    DEEPCGP_DATA_DIR=/path/with/mnist.npz make mnist-parity
    # or: python examples/mnist_parity.py [--threshold 0.9769] [--fast]

``mnist.npz`` needs keys x_train [60000, 784], y_train [60000],
x_test [10000, 784], y_test [10000] (uint8-scale pixel values).
``--fast`` runs a shortened schedule (N=10000, 3 epochs) for smoke checks;
the parity assertion then uses the N=10000 baseline row (0.9726,
`results/N10000_M100/log.csv`) minus a margin.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--threshold', type=float, default=None,
                        help="Final-accuracy assertion; default 0.9769 "
                             "(the reference's committed M=64 result), or "
                             "0.9865 with --m1024.")
    parser.add_argument('--m1024', action='store_true',
                        help="North-star config: N=60000, M=1024 "
                             "(results/N60000_M1024, 0.9865 final).")
    parser.add_argument('--fast', action='store_true',
                        help="N=10000 shortened schedule for smoke checks.")
    parser.add_argument('--log-dir', type=str, default='results')
    args = parser.parse_args(argv)

    from deepcgp_tpu.training import data as data_lib
    npz = os.path.join(data_lib.data_dir(), 'mnist.npz')
    if not os.path.exists(npz):
        print(f"ERROR: real MNIST not found at {npz}.\n"
              "Place mnist.npz (keys x_train, y_train, x_test, y_test) "
              "under $DEEPCGP_DATA_DIR and re-run.", file=sys.stderr)
        return 2

    from deepcgp_tpu.mnist import MNIST, read_args
    if args.fast and args.m1024:
        print("ERROR: --fast runs the M=64 N=10000 smoke config only; "
              "drop one of --fast / --m1024.", file=sys.stderr)
        return 2
    if args.fast:
        threshold = args.threshold if args.threshold is not None else 0.95
        flags = read_args([
            '--name', 'mnist_parity_fast', '-N', '10000', '-M', '64',
            '--feature-maps', '', '--filter-sizes', '5', '--strides', '1',
            '--lr-decay-steps', '5000', '--test-every', '5000',
            '--log-dir', args.log_dir, '--no-tensorboard'])
    else:
        # The ARTIFACT schedule (see module docstring): continuous decay,
        # driven for the artifact's 15 logged epochs (75k steps) rather
        # than train_steps' 60k.  Margins (0.974 / 0.983 vs the artifacts'
        # 0.9769 / 0.9865) allow cross-framework trajectory variance;
        # --threshold overrides for the exact-or-better check.
        M, artifact = ('1024', 0.983) if args.m1024 else ('64', 0.974)
        threshold = args.threshold if args.threshold is not None else artifact
        flags = read_args([
            '--name', f'mnist_parity_m{M}', '-N', '60000', '-M', M,
            '--feature-maps', '', '--filter-sizes', '5', '--strides', '1',
            '--lr-decay-steps', '25000', '--test-every', '5000',
            '--lr-decay-continuous',
            '--log-dir', args.log_dir, '--no-tensorboard'])

    experiment = MNIST(flags)
    if args.fast:
        experiment.run()  # the flags' own schedule
    else:
        try:
            for _ in range(15):  # artifact log rows 0..14 -> 75k steps
                experiment.train_step()
        finally:
            experiment.conclude()

    acc = experiment.test_accuracy()
    status = 'PASS' if acc >= threshold else 'FAIL'
    ref = 0.9865 if args.m1024 else 0.9769
    if args.fast:
        ref = 0.9769  # smoke config is the M=64 family
    print(f"mnist-parity: final test_accuracy={acc:.4f} "
          f"threshold={threshold:.4f} "
          f"(reference artifact {ref}) -> {status}")
    return 0 if acc >= threshold else 1


if __name__ == '__main__':
    raise SystemExit(main())
