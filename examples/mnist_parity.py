"""Turnkey MNIST accuracy-parity reproduction.

Reproduces the reference's committed N=60000, M=64 run
(`/root/reference/results/N60000_M64/options.toml`: single ConvKernel SVGP
layer, lr 0.01, lr_decay_steps 25000, test_every 5000 => 75k optimizer
steps) and asserts the final test accuracy matches the reference's final
row (0.9769, `results/N60000_M64/log.csv`).

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
                             "(the reference's committed M=64 result).")
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
    if args.fast:
        threshold = args.threshold if args.threshold is not None else 0.95
        flags = read_args([
            '--name', 'mnist_parity_fast', '-N', '10000', '-M', '64',
            '--feature-maps', '', '--filter-sizes', '5', '--strides', '1',
            '--lr-decay-steps', '5000', '--test-every', '5000',
            '--log-dir', args.log_dir, '--no-tensorboard'])
    else:
        threshold = args.threshold if args.threshold is not None else 0.9769
        # Exact N60000_M64 schedule (options.toml above).
        flags = read_args([
            '--name', 'mnist_parity_m64', '-N', '60000', '-M', '64',
            '--feature-maps', '', '--filter-sizes', '5', '--strides', '1',
            '--lr-decay-steps', '25000', '--test-every', '5000',
            '--log-dir', args.log_dir, '--no-tensorboard'])

    experiment = MNIST(flags)
    experiment.run()  # full schedule; closes its loggers when done

    acc = experiment.test_accuracy()
    status = 'PASS' if acc >= threshold else 'FAIL'
    print(f"mnist-parity: final test_accuracy={acc:.4f} "
          f"threshold={threshold:.4f} -> {status}")
    return 0 if acc >= threshold else 1


if __name__ == '__main__':
    raise SystemExit(main())
