"""Feature-map sweep on CIFAR-10 — the reference's `fm_experiment.ipynb` /
`notebooks/data/cifar_fm*` experiment as a script:

    python examples/fm_sweep.py --feature-maps 1 2 5 10 --chunks 5

Each sweep point trains the 2-layer conv GP with C feature maps and records
final test accuracy + steps/sec into <log-dir>/fm_sweep_summary.csv (the
per-run log.csv files match the reference's committed results layout).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcgp_tpu.cifar import Cifar, read_args


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--feature-maps', type=int, nargs='+',
                        default=[1, 2, 5, 10])
    parser.add_argument('--chunks', type=int, default=5,
                        help="test_every-sized training chunks per point.")
    parser.add_argument('--test-every', type=int, default=1000)
    parser.add_argument('--log-dir', type=str, default='results/fm_sweep')
    args = parser.parse_args()

    rows = []
    for fm in args.feature_maps:
        flags = read_args([
            '--name', f'fm{fm}', '-M', '384,384',
            '--feature-maps', str(fm), '--filter-sizes', '5,5',
            '--strides', '3,1', '--batch-size', '32', '--num-samples', '10',
            '--test-every', str(args.test_every),
            '--lr-decay-steps', str(args.test_every * args.chunks),
            '--log-dir', args.log_dir, '--no-tensorboard'])
        exp = Cifar(flags)
        try:
            for _ in range(args.chunks):
                exp.train_step()
            rows.append({'feature_maps': fm,
                         'test_accuracy': exp.test_accuracy(),
                         'train_elbo': exp.last_mean_elbo})
        finally:
            exp.conclude()
        print(f"C={fm}: {rows[-1]}", flush=True)

    out = os.path.join(args.log_dir, 'fm_sweep_summary.csv')
    os.makedirs(args.log_dir, exist_ok=True)
    with open(out, 'w', newline='') as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {out}")


if __name__ == '__main__':
    main()
