"""Serve predictions from a trained run.

    python examples/serve.py results/mnist_example

Loads the snapshot, compiles one fixed-shape program, and serves batched
class probabilities / labels / log-densities.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from deepcgp_tpu.serving import Predictor
from deepcgp_tpu.training import data


def main(run_dir: str) -> None:
    import types
    flags = types.SimpleNamespace(N=2000, test_size=1000, seed=0)
    X_train, Y_train, X_test, Y_test = data.mnist_data(flags)

    pred = Predictor.from_run_dir(run_dir, X_train, Y_train,
                                  batch_size=128, num_samples=5)
    # Warm the compiled program, then measure serving throughput.
    pred.predict_proba(X_test[:128])
    t0 = time.time()
    labels = pred.predict(X_test)
    dt = time.time() - t0
    acc = float((labels[:, None] == Y_test).mean())
    print(f"served {len(X_test)} points in {dt:.2f}s "
          f"({len(X_test) / dt:.0f} img/s), accuracy {acc:.4f}")
    dens = pred.log_density(X_test[:32], Y_test[:32])
    print("mean predictive log-density (first 32):", float(np.mean(dens)))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'results/mnist_example')
