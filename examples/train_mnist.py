"""Train a 2-layer deep convolutional GP on MNIST.

Equivalent of the reference's headline invocation (`README.md:22-24`):

    python examples/train_mnist.py

Drop real data at ~/.cache/deepcgp/mnist.npz (keys x_train, y_train,
x_test, y_test) to reproduce the paper numbers; without it a deterministic
synthetic dataset keeps the example runnable anywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcgp_tpu.mnist import main

if __name__ == '__main__':
    main([
        '--name', 'mnist_example',
        '-N', '60000', '-M', '384,384',
        '--feature-maps', '10', '--filter-sizes', '5,5', '--strides', '2,1',
        '--batch-size', '32', '--num-samples', '10',
        '--test-every', '5000', '--lr-decay-steps', '30000',
        '--log-dir', 'results',
        '--full-state-ckpt',          # preemption-safe full-state resume
    ])
