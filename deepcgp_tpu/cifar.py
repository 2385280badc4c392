"""CIFAR-10 experiment entry point (rebuild of `conv_gp/cifar.py`)."""

from __future__ import annotations

from deepcgp_tpu.training import data
from deepcgp_tpu.training.arguments import default_parser
from deepcgp_tpu.training.experiment import Experiment


class Cifar(Experiment):
    def _load_data(self):
        (self.X_train, self.Y_train, self.X_test, self.Y_test) = \
            data.cifar_data(self.flags)


def read_args(argv=None):
    parser = default_parser()
    parser.add_argument('--tensorboard-dir', type=str,
                        default='/tmp/cifar10/tensorboard')
    parser.add_argument('-N', type=int, default=50000,
                        help="Use N training examples.")
    return parser.parse_args(argv)


def main(argv=None):
    Cifar(read_args(argv)).run()


if __name__ == '__main__':
    main()
