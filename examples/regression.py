"""Deep GP regression with a Gaussian likelihood — the DGP core is not
conv/classification-specific: stack plain SVGP layers over any inputs.

    python examples/regression.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepcgp_tpu.models.base_kernels import RBF
from deepcgp_tpu.models.dgp import DGP
from deepcgp_tpu.models.layers import SVGPLayer
from deepcgp_tpu.models.likelihoods import Gaussian
from deepcgp_tpu.models.mean_functions import Zero
from deepcgp_tpu.ops.kmeans import kmeans
from deepcgp_tpu.training import trainer
from deepcgp_tpu.training.trainer import TrainConfig


def build_regression_dgp(X: np.ndarray, num_inducing: int = 32,
                         hidden_dim: int = 2, dtype=jnp.float32) -> DGP:
    Z = np.asarray(kmeans(jax.random.PRNGKey(0), jnp.asarray(X, dtype),
                          num_inducing, init='k-means++'))
    hidden = SVGPLayer.create(
        RBF.create(variance=1.0, lengthscales=1.0, dtype=dtype), Z,
        num_outputs=hidden_dim, mean_function=Zero(output_dim=hidden_dim),
        dtype=dtype)
    rng = np.random.RandomState(0)
    Z2 = rng.randn(num_inducing, hidden_dim)
    out = SVGPLayer.create(
        RBF.create(variance=1.0, lengthscales=1.0, dtype=dtype), Z2,
        num_outputs=1, mean_function=Zero(output_dim=1), dtype=dtype)
    return DGP(layers=(hidden, out), likelihood=Gaussian.create(0.1),
               num_data=X.shape[0], num_samples=5)


def main() -> None:
    rng = np.random.RandomState(0)
    X = np.sort(rng.uniform(-3, 3, size=(256, 1)), axis=0)
    Y = np.where(X < 0, -1.0, 1.0) + 0.05 * rng.randn(256, 1)  # step fn

    model = build_regression_dgp(X.astype(np.float32))
    config = TrainConfig(optimizer='Adam', lr=0.01, lr_decay_steps=2000,
                         gamma=0.001, batch_size=64)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd, Yd = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
    for chunk in range(5):
        state, elbos = trainer.run_chunk(state, config, Xd, Yd, 400)
        print(f"step {int(state.step)}: elbo/point "
              f"{float(elbos[-1]) / 256:.4f}", flush=True)

    mean, var = state.model.predict_y(Xd, jax.random.PRNGKey(2), 10)
    rmse = float(jnp.sqrt(jnp.mean((jnp.mean(mean, 0) - Yd) ** 2)))
    print(f"train RMSE {rmse:.4f} (noise floor ~0.05)")


if __name__ == '__main__':
    main()
