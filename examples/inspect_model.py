"""Analyze a trained run: the library form of the reference's notebooks.

    python examples/inspect_model.py results/mnist_example

Prints noise-robustness accuracies, writes inducing-patch tilings plus 2-D
patch embeddings as .npy arrays next to the run, and renders the notebook
figures (inducing-patch grid, patch-embedding scatter, noise-robustness
curve — `notebooks/Inspect.ipynb`) as PNGs in the run dir.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import numpy as np

from deepcgp_tpu.serving import Predictor
from deepcgp_tpu.training import data
from deepcgp_tpu.utils import inspect as insp


def main(run_dir: str) -> None:
    import types
    flags = types.SimpleNamespace(N=2000, test_size=1000, seed=0)
    X_train, Y_train, X_test, Y_test = data.mnist_data(flags)

    pred = Predictor.from_run_dir(run_dir, X_train, Y_train)
    model = pred.model

    # Per-layer features for embedding/visualisation (notebooks' propagate).
    samples, means, variances = insp.layer_features(
        model, X_test.reshape(len(X_test), -1)[:256], jax.random.PRNGKey(0))
    print("layer output shapes:", [s.shape for s in samples])

    # Inducing-patch tiling of the first conv layer.
    grid = insp.inducing_patch_grid(model.layers[0])
    np.save(f"{run_dir}/inducing_grid.npy", grid)
    print(f"inducing grid {grid.shape} -> {run_dir}/inducing_grid.npy")

    # 2-D embedding of inducing patches vs data patches.
    emb_z, emb_d = insp.patch_embedding(model.layers[0], X_train[:500])
    np.save(f"{run_dir}/embedding_inducing.npy", emb_z)
    np.save(f"{run_dir}/embedding_data.npy", emb_d)

    # Noise robustness (Inspect.ipynb's sweep).
    accs = insp.noise_robustness(model, X_test, Y_test,
                                 jax.random.PRNGKey(1))
    for sigma, acc in accs.items():
        print(f"noise sigma={sigma:.2f}: accuracy {acc:.4f}")

    # Rendered figure artifacts (the notebooks' output, as PNGs).
    # render_run_figures guards per-layer for patch views, so plain-RBF
    # last-layer models still get their noise-robustness figure.
    from deepcgp_tpu.utils import figures
    for p in figures.render_run_figures(run_dir, model, X_train[:500],
                                        X_test.reshape(len(X_test), -1),
                                        Y_test, jax.random.PRNGKey(1),
                                        accuracies=accs):
        print(f"wrote {p}")


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'results/mnist_example')
