"""deepcgp_tpu: a TPU-native deep convolutional Gaussian process framework.

Functional JAX rebuild of the capabilities of kekeblom/DeepCGP (see
SURVEY.md): sparse variational conv-GP layers, doubly-stochastic DGP
training, robust-max multiclass likelihood, experiment/CLI layer, and
mesh-sharded multi-chip execution.
"""

from __future__ import annotations

import os


def _enable_persistent_compilation_cache() -> None:
    """XLA compiles through a remote helper on this platform (tens of
    seconds per program); the persistent cache makes model builds and repeat
    runs near-instant.  Opt out with DEEPCGP_NO_COMPILATION_CACHE=1."""
    if os.environ.get('DEEPCGP_NO_COMPILATION_CACHE'):
        return
    import jax
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.environ.get('JAX_COMPILATION_CACHE_DIR',
                           os.path.expanduser('~/.cache/deepcgp_xla')))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


_enable_persistent_compilation_cache()
