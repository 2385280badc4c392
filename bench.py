"""Benchmark: optimizer steps/sec on the flagship CIFAR-10 2-layer deep
conv-GP config (reference `notebooks/data/cifar_fm10/options.toml`:
M=384,384, feature_maps=10, filters 5,5, strides 3,1, Adam, batch 32,
num_samples 10).

Baseline: 2.14 steps/sec on the reference authors' cluster GPU
(BASELINE.md, derived from notebooks/data/cifar_fm10.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 2.14


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from deepcgp_tpu.models.builder import BuilderFlags, build_model
    from deepcgp_tpu.training import trainer
    from deepcgp_tpu.training.trainer import TrainConfig

    rng = np.random.RandomState(0)
    flags = BuilderFlags(M='384,384', feature_maps='10', filter_sizes='5,5',
                         strides='3,1', num_samples=10, batch_size=32)
    # Synthetic CIFAR-shaped data (bench measures compute, not accuracy).
    N = 2048
    X = rng.randn(N, 32, 32, 3).astype(np.float32)
    Y = rng.randint(0, 10, size=(N, 1))

    _log(f"devices: {jax.devices()}")
    t0 = time.time()
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float32)
    _log(f"model built in {time.time() - t0:.1f}s")

    config = TrainConfig(optimizer='Adam', lr=0.01, lr_decay_steps=100000,
                         gamma=0.001, batch_size=32)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd = jnp.asarray(X.reshape(N, -1))
    Yd = jnp.asarray(Y)

    # Warmup (compile + first execution).  num_steps is a static arg of the
    # jitted scan, so the warmup chunk MUST have the same length as the timed
    # one or the timing silently includes a fresh compile.
    steps = 300
    t0 = time.time()
    state, elbos = trainer.run_chunk(state, config, Xd, Yd, steps)
    jax.block_until_ready(elbos)
    _log(f"warmup chunk (compile + {steps} steps) in {time.time() - t0:.1f}s")

    # Timed steady-state chunks; report the best of three.
    steps_per_sec = 0.0
    for _ in range(3):
        t0 = time.time()
        state, elbos = trainer.run_chunk(state, config, Xd, Yd, steps)
        jax.block_until_ready(elbos)
        steps_per_sec = max(steps_per_sec, steps / (time.time() - t0))
    _log(f"final elbo {float(elbos[-1]):.1f}")
    result = {
        "metric": "cifar10_2layer_convgp_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "optimizer steps/sec (batch 32, S=10, M=384,384)",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }
    print(json.dumps(result))
    # Secondary diagnostics on stderr-adjacent lines are not allowed by the
    # driver contract (single JSON line on stdout), so extras go nowhere.
    return result


if __name__ == '__main__':
    main()
