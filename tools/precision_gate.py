"""On-TPU numerics gate for the inverse-apply matmul precision.

`DEEPCGP_INV_PRECISION` changes TPU MXU pass counts only — CPU f32 runs
exact f32 either way, so the CPU test suite and the f64 elbo_drift gate
cannot see it.  This script isolates the evaluation-precision error ON the
TPU: build the flagship model (deterministic init on learnable blobs),
compute the ELBO and the parameter-gradient global norm with a fixed MC
key, then run a 300-step Adam chunk and re-measure.  Run it once per
precision setting and diff the JSONs; trajectory-chaos is avoided by
comparing the SAME program points, not post-divergence states.

Usage (single TPU client, no timeouts — CLAUDE.md rules):
    DEEPCGP_INV_PRECISION=highest nohup python tools/precision_gate.py \
        > /tmp/pgate_highest.json 2>/tmp/pgate_highest.log &
    # then, after it exits:
    DEEPCGP_INV_PRECISION=high nohup python tools/precision_gate.py \
        > /tmp/pgate_high.json 2>/tmp/pgate_high.log &

Acceptance: relative ELBO diff and relative grad-norm diff < 1e-4 at both
program points (fresh init AND post-Adam), plus a clean NatGrad soak
(tools/soak.py) at the candidate precision.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.soak import blobs  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from deepcgp_tpu.models.builder import BuilderFlags, build_model
    from deepcgp_tpu.training import trainer
    from deepcgp_tpu.training.trainer import TrainConfig

    label = os.environ.get('DEEPCGP_INV_PRECISION', 'high')
    flags = BuilderFlags(M='384,384', feature_maps='10', filter_sizes='5,5',
                         strides='3,1', num_samples=10, batch_size=32)
    X, Y = blobs(2048, (32, 32, 3), 10, seed=0)
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float32)
    config = TrainConfig(optimizer='Adam', lr=0.01, lr_decay_steps=100000,
                         gamma=0.001, batch_size=32)
    state = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd = jnp.asarray(X.reshape(X.shape[0], -1))
    Yd = jnp.asarray(Y)
    xb, yb = Xd[:32], Yd[:32]
    key = jax.random.PRNGKey(7)

    @jax.jit
    def elbo_and_gnorm(model):
        def loss(m):
            return -m.elbo(xb, yb, key)
        val, grads = jax.value_and_grad(loss)(model)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                          for g in jax.tree_util.tree_leaves(grads)))
        return -val, gn

    e0, g0 = elbo_and_gnorm(state.model)
    out = {'precision': label,
           'elbo_init': float(e0), 'gnorm_init': float(g0)}

    state, elbos = trainer.run_chunk(state, config, Xd, Yd, 300)
    jax.block_until_ready(elbos)
    # elbos reflect the (precision-dependent) trajectory; the paired
    # measurement is elbo/gnorm at the SAME param point, so re-measure on
    # the final state only for the highest-vs-high diff of a *trained*
    # (less benign) parameter point.  Trajectories diverge chaotically, so
    # this second point is a looser check than the init point.
    e1, g1 = elbo_and_gnorm(state.model)
    out.update(elbo_post_adam=float(e1), gnorm_post_adam=float(g1),
               elbo_last_train=float(elbos[-1]),
               elbos_first10=[float(v) for v in elbos[:10]])
    print(json.dumps(out))


if __name__ == '__main__':
    main()
