"""pjit + pallas_call on REAL TPU (VERDICT r3 next #4a).

The Pallas linalg/extraction kernels gate on `default_backend() == 'tpu'`
and every mesh test runs on CPU, so until this script the composition a
real multi-chip run would execute — a pjit'd chunk containing pallas_calls
— had never compiled anywhere.  A 1-device mesh on the single available
chip exercises exactly that composition (GSPMD partitions the module,
inserts the sharding machinery, and the pallas custom calls must compile
inside it); steps/s and the ELBO trace must match the mesh-less run.

Usage (single TPU client, no timeouts — CLAUDE.md rules):
    nohup python tools/mesh_tpu_check.py > /tmp/mesh_tpu.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deepcgp_tpu.models.builder import BuilderFlags, build_model
    from deepcgp_tpu.parallel import mesh as mesh_lib
    from deepcgp_tpu.parallel.train import make_sharded_train_fns
    from deepcgp_tpu.training import trainer
    from deepcgp_tpu.training.trainer import TrainConfig

    steps = 300
    rng = np.random.RandomState(0)
    flags = BuilderFlags(M='384,384', feature_maps='10', filter_sizes='5,5',
                         strides='3,1', num_samples=10, batch_size=32)
    X = rng.randn(2048, 32, 32, 3).astype(np.float32)
    Y = rng.randint(0, 10, size=(2048, 1))

    print(f"devices: {jax.devices()}", flush=True)
    model = build_model(flags, X, Y, jax.random.PRNGKey(0),
                        dtype=jnp.float32)
    config = TrainConfig(optimizer='Adam', lr=0.01, lr_decay_steps=100000,
                         gamma=0.001, batch_size=32)
    state0 = trainer.init_state(model, config, jax.random.PRNGKey(1))
    Xd = jnp.asarray(X.reshape(X.shape[0], -1))
    Yd = jnp.asarray(Y)

    def timed(fn, tag):
        t0 = time.time()
        st, elbos = fn(state0, Xd, Yd)
        jax.block_until_ready(elbos)
        print(f"[{tag}] warmup (compile + {steps} steps) "
              f"in {time.time() - t0:.1f}s", flush=True)
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            st, elbos = fn(state0, Xd, Yd)
            jax.block_until_ready(elbos)
            best = max(best, steps / (time.time() - t0))
        return best, np.asarray(elbos)

    # Mesh-less reference.
    sps_ref, elbos_ref = timed(
        lambda s, X_, Y_: trainer.run_chunk(s, config, X_, Y_, steps),
        'no-mesh')

    # 1-device mesh: GSPMD-partitioned module containing the pallas calls.
    mesh = mesh_lib.make_mesh({'data': 1})
    _, chunk_fn = make_sharded_train_fns(mesh, config)
    sps_mesh, elbos_mesh = timed(
        lambda s, X_, Y_: chunk_fn(s, X_, Y_, steps), 'mesh-data1')

    same = np.allclose(elbos_ref, elbos_mesh, rtol=1e-5)
    ok = same and sps_mesh > 0.9 * sps_ref
    print(f"MESH TPU CHECK {'OK' if ok else 'FAIL'}: no-mesh "
          f"{sps_ref:.1f} steps/s, mesh(data=1) {sps_mesh:.1f} steps/s, "
          f"elbo traces {'match' if same else 'DIFFER'} "
          f"(first {elbos_ref[0]:.2f} vs {elbos_mesh[0]:.2f}, "
          f"last {elbos_ref[-1]:.2f} vs {elbos_mesh[-1]:.2f})", flush=True)
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
