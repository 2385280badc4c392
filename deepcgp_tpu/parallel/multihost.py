"""Multi-host input pipeline (SURVEY.md §2.10 / §5.8: "multi-host DCN data
loading" is new design — the reference is single-process).

Pattern: each host loads only its shard of the training set
(:func:`process_shard`), and per-host batches are assembled into one global
device array across the mesh with
:func:`host_local_to_global` (``jax.make_array_from_process_local_data``) —
batch rows ride host->device PCIe once, never cross-host; gradient psums ride
ICI/DCN inside the jitted step.

Single-host (including this repo's CI and the one-chip bench) it all
degenerates to identity slicing, so the same experiment code runs anywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize_distributed(**kw) -> None:
    """``jax.distributed.initialize`` with env-based defaults; idempotent.

    Only the already-initialised error is swallowed — a genuine setup
    failure (bad/unreachable coordinator) must propagate, otherwise every
    host silently trains its own single-process model on a data shard."""
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:
        msg = str(e).lower()
        # jax 0.9 phrases this 'distributed.initialize should only be
        # called once.'; older versions said 'already initialized'.
        if 'only be called once' not in msg and 'already' not in msg:
            raise


def process_shard(array: np.ndarray, *, axis: int = 0) -> np.ndarray:
    """This host's contiguous slice of a host-loaded array (row-sharded
    across processes; trailing remainder goes to the last host)."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    n = array.shape[axis]
    per = n // n_proc
    start = idx * per
    stop = n if idx == n_proc - 1 else start + per
    return array.take(np.arange(start, stop), axis=axis)


def host_local_to_global(mesh, *arrays, axis_name: str = 'data'):
    """Assemble per-host batch shards into global jax.Arrays sharded over
    ``axis_name`` (each host contributes its local rows)."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in arrays)
    return out if len(out) > 1 else out[0]
