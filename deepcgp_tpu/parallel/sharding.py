"""In-model sharding constraints.

The hot intermediates of a ConvLayer step are Kuf [P, M, N] and the q_sqrt
variance term [R, M, P, N] (SURVEY.md §3.3).  When a mesh is active these are
constrained so that:

* N (batch)   -> 'data'
* P (patches) -> 'model'   (the sequence-parallel axis of this workload)

Layers call :func:`constrain` on their intermediates; with no active mesh it
is a no-op, so single-device code paths are untouched.  Activate with::

    with mesh_context(mesh):
        state, elbos = run_chunk(...)   # jitted code sees the constraints
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_ACTIVE_MESH = contextvars.ContextVar('deepcgp_active_mesh', default=None)


@contextlib.contextmanager
def mesh_context(mesh):
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE_MESH.reset(token)


def active_mesh():
    return _ACTIVE_MESH.get()


def _axis_ok(mesh, axis_name, dim_size) -> bool:
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis_name, 1)
    return size > 1 and dim_size % size == 0


def constrain(x, *spec):
    """with_sharding_constraint(x, P(*spec)) under the active mesh; axes
    whose dimension does not divide the mesh axis are left unconstrained.
    No-op without an active mesh."""
    mesh = active_mesh()
    if mesh is None:
        return x
    clean = []
    for dim, name in enumerate(spec):
        if name is not None and _axis_ok(mesh, name, x.shape[dim]):
            clean.append(name)
        else:
            clean.append(None)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*clean)))
