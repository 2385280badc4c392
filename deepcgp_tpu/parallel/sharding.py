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
import warnings

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_ACTIVE_MESH = contextvars.ContextVar('deepcgp_active_mesh', default=None)
_WARNED_DROPS: set = set()  # one warning per (shape, spec, mesh shape)


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
    """with_sharding_constraint(x, P(*spec)) under the active mesh.
    No-op without an active mesh — and also when any REQUESTED axis does
    not divide its mesh axis: a None in a PartitionSpec is a hard
    'replicate' pin (not 'unconstrained'), so partially applying the
    constraint would force e.g. a non-dividing batch dim fully replicated
    on every chip; leaving GSPMD to infer is strictly better there."""
    mesh = active_mesh()
    if mesh is None:
        return x
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    clean = []
    for dim, name in enumerate(spec):
        if name is None or sizes.get(name, 1) == 1:
            clean.append(None)
        elif _axis_ok(mesh, name, x.shape[dim]):
            clean.append(name)
        else:
            # Requested axis doesn't divide: skip the whole constraint (a
            # None in a PartitionSpec is a hard 'replicate' pin, so partial
            # application would be worse) — but say so ONCE at trace time:
            # a user's '--mesh data=4,model=2' with e.g. an odd patch count
            # would otherwise silently train pure-dp.
            sig = (x.shape, spec, tuple(sizes.items()))
            if sig not in _WARNED_DROPS:
                _WARNED_DROPS.add(sig)
                warnings.warn(
                    f"deepcgp_tpu sharding constraint {spec} dropped for an "
                    f"array of shape {x.shape}: dim {dim} (size "
                    f"{x.shape[dim]}) does not divide mesh axis "
                    f"'{name}' (size {sizes.get(name)}); GSPMD will infer "
                    "this tensor's sharding instead", stacklevel=2)
            return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*clean)))
