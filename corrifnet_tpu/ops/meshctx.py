"""Ambient kernel mesh: SPMD-safe Pallas call sites under a device mesh.

Under data-parallel training (``corrifnet_tpu.parallel``) the train/eval
steps are GSPMD programs: XLA's auto-partitioner owns every op. A
``pallas_call`` inside such a program is an opaque custom call the
partitioner cannot split, so the kernels must declare their own
partitioning. The TPU-idiomatic form (same pattern as production JAX
flash-attention stacks) is a fully-manual ``shard_map`` *island*: batch
sharded over the ``data`` axis, everything else replicated, XLA inserting
any reshards at the island boundary.

The mesh is ambient context rather than a model attribute because it is a
property of the *run*, not the architecture: ``train_model``/``evaluate``
enter ``kernel_mesh(mesh)`` around tracing, and every kernel call site
asks ``current_kernel_mesh()`` whether to wrap itself. Single-device runs
(the default) see ``None`` and call the kernel directly — zero overhead.

Verified on the 8-virtual-device CPU mesh in interpret mode
(tests/test_pallas_spmd.py). Caveat recorded there: interpret-mode
kernels lower to host callbacks, which deadlock when the mesh has a
second (replicating) axis — pure-dp ``(n, 1)`` meshes are the
interpret-testable shape; on hardware the kernels are Mosaic custom
calls and no callback exists.
"""

from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import PartitionSpec as P

__all__ = ["kernel_mesh", "current_kernel_mesh", "island"]

_state = threading.local()


def current_kernel_mesh():
    """The (mesh, batch_axis) pair set by ``kernel_mesh``, or None."""
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def kernel_mesh(mesh, batch_axis: str = "data"):
    """Make Pallas call sites shard themselves over ``batch_axis``.

    Must span *tracing* of the jitted program (trace-time context): wrap
    the training/eval loop, not individual dispatches.
    """
    prev = getattr(_state, "ctx", None)
    _state.ctx = (mesh, batch_axis)
    try:
        yield
    finally:
        _state.ctx = prev


def island(fn, batch_dims, out_batch_dim):
    """Wrap ``fn(*arrays)`` in a fully-manual shard_map over the ambient
    mesh's batch axis, or return ``fn`` unchanged outside a mesh context.

    ``batch_dims``: per-argument dim index carrying the batch (None =
    replicated argument); ``out_batch_dim``: batch dim of the result.
    Falls back to the unwrapped call when the batch extent does not
    divide the data-axis size (shard_map requires even shards; the
    framework's batchers always produce divisible batches under a mesh).
    """
    ctx = current_kernel_mesh()
    if ctx is None:
        return fn
    mesh, axis = ctx
    n = mesh.shape[axis]
    if n == 1:
        return fn

    def spec(dim):
        if dim is None:
            return P()
        return P(*([None] * dim + [axis]))

    def wrapped(*arrays):
        for a, d in zip(arrays, batch_dims):
            if d is not None and a.shape[d] % n != 0:
                return fn(*arrays)
        return jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=tuple(spec(d) for d in batch_dims),
            out_specs=spec(out_batch_dim),
            check_vma=False,
        )(*arrays)

    return wrapped
