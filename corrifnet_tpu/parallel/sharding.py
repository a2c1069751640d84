"""Sharding rules: batch data-parallelism + transformer tensor-parallelism.

Placement follows the "computation follows data" idiom: parameters and
batches are ``device_put`` with NamedShardings and the ordinary jitted train
step runs SPMD — XLA inserts the gradient psums (data axis) and qkv/proj
all-gathers/reduce-scatters (model axis) automatically over ICI.

Tensor-parallel rules (applied by parameter path):
  * attention ``qkv`` and MLP ``fc1`` kernels: sharded on output features
    (column parallel) — P(..., 'model');
  * attention ``proj`` and MLP ``fc2`` kernels: sharded on input features
    (row parallel) — P('model', ...);
  * everything else (convs, norms, biases): replicated. The conv stacks are
    compute-bound on the batch axis, so data parallelism covers them.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "batch_sharding",
    "replicated",
    "param_partition_spec",
    "shard_params",
    "shard_state",
    "put_batch",
]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path: str, leaf) -> P:
    """PartitionSpec for a parameter given its '/'-joined path."""
    if leaf.ndim < 2:
        return P()
    # vmapped modality params have a leading stacked axis; the kernel's
    # (in, out) are always the last two axes.
    pad = (None,) * (leaf.ndim - 2)
    if ("qkv" in path or "fc1" in path) and path.endswith("kernel"):
        return P(*pad, None, "model")
    if ("proj" in path or "fc2" in path) and path.endswith("kernel"):
        return P(*pad, "model", None)
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        parts.append(str(key if key is not None else p))
    return "/".join(parts)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put each param with its tensor-parallel NamedSharding."""

    def place(path, leaf):
        spec = param_partition_spec(_path_str(path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: params (and mirrored Adam moments) by TP rules,
    batch_stats and scalars replicated."""
    params = shard_params(state.params, mesh)
    opt_state = _shard_like_params(state.opt_state, params, mesh)
    batch_stats = jax.device_put(state.batch_stats, replicated(mesh))
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        step=jax.device_put(state.step, replicated(mesh)),
    )


def _shard_like_params(opt_state, sharded_params, mesh):
    """Adam moments mirror param shapes; give them the matching sharding
    (matched by trailing parameter path, e.g. 'mu/<params path>')."""
    flat_params = [
        (_path_str(p), l.sharding)
        for p, l in jax.tree_util.tree_flatten_with_path(sharded_params)[0]
    ]

    def place(path, leaf):
        ps = _path_str(path)
        for key, sh in flat_params:
            if ps.endswith(key):
                return jax.device_put(leaf, sh)
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, opt_state)


def put_batch(mesh: Mesh, *arrays):
    """Place batch arrays sharded along the data axis (axis 0)."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)
