"""Device mesh construction (new capability — the reference is single-GPU,
``cuda:0`` only at F2_MAIN.py:56/F4_TRAIN.py:34/F7_TEST2.py:35; SURVEY §5.8).

The standard mesh is ``('data', 'model')``: batch-axis data parallelism over
``data`` (ICI ring) and tensor parallelism of the transformer matmuls over
``model``. A leading DCN axis can be prepended for multi-slice scale-out
(kept at size 1 for single-slice parity work).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh", "default_mesh_shape"]


def default_mesh_shape(n_devices: Optional[int] = None) -> Tuple[int, int]:
    """(data, model) factorization — pure data parallelism by default.

    Measured (scripts/mesh_ablation.py, 8 virtual devices): the tensor-
    parallel rules shard only the transformer matmuls, while convs —
    ~90% of MMVit4 FLOPs (SURVEY §3.2) — replicate over 'model', so a
    (4, 2) mesh costs 1.23x the per-device FLOPs (cost_analysis) and ~2x
    the aggregate step time of (8, 1). The model axis stays available for
    explicit ``mesh_shape`` configs (validated by the multichip dryrun),
    but buys nothing at this model scale.
    """
    n = n_devices or len(jax.devices())
    return (n, 1)


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = default_mesh_shape(len(devices))
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    return Mesh(dev_array, tuple(axis_names))
