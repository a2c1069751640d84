"""Mesh-shape ablation: (8,1) pure-DP vs (4,2) DP+TP on 8 virtual devices.

The sharding rules (parallel/sharding.py) shard only transformer matmuls on
the model axis; convs — ~90% of MMVit4 FLOPs (SURVEY §3.2) — are batch-
sharded over 'data' and replicated over 'model'. On a (4,2) mesh each
device therefore computes batch/4 worth of convs (2x the (8,1) per-device
conv work) in exchange for halved transformer matmul columns.

This script quantifies that on the CPU virtual mesh two ways:
  * per-device HLO FLOPs from compiled cost_analysis (the 1-core CPU box
    serializes virtual devices, so wall time conflates devices; FLOPs are
    the clean per-device signal);
  * end-to-end wall time per step (aggregate work across the 8 virtual
    devices — directionally equal to total FLOPs on 1 core).

Usage: python scripts/mesh_ablation.py  (forces CPU + 8 virtual devices)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(shape, batch=8, hw=64, iters=3):
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.parallel import make_mesh, put_batch, shard_state
    from corrifnet_tpu.train import init_state, make_optimizer, make_train_step

    mesh = make_mesh(shape)
    model = MMVit4(dtype=jnp.bfloat16, use_pallas=False, depth_mode="pruned")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (batch, 3, 3, hw, hw)).astype(np.float32))
    masks = jnp.asarray(
        (rng.random((batch, 3, 1, 224, 224)) > 0.7).astype(np.float32)
    )
    valid = jnp.ones((batch,), jnp.float32)

    optimizer = make_optimizer("Adam")
    with mesh:
        state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
        state = shard_state(state, mesh)
        images, masks, valid = put_batch(mesh, images, masks, valid)
        train_step = make_train_step(model, optimizer)

        lowered = train_step.lower(state, images, masks, valid, 1e-4,
                                   jax.random.PRNGKey(1))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_device = float(ca.get("flops", float("nan")))

        state, m = train_step(state, images, masks, valid, 1e-4,
                              jax.random.PRNGKey(1))
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, images, masks, valid, 1e-4,
                                  jax.random.PRNGKey(1))
            _ = float(m["loss"])
        step_s = (time.perf_counter() - t0) / iters
    return {
        "mesh": list(shape),
        "flops_per_device_G": round(flops_per_device / 1e9, 2),
        "step_s_1core_aggregate": round(step_s, 2),
        "loss0": round(float(m["loss"]), 4),
    }


def main():
    results = [run((8, 1)), run((4, 2))]
    for r in results:
        print(json.dumps(r), flush=True)
    dp, tp = results
    ratio = tp["flops_per_device_G"] / dp["flops_per_device_G"]
    print(f"# (4,2) per-device FLOPs = {ratio:.2f}x of (8,1)", flush=True)


if __name__ == "__main__":
    main()
