"""Benchmark: MMVit4 (CorrIFNet) end-to-end training throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Metric: 224x224 multispectral patches/sec through the full jitted train step
(fwd + bwd + Adam update) in bf16 with the Pallas correlation kernel and the
depth-pruned decoder. ``vs_baseline`` is measured against the BASELINE.json
target of 2,000 patches/sec/chip (the reference itself publishes no
throughput numbers — its fpsfile.txt slot is empty, F7_TEST2.py:135).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TARGET = 2000.0  # patches/sec/chip (BASELINE.json)


def bench_train_step(batch_size=8, iters=20, warmup=3):
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import init_state, make_optimizer, make_train_step

    model = MMVit4(dtype=jnp.bfloat16, use_pallas=True, depth_mode="pruned")
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch_size, 3, 3, 224, 224)).astype(np.float32)
    )
    masks = jnp.asarray(
        (rng.random((batch_size, 3, 1, 224, 224)) > 0.7).astype(np.float32)
    )
    valid = jnp.ones((batch_size,), jnp.float32)

    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    train_step = make_train_step(model, optimizer)
    key = jax.random.PRNGKey(1)

    for _ in range(warmup):
        state, metrics = train_step(state, images, masks, valid, 1e-4, key)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, images, masks, valid, 1e-4, key)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    import os

    batch = int(os.environ.get("BENCH_BATCH", "0"))
    if batch:
        value = bench_train_step(batch_size=batch)
    else:
        # modest sweep: pick the best throughput batch size
        value = max(bench_train_step(batch_size=b, iters=12) for b in (8, 16))
    print(
        json.dumps(
            {
                "metric": "mmvit4_train_patches_per_sec",
                "value": round(value, 2),
                "unit": "224x224 patches/sec/chip",
                "vs_baseline": round(value / BASELINE_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
