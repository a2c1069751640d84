"""Perf ablation harness: MMVit4 train-step variants, one process.

Runs a sequence of model/batch variants in a single process so the remote
compile service stays warm across variants (NOTES: the second compile after
a warm-up shares ~all of the service latency). Each variant is timed with
per-step host fetches (block_until_ready is untrustworthy through the axon
tunnel) minus the measured round-trip floor.

Usage:
    python scripts/ablate_perf.py out.jsonl variant1 variant2 ...

Variant syntax: name=key:val,key:val  e.g.
    base=batch:16
    nr=batch:16,remat:none
    nr_unroll=batch:16,remat:none,unroll:0
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rt_floor(iters=10):
    f = jax.jit(lambda x: x + 1)
    y = f(jnp.ones((8, 128), jnp.float32))
    _ = float(y[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(y)
            _ = float(y[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_variant(spec, floor, iters=12, warmup=2):
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import init_state, make_optimizer, make_train_step

    batch = int(spec.get("batch", 16))
    model = MMVit4(
        dtype=jnp.bfloat16,
        use_pallas=spec.get("pallas", "1") == "1",
        depth_mode=spec.get("depth", "pruned"),
        remat_mode=spec.get("remat", "all"),
        scan_unroll=int(spec.get("unroll", 1)),
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch, 3, 3, 224, 224)).astype(np.float32)
    )
    masks = jnp.asarray(
        (rng.random((batch, 3, 1, 224, 224)) > 0.7).astype(np.float32)
    )
    valid = jnp.ones((batch,), jnp.float32)

    optimizer = make_optimizer("Adam")
    t0 = time.perf_counter()
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    jax.block_until_ready(state.params)
    t_init = time.perf_counter() - t0

    train_step = make_train_step(model, optimizer)
    # rng:rbg — dropout bits from the TPU hardware PRNG (RngBitGenerator)
    # instead of software threefry (the default key impl)
    key = jax.random.key(1, impl=spec.get("rng", "threefry2x32"))
    t0 = time.perf_counter()
    state, metrics = train_step(state, images, masks, valid, 1e-4, key)
    loss0 = float(metrics["loss"])
    t_compile = time.perf_counter() - t0

    for _ in range(warmup):
        state, metrics = train_step(state, images, masks, valid, 1e-4, key)
        _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, images, masks, valid, 1e-4, key)
        _ = float(metrics["loss"])
    total = time.perf_counter() - t0
    compute = max(total - iters * floor, 1e-9)
    step_ms = compute / iters * 1e3
    return {
        "init_s": round(t_init, 1),
        "compile_s": round(t_compile, 1),
        "step_ms": round(step_ms, 1),
        "patches_per_sec": round(batch * iters / compute, 2),
        "loss0": round(loss0, 4),
    }


def main():
    out_path = sys.argv[1]
    variants = []
    for arg in sys.argv[2:]:
        name, _, kvs = arg.partition("=")
        spec = dict(kv.split(":") for kv in kvs.split(",") if kv)
        variants.append((name, spec))

    floor = rt_floor()
    print(f"# rt floor {floor * 1e3:.1f} ms", flush=True)
    with open(out_path, "a") as f:
        for name, spec in variants:
            try:
                res = run_variant(spec, floor)
            except Exception as e:  # noqa: BLE001
                res = {"error": f"{type(e).__name__}: {e}"[:300]}
            rec = {"variant": name, **spec, **res}
            line = json.dumps(rec)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()


if __name__ == "__main__":
    main()
