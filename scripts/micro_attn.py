"""Microbench the fused attention kernels at the model's two shapes,
with/without dropout, fwd and fwd+bwd — device-profiler timed (axon wall
times lie). Identifies whether the in-kernel PRNG dominates."""

import collections
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from corrifnet_tpu.ops import fused_attention


def timed(tag, fn, *args):
    out = fn(*args)
    jax.tree.map(lambda t: t.block_until_ready(), out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    trace_dir = f"/tmp/jax-trace-attn/{tag}"
    import os, shutil
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    jax.profiler.stop_trace()
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pids, tids = set(), set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        if "XLA Ops" not in ev.get("args", {}).get("name", ""):
            continue
        if ev.get("name") == "process_name":
            pids.add(ev["pid"])
        elif ev.get("name") == "thread_name":
            tids.add((ev["pid"], ev["tid"]))
    total = 0.0
    kinds = collections.Counter()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and (
            ev.get("pid") in pids or (ev.get("pid"), ev.get("tid")) in tids
        ):
            total += ev.get("dur", 0) / 1e3
            kinds[ev.get("name", "?").split(".")[0]] += ev.get("dur", 0) / 1e3
    top = ", ".join(f"{k}:{v / 3:.2f}" for k, v in kinds.most_common(4))
    print(f"{tag:28s} {total / 3:7.3f} ms/step   [{top}]")


def main():
    for (bh, n, d) in [(64, 2048, 64), (24, 512, 64)]:
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(rng.standard_normal((bh // 8, 8, n, d)), jnp.bfloat16)
            for _ in range(3)
        )
        scale = d ** -0.5
        key = jax.random.PRNGKey(0)

        for rate in (0.0, 0.1):
            f = jax.jit(
                lambda q, k, v, rate=rate: fused_attention(
                    q, k, v, scale, dropout_rate=rate,
                    rng=key if rate else None,
                )
            )
            timed(f"fwd n={n} rate={rate}", f, q, k, v)

            g = jax.jit(
                jax.grad(
                    lambda q, k, v, rate=rate: fused_attention(
                        q, k, v, scale, dropout_rate=rate,
                        rng=key if rate else None,
                    ).astype(jnp.float32).sum(),
                    argnums=(0, 1, 2),
                )
            )
            timed(f"fwd+bwd n={n} rate={rate}", g, q, k, v)


if __name__ == "__main__":
    main()
