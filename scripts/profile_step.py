"""Device-trace the MMVit4 train step and print a per-op time breakdown.

Captures a jax.profiler trace of a few train steps (the only trustworthy
perf signal through the axon tunnel — see CLAUDE.md), parses the
trace.json.gz, and aggregates "XLA Ops" durations by op kind/name.

Usage: python scripts/profile_step.py [batch] [key:val,...]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch, spec):
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import init_state, make_optimizer, make_train_step

    model = MMVit4(
        dtype=jnp.bfloat16,
        use_pallas=spec.get("pallas", "1") == "1",
        depth_mode=spec.get("depth", "pruned"),
        remat_mode=spec.get("remat", "all"),
        scan_unroll=int(spec.get("unroll", 1)),
        fuse_expand_bn=spec.get("fusebn", "0") == "1",
        pallas_fused_blocks=spec.get("fusedblk", "0") == "1",
        decoder_remat=spec.get("dremat", "0") == "1",
        decoder_lean={"1": True, "0": False}.get(spec.get("lean", "auto")),
        decoder_chunk=int(spec.get("chunk", 0)),
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (batch, 3, 3, 224, 224)).astype(np.float32))
    masks = jnp.asarray((rng.random((batch, 3, 1, 224, 224)) > 0.7).astype(np.float32))
    valid = jnp.ones((batch,), jnp.float32)
    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    step = make_train_step(
        model, optimizer, auto_layout=spec.get("autolayout", "0") == "1"
    )
    key = jax.random.key(1, impl=spec.get("rng", "threefry2x32"))
    return step, state, (images, masks, valid), key


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spec = {}
    if len(sys.argv) > 2:
        spec = dict(kv.split(":") for kv in sys.argv[2].split(",") if kv)
    step, state, (images, masks, valid), key = build(batch, spec)

    for _ in range(3):  # compile + warm
        state, m = step(state, images, masks, valid, 1e-4, key)
        _ = float(m["loss"])

    trace_dir = "/tmp/jax-trace-step"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step(state, images, masks, valid, 1e-4, key)
        _ = float(m["loss"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    # "XLA Ops" may be a process track (older format) or a thread under the
    # TPU device process (current axon attach) — accept either.
    op_pids, op_tids = set(), set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        track = ev.get("args", {}).get("name", "")
        if "XLA Ops" not in track:
            continue
        if ev.get("name") == "process_name":
            op_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name":
            op_tids.add((ev["pid"], ev["tid"]))

    by_name = collections.Counter()
    by_kind = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and (
            ev.get("pid") in op_pids or (ev.get("pid"), ev.get("tid")) in op_tids
        ):
            dur = ev.get("dur", 0) / 1e3  # ms
            name = ev.get("name", "?")
            by_name[name] += dur
            kind = re.sub(r"[.\d]+$", "", name.split("(")[0])
            by_kind[kind] += dur
            total += dur

    n_steps = 3
    print(f"total device op time: {total / n_steps:.1f} ms/step (over {n_steps} steps)")
    print("\n== by kind ==")
    for k, v in by_kind.most_common(25):
        print(f"{v / n_steps:9.2f} ms  {100 * v / total:5.1f}%  {k}")
    print("\n== top ops ==")
    for k, v in by_name.most_common(40):
        print(f"{v / n_steps:9.2f} ms  {100 * v / total:5.1f}%  {k[:140]}")


if __name__ == "__main__":
    main()
