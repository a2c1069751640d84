"""Aggregate a jax.profiler device trace by model region (tf_op path).

Usage: python scripts/trace_regions.py [trace_dir] [n_steps]
Buckets XLA-op device time by recognizable segments of the tf_op
annotation (packed_stage1, encoders/layerN, decoder, transformer ...)
split by forward vs backward (transpose(jvp(...))).
"""
import collections
import glob
import gzip
import json
import re
import sys

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-step"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)

op_pids, op_tids = set(), set()
for ev in trace["traceEvents"]:
    if ev.get("ph") != "M":
        continue
    if "XLA Ops" not in ev.get("args", {}).get("name", ""):
        continue
    if ev.get("name") == "process_name":
        op_pids.add(ev["pid"])
    elif ev.get("name") == "thread_name":
        op_tids.add((ev["pid"], ev["tid"]))


def region(tf_op):
    if not tf_op:
        return "(untagged)"
    bwd = "transpose(jvp" in tf_op
    seg = "?"
    m = re.search(
        r"(packed_stage1/(?:stem_conv|stem_bn|layer1_\w+|[\w]+)"
        r"|encoders/layer\d+|encoders/(?:stem_\w+|adapt\d|conv6)"
        r"|decoder/\w+|multimodal_transformer|modality_stream"
        r"|fusion\d|correlation|loss|adam|opt)", tf_op)
    if m:
        seg = m.group(1)
        seg = re.sub(r"packed_stage1/.*", lambda mm: mm.group(0).split("/")[0] + "/" + mm.group(0).split("/")[1], seg)
    else:
        parts = tf_op.split("/")
        seg = "/".join(parts[1:3]) if len(parts) > 2 else tf_op[:40]
    return ("bwd " if bwd else "fwd ") + seg


by_region = collections.Counter()
total = 0.0
for ev in trace["traceEvents"]:
    if ev.get("ph") == "X" and (
        ev.get("pid") in op_pids or (ev.get("pid"), ev.get("tid")) in op_tids
    ):
        dur = ev.get("dur", 0) / 1e3
        name = ev.get("name", "")
        if name.startswith("while"):  # bodies double-count; skip wrapper
            continue
        by_region[region(ev.get("args", {}).get("tf_op"))] += dur
        total += dur

print(f"total {total / n_steps:.1f} ms/step")
group = collections.Counter()
for k, v in by_region.items():
    base = k.split(" ", 1)[1] if " " in k else k
    base = re.sub(r"packed_stage1/layer1_\w+", "packed_stage1/layer1", base)
    group[base] += v
print("\n== by region (fwd+bwd) ==")
for k, v in group.most_common(30):
    print(f"{v / n_steps:8.2f} ms {100 * v / total:5.1f}%  {k}")
print("\n== fwd/bwd split (top 30) ==")
for k, v in by_region.most_common(30):
    print(f"{v / n_steps:8.2f} ms {100 * v / total:5.1f}%  {k}")
