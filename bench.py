"""Benchmark: MMVit4 (CorrIFNet) end-to-end training throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

Metric: 224x224 multispectral patches/sec through the full jitted train step
(fwd + bwd + Adam update) in bf16 with the Pallas correlation kernel and the
FULL-DEPTH decoder — the parity default (PARITY.md: the depth-mode
equivalence matrix showed pruned-mode InstanceNorm stats train materially
worse, so 'full' is the mode the model ships with and the mode this
headline measures since round 5). ``vs_baseline`` is measured against the
BASELINE.json target of 2,000 patches/sec/chip (the reference itself
publishes no throughput numbers — its fpsfile.txt slot is empty,
F7_TEST2.py:135). ``mfu`` divides the achieved FLOP rate (step FLOPs from
XLA ``cost_analysis()`` on the compiled step, falling back to a measured
constant) by the v5e peak ~197 bf16 TFLOP/s. A ``pruned`` field keeps the
depth-pruned fast-inference mode as a cross-round continuity row (it was
the headline through round 4).

Measurement notes: chains of 10 REAL optimizer steps run inside one jitted
``lax.scan`` dispatch (``make_train_multi_step``), each chain synchronized
by fetching the final loss scalar to the host — ``block_until_ready`` alone
is NOT trustworthy on tunneled/remote TPU backends (observed on the axon
tunnel: it returns at enqueue, inflating throughput ~100x). The per-dispatch
host round-trip floor (measured with a trivial jitted op, ~0.1 ms on a local
TPU, ~40 ms through a tunnel) is subtracted; chaining amortizes any residual
per-dispatch transport cost over 10 steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TARGET = 2000.0  # patches/sec/chip (BASELINE.json)
V5E_PEAK_FLOPS = 1.97e14  # bf16 peak, one v5e chip (BASELINE.md)
# Fallback per-patch step FLOPs when the in-run cost_analysis compile is
# skipped (deadline) or fails: measured via _step_flops on the compiled
# full-depth / pruned train step (fwd+bwd+Adam, B=8).
FALLBACK_FLOPS_PER_PATCH = {"full": 6.5e11, "pruned": 2.6e11}


def measure_roundtrip_floor(iters=10):
    """Per-step host-fetch latency floor with a trivial jitted op."""
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


def bench_train_step(batch_size=8, chain=10, iters=3, rt_floor=0.0,
                     scan_unroll=1, remat_mode="all", fusebn=False,
                     fusedblk=False):
    """Throughput via make_train_multi_step: ``chain`` real optimizer steps
    run in ONE device dispatch (lax.scan), synced by a loss fetch — the
    per-dispatch tunnel overhead is paid once per ``chain`` steps instead
    of once per step, so the number tracks device compute."""
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import (
        default_dropout_key, init_state, make_optimizer, make_train_multi_step,
    )

    model = MMVit4(
        dtype=jnp.bfloat16, use_pallas=True,
        depth_mode=os.environ.get("BENCH_DEPTH", "full"),
        scan_unroll=scan_unroll,
        remat_mode=remat_mode,
        decoder_remat=os.environ.get("BENCH_DREMAT", "0") == "1",
        fuse_expand_bn=fusebn or os.environ.get("BENCH_FUSEBN", "0") == "1",
        pallas_fused_blocks=(
            fusedblk or os.environ.get("BENCH_FUSEDBLK", "0") == "1"
        ),
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch_size, 3, 3, 224, 224)).astype(np.float32)
    )
    masks = jnp.asarray(
        (rng.random((batch_size, 3, 1, 224, 224)) > 0.7).astype(np.float32)
    )

    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    multi = make_train_multi_step(
        model, optimizer,
        # default OFF since round 4 (matches config.py: the CLI path's
        # canary falls back anyway and the win was ~2-3%, mood-dependent)
        auto_layout=os.environ.get("BENCH_AUTO_LAYOUT", "0") == "1",
    )
    imgs_k = jnp.broadcast_to(images[None], (chain, *images.shape))
    masks_k = jnp.broadcast_to(masks[None], (chain, *masks.shape))
    valid_k = jnp.ones((chain, batch_size), jnp.float32)
    key = default_dropout_key(1)

    state, ms = multi(state, imgs_k, masks_k, valid_k, 1e-4, key)  # compile
    _ = float(ms["loss"][-1])

    # One-deep pipeline (matches train/loop.py): dispatch chain i, then
    # fetch chain i-1's loss — the device computes during the host round
    # trip. Every chain is still synced by a host value fetch; only the
    # FINAL fetch's round trip is unoverlapped, so subtract rt_floor once.
    t0 = time.perf_counter()
    prev = None
    for _ in range(iters):
        state, ms = multi(state, imgs_k, masks_k, valid_k, 1e-4, key)
        if prev is not None:
            _ = float(prev["loss"][-1])
        prev = ms
    _ = float(prev["loss"][-1])
    total = time.perf_counter() - t0
    compute = max(total - rt_floor, 1e-9)
    return batch_size * chain * iters / compute


def _tpu_ready(timeout_s=240):
    """Probe backend init in a side thread: through the axon tunnel a down
    service can HANG jax.devices() rather than raise."""
    import threading

    ok = []

    def probe():
        try:
            ok.append(len(jax.devices()) > 0)
        except Exception as e:  # noqa: BLE001
            print(f"# backend init failed: {type(e).__name__}", file=sys.stderr)
            ok.append(False)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok and ok[0])


def _run_oneconf():
    """Child mode (BENCH_ONECONF="b,unroll,remat,fusebn,fusedblk"): measure
    one configuration and print its value on a parseable line. Keeps the
    experimental lever configs (Pallas fused-block kernels, remat variants —
    numerics-tested but not yet hardware-timed) from taking down the parent
    if one hits a compiler/runtime fault."""
    b, unroll, remat, fusebn, fusedblk = os.environ["BENCH_ONECONF"].split(",")
    rt_floor = measure_roundtrip_floor()
    v = bench_train_step(
        batch_size=int(b), rt_floor=rt_floor, scan_unroll=int(unroll),
        remat_mode=remat, fusebn=fusebn == "1", fusedblk=fusedblk == "1",
    )
    print(f"ONECONF_RESULT {v:.4f}", flush=True)


def _probe_levers(batch, best_base, deadline):
    """Try the built-but-default-off perf levers in subprocesses (on the
    same FULL-depth mode the headline measures); returns the best measured
    value. Hardware-REJECTED levers (fusedblk, fusebn — both measured
    slower than XLA on v5e, NOTES round-3 lever table) are deliberately
    absent: re-probing them burned the r4 budget that remat:mid never got.
    """
    import subprocess

    if os.environ.get("BENCH_AUTOTUNE", "1") == "0":
        return best_base
    # (label, remat, extra_env)
    combos = [
        ("layout:on", "all", {"BENCH_AUTO_LAYOUT": "1"}),
        ("remat:mid", "mid", {}),
        ("dremat:on", "all", {"BENCH_DREMAT": "1"}),
    ]
    best = best_base
    for label, remat, extra in combos:
        left = deadline - time.monotonic()
        if left < 120:
            print(f"# bench deadline reached before lever {label}",
                  file=sys.stderr)
            break
        env = dict(os.environ)
        env["BENCH_ONECONF"] = f"{batch},0,{remat},0,0"
        env.update(extra)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True,
                timeout=min(900, left), env=env,
            )
            v = 0.0
            for line in out.stdout.splitlines():
                if line.startswith("ONECONF_RESULT "):
                    v = float(line.split()[1])
            if v:
                print(f"# lever {label}: {v:.2f}", file=sys.stderr)
            else:
                # surface the child's failure — the stderr tail is the only
                # diagnostic artifact (round-2's fusedblk rc=1 was a scoped
                # VMEM overflow nobody could see)
                print(f"# lever {label} failed (rc={out.returncode})",
                      file=sys.stderr)
                for ln in out.stderr.splitlines()[-15:]:
                    print(f"#   {label}| {ln}", file=sys.stderr)
            best = max(best, v)
        except subprocess.TimeoutExpired:
            print(f"# lever {label} timed out", file=sys.stderr)
    return best


def _step_flops_per_patch(batch_size, depth):
    """Per-patch FLOPs of the single train step (fwd+bwd+Adam) from XLA's
    own ``cost_analysis()`` on the lowered+compiled step — the honest
    denominator for MFU (through round 4 the full-depth MFU wrongly
    divided by the PRUNED program's speed-of-light, VERDICT r4)."""
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import init_state, make_optimizer
    from corrifnet_tpu.train.state import _train_step_fn

    model = MMVit4(dtype=jnp.bfloat16, use_pallas=True, depth_mode=depth)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch_size, 3, 3, 224, 224)).astype(np.float32))
    masks = jnp.zeros((batch_size, 3, 1, 224, 224), jnp.float32)
    valid = jnp.ones((batch_size,), jnp.float32)
    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    step = _train_step_fn(model, optimizer)
    compiled = jax.jit(step).lower(
        state, images, masks, valid, 1e-4, jax.random.PRNGKey(1)
    ).compile()
    flops = float(compiled.cost_analysis()["flops"])
    return flops / batch_size


def _emit(value, pruned_value, flops_per_patch):
    """Print the result JSON line NOW (the driver parses the LAST JSON
    line, so each improvement re-emits — a timeout mid-probe still leaves
    a valid number on stdout; r3's bench died with zero output).

    ``value`` is the FULL-depth (parity-mode) throughput — the headline
    since round 5; ``pruned`` is the fast-inference continuity row."""
    out = {
        "metric": "mmvit4_train_patches_per_sec",
        "value": round(value, 2),
        "unit": "224x224 patches/sec/chip",
        "mode": "full_depth",
        "vs_baseline": round(value / BASELINE_TARGET, 4),
        "mfu": round(value * flops_per_patch / V5E_PEAK_FLOPS, 4),
    }
    if pruned_value:
        out["pruned"] = round(pruned_value, 2)
        out["pruned_mfu"] = round(
            pruned_value * FALLBACK_FLOPS_PER_PATCH["pruned"]
            / V5E_PEAK_FLOPS, 4)
    print(json.dumps(out), flush=True)


def _wait_for_free_chip():
    """If a training run holds device residency, wait (bounded) for it.

    Two concurrent TPU sessions OOM the chip and it is usually the
    TRAINING process that dies (CLAUDE.md) — benching over a live
    reference-protocol rehearsal would kill hours of background training
    for a number measured on a contended chip anyway. Poll until the
    run.main process exits or the budget (BENCH_WAIT_TRAINING_S, default
    35 min) runs out, then proceed either way.
    """
    import subprocess

    budget = float(os.environ.get("BENCH_WAIT_TRAINING_S", "2100"))
    t0 = time.monotonic()
    while time.monotonic() - t0 < budget:
        try:
            out = subprocess.run(
                ["ps", "-eo", "args"], capture_output=True, text=True,
                timeout=20,
            ).stdout
        except Exception:
            break
        if "corrifnet_tpu.run.main" not in out:
            if time.monotonic() - t0 > 1:
                print("# training run finished; chip free", file=sys.stderr)
            return
        print("# live training run holds the chip; waiting 60 s "
              f"({int(budget - (time.monotonic() - t0))} s left)",
              file=sys.stderr)
        time.sleep(60)


def main():
    if os.environ.get("BENCH_ONECONF"):
        _run_oneconf()
        return
    _wait_for_free_chip()
    # Hard wall for the whole run: every subprocess probe is gated on the
    # remaining budget, and the JSON line is (re-)emitted after each stage,
    # so the bench cannot end with nothing parseable.
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_DEADLINE_S", "1680"))
    # The tunnel has transient outages; a failed/hung init is sticky within
    # the process, so retry by re-exec'ing (bounded by BENCH_INIT_RETRIES).
    if not _tpu_ready():
        left = int(os.environ.get("BENCH_INIT_RETRIES", "3"))
        if left <= 0:
            raise RuntimeError("TPU backend unavailable after retries")
        print(f"# TPU not ready; re-exec in 180 s ({left} retries left)",
              file=sys.stderr)
        time.sleep(180)
        os.environ["BENCH_INIT_RETRIES"] = str(left - 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    rt_floor = measure_roundtrip_floor()
    print(f"# round-trip floor: {rt_floor * 1e3:.1f} ms", file=sys.stderr)

    batch = int(os.environ.get("BENCH_BATCH", "0"))
    # Full-depth (parity) headline at B=8: the compile-time buffer ladder
    # (NOTES round-4, scripts/memprofile_step.py) put B=16 full depth at
    # 16.6 GB peak > the chip; revisit the batch list when the decoder
    # backward segmentation moves it. (batch, encoder scan_unroll):
    # unroll=0 measured ~3% faster on device but is a larger program.
    configs = [(batch, 1), (batch, 0)] if batch else [(8, 1), (8, 0)]
    value = 0.0
    for b, unroll in configs:
        if value and time.monotonic() > deadline - 300:
            print("# bench deadline: skipping remaining base configs",
                  file=sys.stderr)
            break
        try:
            v = bench_train_step(batch_size=b, rt_floor=rt_floor,
                                 scan_unroll=unroll)
            print(f"# batch {b} unroll {unroll}: {v:.2f}", file=sys.stderr)
            value = max(value, v)
        except Exception as e:  # noqa: BLE001 — e.g. OOM at larger sizes
            print(f"# batch {b} unroll {unroll} failed: {type(e).__name__}:"
                  f" {str(e).splitlines()[0][:160] if str(e) else ''}",
                  file=sys.stderr)
            if b >= 16 and os.environ.get("CORRIFNET_ATTN_LSE", "1") != "0":
                # the packed-LSE attention residual pushes the B>=16 program
                # past the remote compile helper (NOTES.md); retry with the
                # recompute backward in a subprocess (compiler faults can be
                # sticky in-process)
                print(f"# retrying batch {b} with CORRIFNET_ATTN_LSE=0",
                      file=sys.stderr)
                import subprocess
                env = dict(os.environ)
                env["CORRIFNET_ATTN_LSE"] = "0"
                env["BENCH_ONECONF"] = f"{b},{unroll},all,0,0"
                try:
                    out = subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        capture_output=True, text=True, timeout=900, env=env,
                    )
                    v = 0.0
                    for line in out.stdout.splitlines():
                        if line.startswith("ONECONF_RESULT "):
                            v = float(line.split()[1])
                    if v:
                        print(f"# batch {b} unroll {unroll} (lse=0): {v:.2f}",
                              file=sys.stderr)
                        value = max(value, v)
                    else:
                        for ln in out.stderr.splitlines()[-8:]:
                            print(f"#   lse0| {ln}", file=sys.stderr)
                except subprocess.TimeoutExpired:
                    print(f"# batch {b} lse=0 retry timed out", file=sys.stderr)
    if value == 0.0:
        raise RuntimeError("all benchmark batch sizes failed")
    depth = os.environ.get("BENCH_DEPTH", "full")
    flops_pp = FALLBACK_FLOPS_PER_PATCH.get(depth, FALLBACK_FLOPS_PER_PATCH["full"])
    _emit(value, 0.0, flops_pp)  # a valid line exists from here on

    # Honest MFU denominator: cost_analysis on the compiled single step
    # (one extra, service-cached compile). Gated on remaining budget.
    if deadline - time.monotonic() > 420:
        try:
            flops_pp = _step_flops_per_patch(batch or 8, depth)
            print(f"# step flops/patch ({depth}): {flops_pp:.3e}",
                  file=sys.stderr)
            _emit(value, 0.0, flops_pp)
        except Exception as e:  # noqa: BLE001 — fall back to the constant
            print(f"# cost_analysis failed: {type(e).__name__}",
                  file=sys.stderr)

    # pruned continuity row (the pre-r5 headline), then the lever probes;
    # re-emit after each improvement.
    pruned_value = 0.0
    try:
        pruned_value = _measure_pruned(batch or 8, deadline)
    except Exception as e:  # noqa: BLE001 — the row must never sink the run
        print(f"# pruned row failed: {type(e).__name__}", file=sys.stderr)
    if pruned_value:
        _emit(value, pruned_value, flops_pp)
    try:
        lever_best = _probe_levers(batch or 8, value, deadline)
    except Exception as e:  # noqa: BLE001 — autotune must never sink the run
        print(f"# lever autotune failed: {type(e).__name__}", file=sys.stderr)
        lever_best = value
    if lever_best > value:
        value = lever_best
        _emit(value, pruned_value, flops_pp)


def _measure_pruned(batch, deadline):
    """Continuity row: depth_mode='pruned' — the fast-inference/benchmark
    mode that was the headline through round 4 (PARITY.md bans it for
    training; kept as one field so cross-round numbers stay comparable)."""
    import subprocess

    if os.environ.get("BENCH_PRUNED_ROW", "1") == "0":
        return 0.0
    left = deadline - time.monotonic()
    if left < 120:
        print("# bench deadline reached before pruned row", file=sys.stderr)
        return 0.0
    env = dict(os.environ)
    env["BENCH_DEPTH"] = "pruned"
    env["BENCH_ONECONF"] = f"{batch},0,all,0,0"
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True,
            timeout=min(1200, left), env=env,
        )
    except subprocess.TimeoutExpired:
        print(f"# depth:pruned b={batch} timed out", file=sys.stderr)
        return 0.0
    v = 0.0
    for line in out.stdout.splitlines():
        if line.startswith("ONECONF_RESULT "):
            v = float(line.split()[1])
            print(f"# depth:pruned b={batch}: {v:.2f}", file=sys.stderr)
    if not v:
        print(f"# depth:pruned b={batch} failed (rc={out.returncode})",
              file=sys.stderr)
        for ln in out.stderr.splitlines()[-15:]:
            print(f"#   pruned| {ln}", file=sys.stderr)
    return v


if __name__ == "__main__":
    main()
