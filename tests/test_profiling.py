"""Profiling utilities: memory stats and trace context (SURVEY §5.1)."""

import jax
import jax.numpy as jnp

from corrifnet_tpu.utils.profiling import (
    device_memory_stats,
    live_array_bytes,
    trace,
)


def test_live_array_bytes_counts_allocations():
    before = live_array_bytes()
    x = jnp.ones((512, 512), jnp.float32)
    x.block_until_ready()
    after = live_array_bytes()
    assert after - before >= 512 * 512 * 4
    del x


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on backends without stats


def test_trace_context(tmp_path):
    with trace(str(tmp_path / "t")):
        y = jnp.arange(16.0).sum()
        y.block_until_ready()
    # no exception = pass; trace dir creation is backend-dependent


def test_profile_cli_memory_flag():
    """--memory adds the train-step buffer-assignment peak (run/profile.py
    train_step_memory — the only memory oracle on tunneled backends)."""
    from corrifnet_tpu.run.profile import main

    r = main(["ENet", "--memory", "--lim", "32", "--batch-size", "2"])
    mem = r["train_step_memory"]
    assert mem["peak_bytes"] > 0
    assert mem["peak_bytes"] == (mem["argument_bytes"] + mem["output_bytes"]
                                 + mem["temp_bytes"] - mem["alias_bytes"])
    assert r["train_peak_str"].endswith("B")
