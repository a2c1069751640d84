"""Compile-only memory profile of the MMVit4 train step.

``jax.jit(...).lower(...).compile().memory_analysis()`` reports the
compiler's buffer assignment (argument/output/temp/alias bytes) for the
TARGET backend without executing — the only way to see TPU peak memory on
this box (the tunnel backend reports no runtime memory_stats; the round-4
resident-dataset OOM was diagnosed blind, NOTES).

Usage:
    python scripts/memprofile_step.py [B ...]           # default 4 8
    MEMPROF_DREMAT=1 python scripts/memprofile_step.py  # decoder remat on
    MEMPROF_DEPTH=pruned ...                            # depth mode

Prints one line per config: arg/out/temp/total GB.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def profile(batch, dremat, depth, lean):
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import (
        default_dropout_key, init_state, make_optimizer,
    )
    from corrifnet_tpu.train.state import _train_step_fn

    model = MMVit4(
        dtype=jnp.bfloat16, use_pallas=True, depth_mode=depth,
        decoder_remat=dremat, decoder_lean=lean,
        decoder_chunk=int(os.environ.get("MEMPROF_CHUNK", "0")),
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch, 3, 3, 224, 224)).astype(np.float32))
    masks = jnp.ones((batch, 3, 1, 224, 224), jnp.float32)
    valid = jnp.ones((batch,), jnp.float32)
    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    step = jax.jit(_train_step_fn(model, optimizer), donate_argnums=(0,))
    lowered = step.lower(
        state, images, masks, valid, 1e-4, default_dropout_key(1))
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    g = 1 / 1e9
    print(
        f"B={batch} depth={depth} dremat={int(dremat)} lean={lean}: "
        f"args {m.argument_size_in_bytes * g:.2f} GB, "
        f"out {m.output_size_in_bytes * g:.2f} GB, "
        f"temp {m.temp_size_in_bytes * g:.2f} GB, "
        f"alias {m.alias_size_in_bytes * g:.2f} GB, "
        f"peak(args+out+temp-alias) "
        f"{(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes - m.alias_size_in_bytes) * g:.2f} GB",
        flush=True,
    )


def main():
    batches = [int(a) for a in sys.argv[1:]] or [4, 8]
    dremat = os.environ.get("MEMPROF_DREMAT", "0") == "1"
    depth = os.environ.get("MEMPROF_DEPTH", "full")
    lean = {"1": True, "0": False}.get(os.environ.get("MEMPROF_LEAN", "auto"))
    print(f"backend: {jax.default_backend()}", flush=True)
    for b in batches:
        profile(b, dremat, depth, lean)


if __name__ == "__main__":
    main()
