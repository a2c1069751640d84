"""Compile-only memory profile of the DECODER fwd+bwd in isolation.

The full-step ladder (memprofile_step.py) showed the lean rewrite moving
the B=4 peak by ~0.9 GB but B>=8 barely — this isolates the decoder
segment to see whether its own working set shrank (residual bookkeeping)
or the binding constraint is backward-transient scheduling.

Usage: python scripts/memprofile_decoder.py [B ...]   # default 8 16
  MEMPROF_LEAN=0|1 (default both)
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def profile(batch, lean):
    from corrifnet_tpu.models.decoder import DecoderFuse

    dec = DecoderFuse(depth_mode="full", lean=lean, dtype=jnp.bfloat16,
                      use_pallas_epilogue=True,
                      c2_chunks=int(os.environ.get("MEMPROF_CHUNK", "0")))
    rng = np.random.default_rng(0)
    b = batch
    shapes = [(b, 3, 56, 56, 24), (b, 3, 56, 56, 48), (b, 3, 28, 28, 96),
              (b, 3, 14, 14, 192), (b, 8, 8, 8, 192)]
    args = [jnp.asarray(rng.normal(0, 1, s).astype(np.float32))
            for s in shapes]
    v = jax.eval_shape(
        lambda: DecoderFuse(depth_mode="full", lean=False).init(
            jax.random.PRNGKey(0), *args, False))
    # real params (init on CPU would be slow at this width; use zeros with
    # the right tree — memory analysis only needs shapes)
    v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)

    def loss(params, *xs):
        out = dec.apply(params, *xs, True)
        return (out.astype(jnp.float32) ** 2).mean()

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
    compiled = g.lower(v, *args).compile()
    m = compiled.memory_analysis()
    s = 1 / 1e9
    print(
        f"decoder-only B={batch} lean={int(lean)}: "
        f"args {m.argument_size_in_bytes * s:.2f} GB, "
        f"temp {m.temp_size_in_bytes * s:.2f} GB, "
        f"peak {(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes - m.alias_size_in_bytes) * s:.2f} GB",
        flush=True,
    )


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    want = os.environ.get("MEMPROF_LEAN")
    leans = [want == "1"] if want in ("0", "1") else [False, True]
    print(f"backend: {jax.default_backend()}", flush=True)
    for b in batches:
        for lean in leans:
            profile(b, lean)


if __name__ == "__main__":
    main()
