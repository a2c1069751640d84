"""Probe: XLA auto layouts for the donated train state.

The unrolled-trace region map (NOTES.md) shows ~8 ms/step of untagged
parameter-gradient layout copies: conv-kernel grads leave the conv
backward in conv-preferred layout and are re-laid-out to the default
row-major param layout before the Adam update (and the params relaid the
other way before each conv). With ``Format(Layout.AUTO)`` on the state
argument AND result, XLA picks the layout; since the state round-trips
donated through the step, the conv-preferred layout persists and the
boundary copies should disappear.

Usage: python scripts/layout_probe.py [batch] [chain] [size]
Prints ms/step for default vs auto layouts (chained-dispatch timing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

_LR = None  # set in main (array, so the AOT-compiled executable accepts it)


def build(batch, size):
    from corrifnet_tpu.models.mmvit4 import MMVit4
    from corrifnet_tpu.train import init_state, make_optimizer
    from corrifnet_tpu.train.state import _train_step_fn

    model = MMVit4(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (batch, 3, 3, size, size)).astype(np.float32))
    # the model upsamples output to a fixed 224 (up_to_224 parity quirk)
    masks = jnp.asarray(
        (rng.random((batch, 3, 1, 224, 224)) > 0.7).astype(np.float32))
    valid = jnp.ones((batch,), jnp.float32)
    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    step = _train_step_fn(model, optimizer)
    key = jax.random.PRNGKey(1)

    def multi(state, images, masks, valid, lr, rng, chain):
        def body(st, i):
            st, m = step(st, images, masks, valid, lr, jax.random.fold_in(rng, i))
            return st, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(chain))

    return multi, state, (images, masks, valid), key


def timeit(fn, state, args, key, chain, iters=3, floor=0.0):
    images, masks, valid = args
    state, losses = fn(state, images, masks, valid, _LR, key)
    _ = float(losses[-1])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        state, losses = fn(state, images, masks, valid, _LR, key)
        _ = float(losses[-1])
        best = min(best, time.perf_counter() - t0 - floor)
    return best / chain


def main():
    global _LR
    _LR = jnp.asarray(1e-4, jnp.float32)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 224
    multi, state, args, key = build(batch, size)

    f = jax.jit(lambda x: x + 1)
    y = f(jnp.ones((8, 128), jnp.float32))
    _ = float(y[0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        y = f(y)
        _ = float(y[0, 0])
    floor = (time.perf_counter() - t0) / 5

    import functools
    mk = functools.partial(multi, chain=chain)

    # the timed fns donate the state; keep a host snapshot to rebuild from
    state_host = jax.tree.map(np.asarray, state)

    base = jax.jit(mk, donate_argnums=(0,))
    ms = timeit(base, state, args, key, chain, floor=floor) * 1e3
    print(f"default layouts: {ms:8.2f} ms/step")

    auto_tree = jax.tree.map(lambda _: Format(Layout.AUTO), state_host)
    j = jax.jit(
        mk, donate_argnums=(0,),
        in_shardings=(auto_tree, None, None, None, None, None),
        out_shardings=(auto_tree, None),
    )
    compiled = j.lower(state_host, *args, _LR, key).compile()
    in_fmt = compiled.input_formats[0][0]
    # move the state into the compiler-chosen layouts once, outside the
    # timed region (the step then preserves them: out == in formats)
    state2 = jax.tree.map(jax.device_put, state_host, in_fmt)
    ms = timeit(compiled, state2, args, key, chain, floor=floor) * 1e3
    print(f"auto layouts:    {ms:8.2f} ms/step")

    n_nondefault = 0
    for leaf in jax.tree.leaves(in_fmt):
        mm = leaf.layout.major_to_minor
        if tuple(mm) != tuple(range(len(mm))):
            n_nondefault += 1
    print(f"# leaves with non-default major_to_minor: {n_nondefault}")


if __name__ == "__main__":
    main()
