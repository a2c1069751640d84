"""Microbench: one layer1-shaped bottleneck block fwd+bwd, three modality
strategies. Isolates whether the per-modality vmap (grouped-conv lowering)
is what holds the encoder at ~12% MFU.

  vmap   — jax.vmap over the modality axis with per-modality weights
           (what flax nn.vmap produces in the real encoders)
  loop   — Python loop over the 3 modalities, plain convs, results stacked
  shared — modalities merged into batch, one weight set (upper bound)

Timing: K dependent block-grad steps chained inside ONE jitted lax.scan
(single dispatch — immune to the axon tunnel's enqueue-returns-early lie),
synced by a host fetch; per-step time = (t_chain - t_empty) / K.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

G, B, H, W, CIN, CMID = 3, 24, 56, 56, 256, 64
K_STEPS = 30


import os
STATS = os.environ.get("MB_STATS", "1") == "1"


def _post(y, res=None):
    c = y.shape[-1]
    if STATS:
        s1 = y.astype(jnp.float32).sum((0, 1, 2))
        q1 = (y.astype(jnp.float32) ** 2).sum((0, 1, 2))
        a = jax.lax.rsqrt(q1 / y.size * c - (s1 / y.size * c) ** 2 + 1e-5)
        y = y * a.astype(y.dtype)
    return jax.nn.relu(y if res is None else y + res)


def block(p, x):
    """Bottleneck: 1x1 CIN->CMID, 3x3 CMID->CMID, 1x1 CMID->CIN, each with
    BN-ish stats + apply + relu, residual add. x: (B, H, W, CIN)."""
    w1, w2, w3 = p
    y = jnp.dot(x, w1)                      # (B,H,W,CMID)
    y = _post(y)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            y.shape, w2.shape, ("NHWC", "HWIO", "NHWC")),
    )
    y = _post(y)
    y = jnp.dot(y, w3)                      # (B,H,W,CIN)
    return _post(y, res=x)


def make_params(rng, g=None):
    def mk(shape):
        nonlocal rng
        rng, k = jax.random.split(rng)
        s = shape if g is None else (g, *shape)
        return (jax.random.normal(k, s, jnp.float32) * 0.05).astype(jnp.bfloat16)
    return mk((CIN, CMID)), mk((3, 3, CMID, CMID)), mk((CMID, CIN))


def gblock(p, x, groups, dense=False):
    """Modality-in-channels bottleneck: x (B, H, W, G*CIN); grouped convs
    (feature_group_count=G) keep per-modality weights — same math as vmap,
    but every elementwise/norm/layout op sees full-width (>=128 lane)
    channel dims. ``dense`` embeds the grouped weights block-diagonally in
    a dense conv (G x the FLOPs at full MXU lane util) to measure which
    side of the tradeoff XLA's grouped lowering lands on."""
    w1, w2, w3 = p  # (G, CIN, CMID), (G, 3, 3, CMID, CMID), (G, CMID, CIN)

    def gconv(y, w, kh):
        g, ci, co = w.shape[0], w.shape[-2], w.shape[-1]
        if dense:
            wd = jnp.zeros((kh, kh, g * ci, g * co), w.dtype)
            for gi in range(g):
                blk = w[gi].reshape(kh, kh, ci, co)
                wd = wd.at[:, :, gi * ci:(gi + 1) * ci,
                           gi * co:(gi + 1) * co].set(blk)
            fgc = 1
        else:
            # grouped conv kernel layout: (kh, kw, ci, g*co)
            wd = jnp.concatenate(
                [w[gi].reshape(kh, kh, ci, co) for gi in range(g)], axis=-1
            )
            fgc = g
        return jax.lax.conv_general_dilated(
            y, wd, (1, 1), [(kh // 2, kh // 2)] * 2,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                y.shape, wd.shape, ("NHWC", "HWIO", "NHWC")),
            feature_group_count=fgc,
        )

    y = gconv(x, w1[:, None], 1)
    y = _post(y)
    y = gconv(y, w2, 3)
    y = _post(y)
    y = gconv(y, w3[:, None], 1)
    return _post(y, res=x)


def variant_fn(kind):
    if kind == "vmap":
        f = jax.vmap(block, in_axes=(0, 0))
    elif kind == "loop":
        def f(p, x):
            return jnp.stack(
                [block(jax.tree.map(lambda a: a[g], p), x[g]) for g in range(G)]
            )
    elif kind == "shared":
        def f(p, x):
            y = block(p, x.reshape(G * B, H, W, CIN))
            return y.reshape(G, B, H, W, CIN)
    elif kind in ("fgroup", "fdense"):
        def f(p, x):
            # (G, B, H, W, C) -> (B, H, W, G*C)
            xc = x.transpose(1, 2, 3, 0, 4).reshape(B, H, W, G * CIN)
            y = gblock(p, xc, G, dense=(kind == "fdense"))
            return y.reshape(B, H, W, G, CIN).transpose(3, 0, 1, 2, 4)
    elif kind in ("fgroup_raw", "fdense_raw"):
        # steady-state form: the chain carry IS (B, H, W, G*C) — no
        # transpose or scrambled reshape anywhere (main() reshapes the
        # initial carry once, outside the timed chain)
        def f(p, x):
            return gblock(p, x, G, dense=(kind == "fdense_raw"))
    else:
        raise ValueError(kind)

    def one(x, p):
        def loss(xx):
            return (f(p, xx).astype(jnp.float32) ** 2).mean()
        g = jax.grad(loss)(x)
        return (x + 0.9 * g.astype(x.dtype)), 0.0

    @jax.jit
    def chain(x, p):
        y, _ = jax.lax.scan(lambda c, _: one(c, p), x, None, length=K_STEPS)
        return y.astype(jnp.float32).mean()

    return chain


def main():
    rng = jax.random.PRNGKey(0)
    x3 = jax.random.normal(rng, (G, B, H, W, CIN), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def empty(x):
        return x.astype(jnp.float32).mean()
    _ = float(empty(x3))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(empty(x3))
    floor = (time.perf_counter() - t0) / 5

    kinds = sys.argv[1:] or ["shared", "loop", "vmap"]
    for kind in kinds:
        p = make_params(jax.random.PRNGKey(1), g=None if kind == "shared" else G)
        chain = variant_fn(kind)
        xk = (x3.transpose(1, 2, 3, 0, 4).reshape(B, H, W, G * CIN)
              if kind.endswith("_raw") else x3)
        _ = float(chain(xk, p))  # compile
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(xk, p))
            reps.append((time.perf_counter() - t0 - floor) / K_STEPS)
        ms = min(reps) * 1e3
        # fwd ~3x conv flops of one block * G... report raw ms/blockstep
        print(f"{kind:7s} {ms:7.2f} ms per (fwd+bwd) block step")


if __name__ == "__main__":
    main()
