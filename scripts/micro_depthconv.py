"""Microbench: pruned-decoder depth-3 conv strategies at the d1 shape.

  taps   — the shipping _depth3_decomposed form: 3 depth-tap slices
           concatenated into input channels, one 2-D conv over (B*D)
           batch (cin 3C -> cout C', C' tiny => ~6% output lanes)
  banded — depth folded INTO channels: one 2-D conv (B, H, W, D*C) ->
           (B, H, W, D*C') with a block-banded kernel (zeros off the
           depth tridiagonal). D/3 x the FLOPs, ~D x the output lanes.

Timing: chained fwd+bwd steps in one dispatch (see micro_block.py).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# default: the d1 shape; override with MDC_SHAPE="B,D,H,W,C,CO" to probe
# other decoder levels (d3_c1: 8,5,64,64,64,32; d2_c1: 8,5,128,128,32,16)
B, D, H, W, C, CO = map(int, os.environ.get(
    "MDC_SHAPE", "8,5,128,128,16,8").split(","))
K_STEPS = 30


def conv2d(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
    )


def taps_form(w, x):
    # x: (B, D, H, W, C); w: (3, 3, 3, C, CO) depth-tap kernel
    top = jnp.zeros_like(x[:, :1])
    xp = jnp.concatenate([top, x, top], axis=1)       # zero depth pad
    xcat = jnp.concatenate([xp[:, t:t + D] for t in range(3)], axis=-1)
    kcat = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * C, CO)
    y = conv2d(xcat.reshape(B * D, H, W, 3 * C), kcat)
    return y.reshape(B, D, H, W, CO)


def banded_form(w, x):
    # folded x: (B, H, W, D*C); dense kernel (3, 3, D*C, D*CO) with
    # W2[:, :, di*C + c, do*CO + o] = w[di - do + 1, :, :, c, o]
    xf = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, D * C)
    # build the banded kernel from slice/pad ops (cheap backward)
    rows = []
    for do in range(D):
        blocks = []
        for di in range(D):
            t = di - do + 1
            if 0 <= t < 3:
                blocks.append(w[t])                    # (3, 3, C, CO)
            else:
                blocks.append(jnp.zeros((3, 3, C, CO), w.dtype))
        rows.append(jnp.concatenate(blocks, axis=2))   # (3, 3, D*C, CO)
    w2 = jnp.concatenate(rows, axis=3)                 # (3, 3, D*C, D*CO)
    yf = conv2d(xf, w2)
    return yf.reshape(B, H, W, D, CO).transpose(0, 3, 1, 2, 4)


def chain_fn(f, w):
    def one(x, w):
        def loss(xx):
            y = f(w, xx)
            return (y.astype(jnp.float32) ** 2).mean()
        g = jax.grad(loss)(x)
        # keep shapes: grad wrt x matches x
        return (x + 0.9 * g.astype(x.dtype)), 0.0

    @jax.jit
    def chain(x, w):
        y, _ = jax.lax.scan(lambda c, _: one(c, w), x, None, length=K_STEPS)
        return y.astype(jnp.float32).mean()

    return chain


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, D, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, C, CO)).astype(np.float32)).astype(jnp.bfloat16)

    ref_t = np.asarray(taps_form(w, x).astype(jnp.float32))
    ref_b = np.asarray(banded_form(w, x).astype(jnp.float32))
    err = np.abs(ref_t - ref_b).max()
    print(f"forms agree: max abs diff {err:.2e}")
    assert err < 2e-2, err

    @jax.jit
    def empty(x):
        return x.astype(jnp.float32).mean()
    _ = float(empty(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(empty(x))
    floor = (time.perf_counter() - t0) / 5

    for name, f in [("taps", taps_form), ("banded", banded_form)]:
        if sys.argv[1:] and name not in sys.argv[1:]:
            continue
        chain = chain_fn(f, w)
        _ = float(chain(x, w))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(x, w))
            reps.append((time.perf_counter() - t0 - floor) / K_STEPS)
        print(f"{name:7s} {min(reps) * 1e3:7.3f} ms per fwd+bwd step")


if __name__ == "__main__":
    main()
