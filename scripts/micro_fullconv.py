"""Microbench: FULL-depth decoder 3x3x3 conv strategies (D up to 128).

The full-depth MMVit4 decoder (depth_mode='full', the parity default —
see NOTES round-3 depth-mode matrix) runs its big convs at
(B, 128, 128, 128, 16..32) -> cout 8..16, i.e. 6-12% of the MXU's 128
output lanes. Strategies measured, all exact (same math):

  shift3  — 3 per-tap 2-D convs + shift-add (pre-r3 shipping form)
  tapout  — ONE 2-D conv with the 3 depth-tap kernels concatenated along
            OUTPUT channels (3x lanes), shift-add over channel blocks
            (the r3 shipping form, nn/conv.py _depth3_shift_add)
  conv3d  — plain lax.conv_general_dilated 3-D conv (XLA's native choice)
  banded<G> — G output depths folded into channels: one 2-D conv
            (B*D/G, H, W, (G+2)*C) -> (..., G*CO) with a block-banded
            kernel; (G+2)/3 x the MACs, G*CO output lanes.

Timing: K chained fwd+bwd steps per dispatch (grad wrt x AND w), host
fetch per dispatch (the only honest wall clock through the axon tunnel).

  MFC_SHAPE="B,D,H,W,C,CO" python scripts/micro_fullconv.py [names...]
Defaults to the d1_c2 shape (8,128,128,128,32,8).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, D, H, W, C, CO = map(int, os.environ.get(
    "MFC_SHAPE", "8,128,128,128,32,8").split(","))
K_STEPS = int(os.environ.get("MFC_STEPS", "4"))


def conv2d(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
    )


def shift3_form(w, x):
    b, d_ = x.shape[:2]
    xf = x.reshape(b * d_, H, W, C)
    zs = [conv2d(xf, w[t]).reshape(b, d_, H, W, CO) for t in range(3)]
    z0, z1, z2 = zs
    top = jnp.zeros_like(z0[:, :1])
    z0s = jnp.concatenate([top, z0[:, :-1]], axis=1)
    z2s = jnp.concatenate([z2[:, 1:], top], axis=1)
    return z0s + z1 + z2s


def tapout_form(w, x):
    b, d_ = x.shape[:2]
    xf = x.reshape(b * d_, H, W, C)
    kcat = jnp.concatenate([w[t] for t in range(3)], axis=-1)
    zcat = conv2d(xf, kcat).reshape(b, d_, H, W, 3 * CO)
    z0, z1, z2 = (zcat[..., t * CO:(t + 1) * CO] for t in range(3))
    top = jnp.zeros_like(z1[:, :1])
    z0s = jnp.concatenate([top, z0[:, :-1]], axis=1)
    z2s = jnp.concatenate([z2[:, 1:], top], axis=1)
    return z0s + z1 + z2s


def conv3d_form(w, x):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")),
    )


def banded_form_g(g):
    assert D % g == 0

    def banded(w, x):
        b = x.shape[0]
        nb = D // g
        # input blocks with a 1-slice halo each side (zero depth pad)
        top = jnp.zeros_like(x[:, :1])
        xp = jnp.concatenate([top, x, top], axis=1)      # (B, D+2, H, W, C)
        xb = jnp.stack(
            [xp[:, i * g:i * g + g + 2] for i in range(nb)], axis=1
        )  # (B, nb, g+2, H, W, C)
        xf = xb.transpose(0, 1, 3, 4, 2, 5).reshape(
            b * nb, H, W, (g + 2) * C)
        zero = jnp.zeros((3, 3, C, CO), w.dtype)
        cols = []
        for do in range(g):
            blocks = []
            for di in range(g + 2):
                t = di - do          # tap index: input slice do+t-1 is xb[di]
                blocks.append(w[t] if 0 <= t <= 2 else zero)
            cols.append(jnp.concatenate(blocks, axis=2))
        w2 = jnp.concatenate(cols, axis=3)  # (3, 3, (g+2)*C, g*CO)
        yf = conv2d(xf, w2)
        y = yf.reshape(b, nb, H, W, g, CO).transpose(0, 1, 4, 2, 3, 5)
        return y.reshape(b, D, H, W, CO)

    return banded


def chain_fn(f):
    def one(carry, _):
        x, w = carry

        def loss(xx, ww):
            y = f(ww, xx)
            return (y.astype(jnp.float32) ** 2).mean()

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        return (x + 0.9 * gx.astype(x.dtype),
                w - 0.001 * gw.astype(w.dtype)), 0.0

    @jax.jit
    def chain(x, w):
        (xo, wo), _ = jax.lax.scan(one, (x, w), None, length=K_STEPS)
        return xo.astype(jnp.float32).mean() + wo.astype(jnp.float32).mean()

    return chain


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, D, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, C, CO)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    forms = [("shift3", shift3_form), ("tapout", tapout_form),
             ("conv3d", conv3d_form)]
    for g in (4, 16):
        if D % g == 0:
            forms.append((f"banded{g}", banded_form_g(g)))

    names = sys.argv[1:]
    picked = [(n, f) for n, f in forms if not names or n in names]

    # exactness vs the tapout reference on a small slice (full tensors are
    # multi-GB in f32; compare a depth window incl. both boundaries)
    small = x[:1, :16]
    globals()["D_SAVE"] = None
    ref = None
    for n, f in picked:
        if n.startswith("banded") and 16 % int(n[6:]) != 0:
            continue
        y = np.asarray(_apply_small(f, w, small), dtype=np.float32)
        if ref is None:
            ref = y
            continue
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-6)
        print(f"# {n} vs {picked[0][0]}: max rel diff {err:.2e}")
        # forms differ only in bf16 partial-sum rounding (shift-add sums in
        # bf16; conv3d accumulates all 27 taps in f32)
        assert err < 3e-2, (n, err)

    @jax.jit
    def empty(x):
        return x[0, 0, 0, 0, 0].astype(jnp.float32)

    _ = float(empty(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(empty(x))
    floor = (time.perf_counter() - t0) / 5
    print(f"# rt floor {floor * 1e3:.1f} ms")

    for name, f in picked:
        chain = chain_fn(f)
        try:
            _ = float(chain(x, w))
        except Exception as e:
            print(f"{name:9s} FAILED: {type(e).__name__}")
            continue
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(x, w))
            reps.append((time.perf_counter() - t0 - floor) / K_STEPS)
        flops = B * D * H * W * C * CO * 27 * 2 * 3  # fwd + ~2x bwd
        ms = min(reps) * 1e3
        print(f"{name:9s} {ms:8.2f} ms/step   ~{flops / min(reps) / 1e12:5.1f} TFLOP/s")


def _apply_small(f, w, small):
    global B, D
    ob, od = B, D
    B, D = small.shape[0], small.shape[1]
    try:
        return f(w, small)
    finally:
        B, D = ob, od


if __name__ == "__main__":
    main()
