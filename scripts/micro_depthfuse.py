"""Microbench: structural depth-fusion rewrites for the FULL-depth decoder.

The full-depth decoder's hot convs (depth_mode='full', the parity default)
act on volumes whose depth axis is REDUNDANT by construction
(/root/reference/mmvit4.py:266-292):

  * c2 convs (d1_c2 ...): the skip block of input channels is
    nearest-resized from 3 depth rows -> the skip-side conv has only
    ~7 distinct output depth rows (3 slab interiors + 4 slab-boundary
    rows); computable as a 3-row coarse conv + a static depth-expansion
    einsum.
  * c1 convs (d1_c1 ...): the input is trilinear-up2'd along depth ->
    depth taps commute with the (linear) depth resize, so the conv can
    run at COARSE depth (half the rows) followed by a static banded
    lerp-expansion einsum; the depth-materialized resize disappears.

Both rewrites are exact (same math, f32 reassociation only); this micro
measures them against the shipping tapout forms on hardware.

Timing: K chained fwd+bwd steps per dispatch (grad wrt inputs AND w),
host fetch per dispatch (the only honest wall clock through axon).

Usage: python scripts/micro_depthfuse.py [c1_base c1_fused c2_base c2_slab]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("MDF_B", "8"))
D = 128
HW = 128
K_STEPS = int(os.environ.get("MDF_STEPS", "4"))

CS, CR, CO = 24, 8, 8   # d1_c2: skip 24 + run 8 -> 8
C1, CO1 = 16, 8          # d1_c1: 16 -> 8 at coarse depth 64


def conv2d(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
    )


def tapout_conv(x, w):
    """(B, D, H, W, C) 3x3x3 conv, replicate depth pad, via tap-major
    output folding + shift-add (the shipping _depth3_shift_add form)."""
    b, d_, h, w_, c = x.shape
    co = w.shape[-1]
    xf = x.reshape(b * d_, h, w_, c)
    kcat = jnp.concatenate([w[t] for t in range(3)], axis=-1)
    zcat = conv2d(xf, kcat).reshape(b, d_, h, w_, 3 * co)
    z0, z1, z2 = (zcat[..., t * co:(t + 1) * co] for t in range(3))
    z0s = jnp.concatenate([z0[:, :1], z0[:, :-1]], axis=1)   # replicate top
    z2s = jnp.concatenate([z2[:, 1:], z2[:, -1:]], axis=1)   # replicate bot
    return z0s + z1 + z2s


def nearest_rows(d, s):
    return np.floor(np.arange(d) * s / d).astype(np.int32)


def linear_coords(d, s):
    c = np.arange(d) * (s - 1) / (d - 1)   # align_corners=True
    k = np.clip(np.floor(c).astype(np.int32), 0, s - 2)
    return k, (c - k).astype(np.float32)


def expand_table_nearest(d, s):
    """M[d, t, k]: output row d tap t reads coarse row k (replicate clamp)."""
    m = np.zeros((d, 3, s), np.float32)
    rows = nearest_rows(d, s)
    for dd in range(d):
        for t in range(3):
            src = min(max(dd + t - 1, 0), d - 1)
            m[dd, t, rows[src]] = 1.0
    return jnp.asarray(m)


def expand_table_linear(d, s):
    """M[d, t, k] for depth-linear (align_corners) input: output row d tap
    t reads lerp of coarse rows k_e, k_e+1 at fine row e=clamp(d+t-1)."""
    m = np.zeros((d, 3, s), np.float32)
    k, a = linear_coords(d, s)
    for dd in range(d):
        for t in range(3):
            e = min(max(dd + t - 1, 0), d - 1)
            m[dd, t, k[e]] += 1.0 - a[e]
            m[dd, t, k[e] + 1] += a[e]
    return jnp.asarray(m)


# ---- c2 (d1_c2): skip(3 coarse rows) + run(full depth) -------------------

def c2_base(w, s_hw, run):
    """Shipping form: materialize the nearest-resized skip at full depth,
    concat with the run block, one tapout conv."""
    rows = jnp.asarray(nearest_rows(D, 3))
    skip = jnp.take(s_hw, rows, axis=1)          # (B, D, H, W, CS)
    x = jnp.concatenate([skip, run], axis=-1)
    return tapout_conv(x, w)


def expand_taps(u, m, co):
    """Per-tap tensordot form (matches nn/depthfuse.py): u (B,S,H,W,3*CO),
    m (D,3,S) -> (B,D,H,W,CO)."""
    y = None
    for t in range(3):
        yt = jnp.tensordot(m[:, t, :], u[..., t * co:(t + 1) * co],
                           axes=[[1], [1]])
        y = yt if y is None else y + yt
    return jnp.moveaxis(y, 0, 1)


def c2_slab(w, s_hw, run):
    ws, wr = w[..., :CS, :], w[..., CS:, :]
    # coarse conv on the 3 skip rows, tap-major
    kcat = jnp.concatenate([ws[t] for t in range(3)], axis=-1)
    u = conv2d(s_hw.reshape(B * 3, HW, HW, CS), kcat)
    u = u.reshape(B, 3, HW, HW, 3 * CO)
    m = expand_table_nearest(D, 3).astype(u.dtype)
    ys = expand_taps(u, m, CO)
    return ys + tapout_conv(run, wr)


# ---- c1 (d1_c1): conv after depth-linear up2 ------------------------------

def c1_base(w, z):
    """Shipping form: materialize the depth-up2'd volume, tapout conv."""
    k, a = linear_coords(D, D // 2)
    k = jnp.asarray(k)
    a = jnp.asarray(a, z.dtype).reshape(1, D, 1, 1, 1)
    x = (1 - a) * jnp.take(z, k, axis=1) + a * jnp.take(z, k + 1, axis=1)
    return tapout_conv(x, w)


def c1_fused(w, z):
    kcat = jnp.concatenate([w[t] for t in range(3)], axis=-1)
    u = conv2d(z.reshape(B * (D // 2), HW, HW, C1), kcat)
    u = u.reshape(B, D // 2, HW, HW, 3 * CO1)
    m = expand_table_linear(D, D // 2).astype(u.dtype)
    return expand_taps(u, m, CO1)


def chain_fn(f, nargs):
    def one(carry, _):
        args = carry

        def loss(*aa):
            y = f(*aa)
            return (y.astype(jnp.float32) ** 2).mean()

        gs = jax.grad(loss, argnums=tuple(range(nargs)))(*args)
        return tuple(a - 0.01 * g.astype(a.dtype) for a, g in zip(args, gs)), 0.0

    @jax.jit
    def chain(*args):
        out, _ = jax.lax.scan(one, args, None, length=K_STEPS)
        return sum(o.astype(jnp.float32).mean() for o in out)

    return chain


def main():
    global B, D, HW
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(
            rng.normal(0, 1, shape).astype(np.float32)).astype(jnp.bfloat16)

    w2 = mk(3, 3, 3, CS + CR, CO) * 0.1
    s_hw = mk(B, 3, HW, HW, CS)
    run = mk(B, D, HW, HW, CR)
    w1 = mk(3, 3, 3, C1, CO1) * 0.1
    z = mk(B, D // 2, HW, HW, C1)

    cases = {
        "c2_base": (c2_base, (w2, s_hw, run)),
        "c2_slab": (c2_slab, (w2, s_hw, run)),
        "c1_base": (c1_base, (w1, z)),
        "c1_fused": (c1_fused, (w1, z)),
    }
    names = sys.argv[1:] or list(cases)

    # exactness on a small slice (f32, CPU-comparable shapes kept tiny)
    for pair, d_small in ((("c2_base", "c2_slab"), 16),
                          (("c1_base", "c1_fused"), 16)):
        ob, od, ohw = B, D, HW
        B, D, HW = 1, d_small, 16
        try:
            ww = np.random.default_rng(1).normal(0, 0.2, (3, 3, 3, CS + CR, CO)
                                                 ).astype(np.float32)
            if pair[0] == "c2_base":
                aa = (jnp.asarray(ww),
                      jnp.asarray(rng.normal(0, 1, (1, 3, 16, 16, CS))
                                  .astype(np.float32)),
                      jnp.asarray(rng.normal(0, 1, (1, d_small, 16, 16, CR))
                                  .astype(np.float32)))
            else:
                aa = (jnp.asarray(ww[..., :C1, :CO1]),
                      jnp.asarray(rng.normal(0, 1, (1, d_small // 2, 16, 16, C1))
                                  .astype(np.float32)))
            ya = np.asarray(cases[pair[0]][0](*aa), np.float32)
            yb = np.asarray(cases[pair[1]][0](*aa), np.float32)
            err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-6)
            print(f"# {pair[1]} vs {pair[0]}: max rel diff {err:.2e}")
            # forms differ only in MXU partial-sum rounding (TPU runs f32
            # convs at DEFAULT precision); CPU agreement is 4.5e-7
            assert err < 3e-2, (pair, err)
        finally:
            B, D, HW = ob, od, ohw

    @jax.jit
    def empty(x):
        return x[0, 0, 0, 0, 0].astype(jnp.float32)

    _ = float(empty(run))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(empty(run))
    floor = (time.perf_counter() - t0) / 5
    print(f"# rt floor {floor * 1e3:.1f} ms")

    for name in names:
        f, args = cases[name]
        chain = chain_fn(f, len(args))
        try:
            _ = float(chain(*args))
        except Exception as e:
            print(f"{name:9s} FAILED: {type(e).__name__}")
            continue
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(*args))
            reps.append((time.perf_counter() - t0 - floor) / K_STEPS)
        print(f"{name:9s} {min(reps) * 1e3:8.2f} ms/step")


if __name__ == "__main__":
    main()
