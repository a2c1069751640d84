"""Microbench: the REAL Bottleneck3D (models/resnet3d.py) standard vs
pallas_fused (ops/fusedconv.py) at each encoder layer's tail-block shape.

Layer1 runs the packed modality-in-channels form (m=3); layers 2-4 run
per-modality under jax.vmap with stacked params — matching how the MMVit4
encoder actually executes each.

Timing: K dependent block-grad steps chained inside ONE jitted lax.scan
(single dispatch — immune to the axon tunnel's enqueue-returns-early lie),
synced by a host fetch; per-step time = (t_chain - t_empty) / K.

Usage: python scripts/micro_fusedconv.py [layer1 layer2 layer3 layer4]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from corrifnet_tpu.models.resnet3d import Bottleneck3D

B = 8
K_STEPS = 20
# name -> (width, in_ch, hw, modalities, vmap_groups)
CFGS = {
    "layer1": (64, 768, 56, 3, 1),   # packed m=3 tail block
    "layer2": (128, 512, 28, 1, 3),  # per-modality vmapped tail blocks
    "layer3": (256, 1024, 14, 1, 3),
    "layer4": (512, 2048, 7, 1, 3),
}


def make_chain(width, in_ch, hw, m, g, fused):
    mod = Bottleneck3D(
        width=width, stride=1, has_downsample=False, modalities=m,
        pallas_fused=fused, dtype=jnp.bfloat16,
    )
    shape = (B, 3, hw, hw, in_ch)
    key = jax.random.PRNGKey(0)
    if g > 1:
        x = jax.random.normal(key, (g, *shape), jnp.float32).astype(jnp.bfloat16)
        keys = jax.random.split(jax.random.PRNGKey(1), g)
        v = jax.vmap(lambda k, xx: mod.init({"params": k}, xx, True))(keys, x)

        def fwd(v, xx):
            return jax.vmap(
                lambda vv, xi: mod.apply(vv, xi, True, mutable=["batch_stats"])[0]
            )(v, xx)
    else:
        x = jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)
        v = mod.init({"params": jax.random.PRNGKey(1)}, x, True)

        def fwd(v, xx):
            return mod.apply(vv_fix(v), xx, True, mutable=["batch_stats"])[0]

        vv_fix = lambda v: v

    fwd_only = os.environ.get("MF_FWD_ONLY", "0") == "1"

    def one(xx, _):
        if fwd_only:
            # tail blocks preserve shape: chain the forward directly
            return fwd(v, xx).astype(xx.dtype), 0.0
        grad = jax.grad(
            lambda t: (fwd(v, t).astype(jnp.float32) ** 2).mean()
        )(xx)
        return (xx + 0.9 * grad.astype(xx.dtype)), 0.0

    @jax.jit
    def chain(xx):
        y, _ = jax.lax.scan(one, xx, None, length=K_STEPS)
        return y.astype(jnp.float32).mean()

    return chain, x


def main():
    names = sys.argv[1:] or list(CFGS)
    z = jnp.zeros((1024, 1024), jnp.bfloat16)

    @jax.jit
    def empty(t):
        return t.astype(jnp.float32).mean()

    _ = float(empty(z))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(empty(z))
    floor = (time.perf_counter() - t0) / 5

    for name in names:
        width, in_ch, hw, m, g = CFGS[name]
        row = [name]
        for fused in (False, True):
            chain, x = make_chain(width, in_ch, hw, m, g, fused)
            _ = float(chain(x))  # compile
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(chain(x))
                reps.append((time.perf_counter() - t0 - floor) / K_STEPS)
            row.append(f"{'fused' if fused else 'std':5s} {min(reps) * 1e3:7.2f} ms")
        print(f"{row[0]:8s} {row[1]}   {row[2]}")


if __name__ == "__main__":
    main()
