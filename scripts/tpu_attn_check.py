"""Validate fused_attention on real TPU: fwd/bwd vs XLA, dropout stats."""
import numpy as np
import jax
import jax.numpy as jnp

from corrifnet_tpu.ops import attention_xla, fused_attention

print("backend:", jax.default_backend(), jax.devices())


def qkv(shape, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3)
    )


for n in (512, 2048):
    b, h, d = (2, 8, 64) if n == 512 else (1, 8, 64)
    q, k, v = qkv((b, h, n, d), seed=n)
    scale = d ** -0.5

    f = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))
    x = jax.jit(lambda q, k, v: attention_xla(q, k, v, scale))
    got = np.asarray(f(q, k, v))
    want = np.asarray(x(q, k, v))
    err = np.abs(got - want).max()
    print(f"N={n} fwd max err: {err:.2e}")
    assert err < 1e-4, err

    gf = jax.jit(jax.grad(
        lambda q, k, v: (fused_attention(q, k, v, scale) ** 2).sum(),
        argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(
        lambda q, k, v: (attention_xla(q, k, v, scale) ** 2).sum(),
        argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb in zip("qkv", gf, gx):
        e = np.abs(np.asarray(a) - np.asarray(bb)).max()
        rel = e / (np.abs(np.asarray(bb)).max() + 1e-9)
        print(f"N={n} d{name} max err: {e:.2e} (rel {rel:.2e})")
        # TPU f32 matmuls default to bf16 MXU passes on both paths;
        # rel ~1e-2 is rounding, not a kernel bug.
        assert rel < 3e-2, (name, e, rel)

# dropout stats: v=ones -> rows of P_drop sum; zero-fraction ~ rate
n, rate = 512, 0.5
q, k, v = qkv((1, 2, n, 64), seed=9)
ones = jnp.ones_like(v)
rng = jax.random.PRNGKey(7)
f = jax.jit(lambda q, k: fused_attention(q, k, ones, 0.125,
                                         dropout_rate=rate, rng=rng))
out = np.asarray(f(q, k))
# each output element = sum_m P_drop[n,m]; E[sum] = 1
print("dropout row-sum mean:", out.mean(), "(expect ~1)")
assert abs(out.mean() - 1.0) < 0.05

# determinism: same rng -> same output
out2 = np.asarray(f(q, k))
assert np.array_equal(out, out2), "dropout must be deterministic per rng"
print("dropout deterministic: OK")

# grad under dropout: compare vs XLA path with SAME mask is impossible
# (different bitstream); instead check dq/dk/dv statistics are sane and
# finite, and that rate=0 seed path == no-dropout path.
g = jax.jit(jax.grad(
    lambda q, k, v: (fused_attention(q, k, v, 0.125, dropout_rate=rate,
                                     rng=rng) ** 2).sum(),
    argnums=(0, 1, 2)))(q, k, v)
for name, a in zip("qkv", g):
    arr = np.asarray(a)
    assert np.isfinite(arr).all(), name
    print(f"dropout d{name}: finite, |max|={np.abs(arr).max():.3f}")

# Exact mask-regeneration check: probe the kernel's dropped probability
# matrix with identity-block v's (zeros in P_drop identify dropped entries,
# since softmax probabilities are strictly positive), then compare fused
# fwd+grads against an XLA reference using that explicit mask.
# n=256: single q block / single k tile. n=1536 (the MMVit2 multimodal
# length): q_blk=128 -> 12 q blocks, k_blk=512 -> 3 k tiles — exercises
# the qi/kj seed-mixing across blocks in fwd AND both backward kernels.
scale2 = 0.125


def probe_mask(qq, kk, n, shape, call):
    cols = []
    for j in range(n // 64):
        ve = np.zeros(shape, np.float32)
        ve[..., j * 64:(j + 1) * 64, :] = np.eye(64)
        cols.append(np.asarray(call(qq, kk, jnp.asarray(ve))))
    return np.concatenate(cols, axis=-1)  # scaled kept probs


def check_explicit_mask(n2, seed):
    q2, k2, v2 = qkv((1, 2, n2, 64), seed=seed)
    call = lambda a, b, c: fused_attention(a, b, c, scale2,
                                           dropout_rate=rate, rng=rng)
    p_drop = probe_mask(q2, k2, n2, (1, 2, n2, 64), call)
    keep = jnp.asarray(p_drop > 0)
    frac = 1.0 - np.asarray(keep).mean()
    print(f"n={n2} probed mask drop fraction: {frac:.4f} (rate={rate})")
    assert abs(frac - rate) < 0.02

    def ref_masked(qq, kk, vv):
        s = jnp.einsum("bhnd,bhmd->bhnm", qq, kk) * scale2
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        return jnp.einsum("bhnm,bhmd->bhnd", pd, vv)

    got = np.asarray(jax.jit(call)(q2, k2, v2))
    want = np.asarray(jax.jit(ref_masked)(q2, k2, v2))
    e = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"n={n2} dropout fwd vs explicit-mask XLA: rel {e:.2e}")
    assert e < 3e-2, e

    gf = jax.jit(jax.grad(
        lambda a, b, c: (call(a, b, c) ** 2).sum(), argnums=(0, 1, 2)
    ))(q2, k2, v2)
    gx = jax.jit(jax.grad(
        lambda a, b, c: (ref_masked(a, b, c) ** 2).sum(), argnums=(0, 1, 2)
    ))(q2, k2, v2)
    for name, a, bb in zip("qkv", gf, gx):
        e = np.abs(np.asarray(a) - np.asarray(bb)).max() / (
            np.abs(np.asarray(bb)).max() + 1e-9)
        print(f"n={n2} dropout d{name} vs explicit-mask XLA: rel {e:.2e}")
        assert e < 3e-2, (name, e)
    return keep


check_explicit_mask(1536, seed=17)
n2 = 256
keep = check_explicit_mask(n2, seed=11)
# vmap + dropout (the modality-stream configuration): mask regeneration
# must hold per vmapped instance, each with its own rng.
keys = jax.random.split(jax.random.PRNGKey(42), 3)
q3, k3, v3 = qkv((3, 1, 2, n2, 64), seed=13)


def call(qq, kk, vv, key):
    return fused_attention(qq, kk, vv, scale2, dropout_rate=rate, rng=key)


vf = jax.jit(jax.vmap(call))
# probe per-modality masks
cols = []
for j in range(n2 // 64):
    ve = np.zeros((3, 1, 2, n2, 64), np.float32)
    ve[..., j * 64:(j + 1) * 64, :] = np.eye(64)
    cols.append(np.asarray(vf(q3, k3, jnp.asarray(ve), keys)))
p_drop3 = np.concatenate(cols, axis=-1)
keep3 = jnp.asarray(p_drop3 > 0)
for m in range(3):
    fr = 1.0 - np.asarray(keep3[m]).mean()
    assert abs(fr - rate) < 0.02, (m, fr)
assert not np.array_equal(np.asarray(keep3[0]), np.asarray(keep3[1])), \
    "modalities must draw distinct masks"




def ref_masked3(qq, kk, vv):
    s = jnp.einsum("xbhnd,xbhmd->xbhnm", qq, kk) * scale2
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    pd = jnp.where(keep3, p / (1.0 - rate), 0.0)
    return jnp.einsum("xbhnm,xbhmd->xbhnd", pd, vv)


got = np.asarray(vf(q3, k3, v3, keys))
want = np.asarray(jax.jit(ref_masked3)(q3, k3, v3))
e = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
print(f"vmap dropout fwd vs explicit-mask XLA: rel {e:.2e}")
assert e < 3e-2, e

gf = jax.jit(jax.grad(
    lambda a, b, c: (jax.vmap(call)(a, b, c, keys) ** 2).sum(),
    argnums=(0, 1, 2)))(q3, k3, v3)
gx = jax.jit(jax.grad(
    lambda a, b, c: (ref_masked3(a, b, c) ** 2).sum(),
    argnums=(0, 1, 2)))(q3, k3, v3)
for name, a, bb in zip("qkv", gf, gx):
    e = np.abs(np.asarray(a) - np.asarray(bb)).max() / (
        np.abs(np.asarray(bb)).max() + 1e-9)
    print(f"vmap dropout d{name} vs explicit-mask XLA: rel {e:.2e}")
    assert e < 3e-2, (name, e)
print("ALL TPU ATTENTION CHECKS PASSED")
