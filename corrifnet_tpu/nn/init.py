"""Torch-compatible weight initializers for parity with the reference.

The reference relies on PyTorch's default module initializations plus two
explicit schemes:
  * ``torch.nn.init.kaiming_normal_`` applied to every Conv3d of MMVit4
    (mmvit4.py:437-439) — note this *overwrites* the inflated pretrained
    ResNet50 weights, so the flagship effectively trains from kaiming-normal
    init;
  * F2_MAIN.py:134-157's ``init_weights`` dispatch
    (xavier/kaiming x uniform/normal) applied to Conv2d modules.

Initializers here follow flax's ``init(key, shape, dtype)`` calling
convention. Conv kernel shapes are spatial-first with in/out channels last:
``(*kernel_spatial, in_ch, out_ch)`` — fan computations account for that.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "compute_fans",
    "kaiming_normal",
    "kaiming_uniform",
    "xavier_normal",
    "xavier_uniform",
    "torch_default_kernel",
    "torch_default_bias",
    "zeros",
    "REFERENCE_INIT_SCHEMES",
]


def compute_fans(shape):
    """(fan_in, fan_out) for a spatial-first kernel ``(*k, in, out)``."""
    if len(shape) < 2:
        return shape[0], shape[0]
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def kaiming_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ defaults: fan_in, gain=sqrt(2)."""
    fan_in, _ = compute_fans(shape)
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ defaults: fan_in, gain=sqrt(2)."""
    fan_in, _ = compute_fans(shape)
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_normal(key, shape, dtype=jnp.float32):
    fan_in, fan_out = compute_fans(shape)
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = compute_fans(shape)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_kernel(key, shape, dtype=jnp.float32):
    """PyTorch Conv/Linear default: kaiming_uniform_(a=sqrt(5)) which reduces
    to U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in, _ = compute_fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(fan_in: int):
    """PyTorch Conv/Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


# F2_MAIN.py:134-157 init_weights dispatch table (applied to 2D convs only).
REFERENCE_INIT_SCHEMES = {
    "xavier_uniform_": xavier_uniform,
    "xavier_normal_": xavier_normal,
    "kaiming_uniform_": kaiming_uniform,
    "kaiming_normal_": kaiming_normal,
}


def apply_reference_init_scheme(params, scheme: str, rng):
    """F2_MAIN.py:134-157 ``model.apply(init_weights)`` equivalent: re-init
    every 2-D conv kernel (4-axis spatial-first kernels) with the configured
    scheme and zero its bias. Unknown scheme names are a no-op, matching the
    reference (its dispatch silently does nothing for other strings)."""
    import jax
    import jax.numpy as jnp

    init_fn = REFERENCE_INIT_SCHEMES.get(scheme)
    if init_fn is None:
        return params

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    conv_bias_dirs = set()
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys and keys[-1] == "kernel" and leaf.ndim == 4:
            conv_bias_dirs.add(keys[:-1])

    counter = [0]

    def reinit(path, leaf):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys and keys[-1] == "kernel" and leaf.ndim == 4:
            counter[0] += 1
            return init_fn(
                jax.random.fold_in(rng, counter[0]), leaf.shape, leaf.dtype
            )
        if keys and keys[-1] == "bias" and keys[:-1] in conv_bias_dirs:
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(reinit, params)
