"""Model profiling — calculate.py / calculate2.py / calculate3.py equivalents.

The reference measures FLOPs via thop.profile on a loaded checkpoint
(calculate.py:152-156) and parameter counts via
``sum(p.numel() for p in model.parameters())`` (calculate3.py:168-172).
TPU-native equivalents: parameter counts from the param pytree and FLOPs
from XLA's own ``cost_analysis()`` on the lowered+compiled forward, which
accounts for the ops actually executed after fusion.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["param_count", "flops", "profile_model", "main"]


def param_count(params) -> int:
    """Trainable parameter count (calculate3.py:168-172)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def flops(model, variables, sample, train: bool = False) -> float:
    """Forward-pass FLOPs from XLA cost analysis (thop equivalent)."""
    lowered = jax.jit(lambda v, x: model.apply(v, x, train)).lower(
        variables, sample
    )
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def clever_format(n: float, suffix="") -> str:
    """thop.clever_format-style human numbers (calculate.py:10)."""
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(n) >= div:
            return f"{n / div:.3f}{unit}{suffix}"
    return f"{n:.3f}{suffix}"


def profile_model(modeltype: str, batch_size: int = 1, lim: int = 224):
    from corrifnet_tpu.models import create_model, get_spec

    spec = get_spec(modeltype)
    model = create_model(modeltype)
    if spec.input_kind == "5d":
        sample = jnp.zeros((batch_size, 3, 3, lim, lim), jnp.float32)
    else:
        sample = jnp.zeros((batch_size, 3, lim, lim), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, sample, False)
    n_params = param_count(variables["params"])
    n_flops = flops(model, variables, sample)
    return {
        "modeltype": modeltype,
        "params": n_params,
        "params_str": f"{n_params / 1e6:.3f}M",
        "flops": n_flops,
        "flops_str": clever_format(n_flops),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("modeltype")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--lim", type=int, default=224)
    args = ap.parse_args(argv)
    r = profile_model(args.modeltype, args.batch_size, args.lim)
    print(f"{r['modeltype']}: params {r['params_str']}  flops {r['flops_str']}")
    return r


if __name__ == "__main__":
    main()
