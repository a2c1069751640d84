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


def train_step_memory(modeltype: str, batch_size: int = 4, lim: int = 224,
                      **model_kwargs):
    """Compile-time memory profile of the full train step (fwd+bwd+Adam)
    for the CURRENT backend — XLA's buffer assignment via
    ``compiled.memory_analysis()``. The only memory oracle on backends
    that report no runtime memory_stats (e.g. tunneled TPU attachments);
    round-4's OOM ladder came from exactly this (NOTES).

    Returns a dict of byte counts; peak = args + out + temp - alias
    (the donated state aliases in/out)."""
    from corrifnet_tpu.models import create_model, get_spec
    from corrifnet_tpu.train import init_state, make_optimizer
    from corrifnet_tpu.train.loop import default_dropout_key
    from corrifnet_tpu.train.state import _train_step_fn

    spec = get_spec(modeltype)
    model = create_model(modeltype, **model_kwargs)
    if spec.input_kind == "5d":
        images = jnp.zeros((batch_size, 3, 3, lim, lim), jnp.float32)
        masks = jnp.zeros((batch_size, 3, 1, lim, lim), jnp.float32)
    else:
        images = jnp.zeros((batch_size, 3, lim, lim), jnp.float32)
        masks = jnp.zeros((batch_size, 1, lim, lim), jnp.float32)
    valid = jnp.ones((batch_size,), jnp.float32)
    optimizer = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, optimizer)
    step = jax.jit(_train_step_fn(model, optimizer), donate_argnums=(0,))
    m = step.lower(
        state, images, masks, valid, 1e-4, default_dropout_key(1)
    ).compile().memory_analysis()
    out = {
        "argument_bytes": int(m.argument_size_in_bytes),
        "output_bytes": int(m.output_size_in_bytes),
        "temp_bytes": int(m.temp_size_in_bytes),
        "alias_bytes": int(m.alias_size_in_bytes),
    }
    out["peak_bytes"] = (out["argument_bytes"] + out["output_bytes"]
                         + out["temp_bytes"] - out["alias_bytes"])
    return out


def profile_model(modeltype: str, batch_size: int = 1, lim: int = 224,
                  memory: bool = False):
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
    result = {
        "modeltype": modeltype,
        "params": n_params,
        "params_str": f"{n_params / 1e6:.3f}M",
        "flops": n_flops,
        "flops_str": clever_format(n_flops),
    }
    if memory:
        mem = train_step_memory(modeltype, max(batch_size, 1), lim)
        result["train_step_memory"] = mem
        result["train_peak_str"] = clever_format(mem["peak_bytes"], "B")
    return result


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("modeltype")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--lim", type=int, default=224)
    ap.add_argument("--memory", action="store_true",
                    help="also compile the full train step and report "
                         "XLA's buffer-assignment peak for this backend")
    args = ap.parse_args(argv)
    r = profile_model(args.modeltype, args.batch_size, args.lim,
                      memory=args.memory)
    line = f"{r['modeltype']}: params {r['params_str']}  flops {r['flops_str']}"
    if args.memory:
        line += f"  train-step peak {r['train_peak_str']}"
    print(line)
    return r


if __name__ == "__main__":
    main()
