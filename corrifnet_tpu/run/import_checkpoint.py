"""Import a reference PyTorch checkpoint into a framework checkpoint.

The reference trains with torch and saves ``model.state_dict()`` as
``iremmodel{i}.pt`` / ``Finaliremmodel{i}.pt`` (F4_TRAIN.py:84-86). This
CLI converts such a file into this framework's Orbax checkpoint layout so
reference users can bring trained weights across and re-evaluate them
with ``run.evaluate`` / the test loop:

    python -m corrifnet_tpu.run.import_checkpoint MMVit4 \
        /path/Finaliremmodel0.pt /path/run_dir [--name Finaliremmodel0]

Every converted tree is shape-validated against the target model's init
tree (``jax.eval_shape``) before anything is written. The conversion math
itself is torch-parity tested end-to-end for all 12 zoo models
(tests/test_full_model_parity*.py).
"""

from __future__ import annotations

import argparse
import sys

__all__ = ["import_checkpoint", "main", "available_converters"]


def _converters():
    from corrifnet_tpu.models import torch_import as ti

    return {
        "MMVit4": lambda sd: ti.mmvit4_variables_from_state_dict(
            sd, pack_stage1=True
        ),
        "MMVit2": ti.mmvit2_variables_from_state_dict,
        "mmformer": lambda sd: ti.mmvit2_variables_from_state_dict(
            sd, mmformer=True
        ),
        "RFNet": ti.rfnet_variables_from_state_dict,
        "RobustMseg": ti.robustseg_variables_from_state_dict,
        "MultiSenseSeg": ti.multisenseseg_variables_from_state_dict,
        "UNetV2": ti.unetv2_variables_from_state_dict,
        "DeepLabv3_plus": ti.deeplab_variables_from_state_dict,
        "Segformer": ti.segformer_variables_from_state_dict,
        "FASSDNet": ti.fassdnet_variables_from_state_dict,
        "ENet": ti.enet_variables_from_state_dict,
        "ELANet": ti.elanet_variables_from_state_dict,
    }


def available_converters():
    """Model ids accepted by :func:`import_checkpoint`."""
    return sorted(_converters())


def _load_state_dict(path: str):
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "importing a .pt checkpoint requires torch (CPU build is enough)"
        ) from e
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    return obj


def _validate_shapes(modeltype: str, variables: dict, lim: int = 224) -> None:
    """Converted tree must exactly match the model's init-tree shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from corrifnet_tpu.models.registry import create_model, get_spec

    spec = get_spec(modeltype)
    kwargs = {"pack_stage1": True} if modeltype == "MMVit4" else {}
    model = create_model(modeltype, **kwargs)
    shape = (1, 3, 3, lim, lim) if spec.input_kind == "5d" else (1, 3, lim, lim)
    expected = jax.eval_shape(
        lambda r, xx: model.init({"params": r}, xx, False),
        jax.random.PRNGKey(0),
        jnp.zeros(shape, jnp.float32),
    )
    keys = [k for k in ("params", "batch_stats") if k in expected]
    exp = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(
            {k: expected[k] for k in keys}
        )[0]
    }
    got = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(
            {k: variables.get(k, {}) for k in keys}
        )[0]
    }
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    wrong = sorted(
        k for k in set(exp) & set(got) if tuple(exp[k]) != tuple(got[k])
    )
    if missing or extra or wrong:
        lines = [f"converted tree does not match {modeltype}'s init tree:"]
        for label, items in (
            ("missing", missing), ("unexpected", extra), ("shape-mismatch", wrong)
        ):
            for k in items[:8]:
                lines.append(f"  {label}: {k}")
            if len(items) > 8:
                lines.append(f"  ... and {len(items) - 8} more {label}")
        raise ValueError("\n".join(lines))


def import_checkpoint(modeltype: str, input_path: str, run_dir: str,
                      name: str = "Finaliremmodel0", lim: int = 224) -> str:
    """Convert ``input_path`` (torch .pt state_dict of ``modeltype``'s
    reference implementation) into an Orbax checkpoint ``run_dir/name``.
    Returns the checkpoint path."""
    convs = _converters()
    if modeltype not in convs:
        raise KeyError(
            f"no torch converter for {modeltype!r}; available: "
            f"{sorted(convs)}"
        )
    sd = _load_state_dict(input_path)
    variables = convs[modeltype](sd)
    _validate_shapes(modeltype, variables, lim=lim)

    from corrifnet_tpu.train.checkpoint import Checkpointer

    ck = Checkpointer(run_dir)
    try:
        path = ck.save(
            name, variables["params"], variables.get("batch_stats", {})
        )
    finally:
        ck.close()
    return str(path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="corrifnet_tpu.run.import_checkpoint",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument("modeltype", help="registry model id, e.g. MMVit4")
    ap.add_argument("input", help="reference torch .pt state_dict file")
    ap.add_argument("run_dir", help="output directory (framework run dir)")
    ap.add_argument("--name", default="Finaliremmodel0",
                    help="checkpoint name (default: Finaliremmodel0)")
    ap.add_argument("--lim", type=int, default=224,
                    help="patch size used for shape validation")
    args = ap.parse_args(argv)
    path = import_checkpoint(
        args.modeltype, args.input, args.run_dir, args.name, args.lim
    )
    print(f"imported {args.input} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
