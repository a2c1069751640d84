"""Batch re-evaluation of saved runs — allJaccardResults_irem_f1_jcrd.py
equivalent.

The reference walks an experiment manifest (alternating run-name / path
lines, allJaccardResults:45-52), parses each run's dated log for
fold/model info (:80-95), rebuilds the model, restores
``Finaliremmodel*.pt`` and recomputes *per-image* Jaccard2 + F1 over the
test fold at batch size 1, reporting mean ± std (:197-240).

Here: manifest -> per-run orbax restore -> vmapped per-image metrics in one
jitted batch pass (no batch=1 loop needed on TPU).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from corrifnet_tpu.config import load_config
from corrifnet_tpu.data import cross_val, load_dstl
from corrifnet_tpu.data.dataset import make_batches
from corrifnet_tpu.metrics import jaccard_f1_pair
from corrifnet_tpu.models import create_model, get_spec
from corrifnet_tpu.train import Checkpointer, final_ckpt_name, init_state, make_optimizer

__all__ = ["evaluate_run", "read_manifest", "main"]


def read_manifest(path):
    """Alternating run-name / run-dir lines (allJaccardResults:45-52)."""
    lines = [ln.strip() for ln in Path(path).read_text().splitlines() if ln.strip()]
    return list(zip(lines[0::2], lines[1::2]))


def per_image_metrics(model, params, batch_stats, images, masks, indices,
                      batch_size=8, mesh=None):
    """Per-image (jaccard2, f1) over ``indices`` (allJaccardResults:208-240).

    With ``mesh`` (a ('data', 'model') Mesh), evaluation runs data-parallel:
    weights replicated, each static-size batch sharded over the data axis —
    the per-image metric math is embarrassingly parallel, so re-evaluating
    a large test fold scales with chip count. Sharded == unsharded
    (tests/test_evaluate.py)."""
    if mesh is not None:
        from corrifnet_tpu.parallel.sharding import put_batch, replicated

        params = jax.device_put(params, replicated(mesh))
        batch_stats = jax.device_put(batch_stats, replicated(mesh))

    @jax.jit
    def step(im, ma):
        ma = ma.astype(jnp.float32)  # uint8 over the wire (wire_cast_batch)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, im, False
        ).astype(jnp.float32)
        m0 = ma[:, 0, ...].reshape(ma.shape[0], -1, 1)
        o0 = out[:, 0, ...].reshape(out.shape[0], -1, 1)
        return jax.vmap(jaccard_f1_pair)(m0, o0)

    jacks, f1s = [], []
    from corrifnet_tpu.data.dataset import wire_cast_batch
    from corrifnet_tpu.train.loop import _wire_cast_enabled

    wire = _wire_cast_enabled(model)
    for batch in make_batches(images, masks, indices, batch_size):
        if wire:
            # the transfer dominates re-evaluation wall through a tunneled
            # TPU attach (~30-36 MB/s effective); exact for bf16 models
            batch = wire_cast_batch(batch)
        im, ma = batch.images, batch.masks
        if mesh is not None:
            im, ma = put_batch(mesh, im, ma)
            from corrifnet_tpu.ops.meshctx import kernel_mesh

            with kernel_mesh(mesh):
                j, f = step(im, ma)
        else:
            j, f = step(im, ma)
        keep = batch.valid.astype(bool)
        jacks.append(np.asarray(j).reshape(-1)[keep])
        f1s.append(np.asarray(f).reshape(-1)[keep])
    jacks = np.concatenate(jacks)
    f1s = np.concatenate(f1s)
    return jacks, f1s


def evaluate_run(run_dir, cfg, index: int = 0, segplot_dir=None):
    tsind, trind, _ = cross_val(cfg.train_set_size, cfg.fno, cfg.fsiz)
    data = load_dstl(
        cfg.train_set_size, trind,
        pack_path=cfg.data_pack, synthetic_seed=cfg.synthetic_seed,
    )
    spec = get_spec(cfg.modeltype)
    model = create_model(cfg.modeltype, dtype=cfg.jax_dtype)
    images = data.images if spec.input_kind == "5d" else data.images[:, 0]
    masks = data.masks if spec.input_kind == "5d" else data.masks[:, 0]

    state = init_state(
        model, jax.random.PRNGKey(0), images[:1], make_optimizer("Adam")
    )
    ckpt = Checkpointer(run_dir)
    params, batch_stats = ckpt.restore(
        final_ckpt_name(index),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    mesh = None
    bs = max(cfg.mini_batch_size, 8)
    if cfg.mesh_shape:
        from corrifnet_tpu.parallel import make_mesh

        mesh = make_mesh(tuple(cfg.mesh_shape))
        data_n = mesh.devices.shape[0]
        bs = -(-bs // data_n) * data_n  # round up: shardable over 'data'
    jacks, f1s = per_image_metrics(
        model, params, batch_stats, images, masks, tsind,
        batch_size=bs, mesh=mesh,
    )

    if segplot_dir is not None and spec.input_kind == "5d":
        # optional per-image overlays (allJaccardResults' segplot2 path)
        from corrifnet_tpu.run.segplot import segplot_indexed

        @jax.jit
        def fwd(im):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, im, False
            )

        for rank, idx in enumerate(tsind):
            out = np.asarray(fwd(jnp.asarray(data.images[idx : idx + 1])))
            img_hwc = np.moveaxis(data.images[idx, 0], 0, -1)
            segplot_indexed(
                segplot_dir, img_hwc.shape[0], img_hwc, out[0, 0, 0],
                np.asarray(masks[idx, 0, 0]), data.tr_mean_r, data.tr_mean_g,
                data.tr_mean_b, indx=int(idx),
            )
    return {
        "jaccard_mean": float(jacks.mean()),
        "jaccard_std": float(jacks.std()),
        "f1_mean": float(f1s.mean()),
        "f1_std": float(f1s.std()),
        "n_images": int(len(jacks)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", help="alternating name/dir lines")
    ap.add_argument("--run-dir")
    ap.add_argument("--config", required=True)
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--segplot-dir", default=None,
                    help="write per-test-image overlay PNGs here")
    args = ap.parse_args(argv)
    cfg = load_config(args.config)
    runs = (
        read_manifest(args.manifest)
        if args.manifest
        else [("run", args.run_dir)]
    )
    results = {}
    for name, run_dir in runs:
        r = evaluate_run(run_dir, cfg, args.index, segplot_dir=args.segplot_dir)
        results[name] = r
        print(
            f"{name}: jaccard {r['jaccard_mean']:.5f}±{r['jaccard_std']:.5f} "
            f"f1 {r['f1_mean']:.5f}±{r['f1_std']:.5f} (n={r['n_images']})"
        )
    return results


if __name__ == "__main__":
    main()
