"""Experiment driver — the F2_MAIN.py equivalent.

Flow (F2_MAIN.py:45-313): read config -> CrossVal fold split -> load/normalize
data -> build model by ``modeltype`` -> init or warm-start weights -> Adam/SGD
+ StepLR -> dated run directory with the seven log files -> train (per-epoch
checkpoint + validate) -> test (+ segplot on the first test image) -> dated
human-readable summary log -> learning/accuracy-curve PNGs.

Usage:
    python -m corrifnet_tpu.run.main --config experiments/model0.txt \
        [--run-root experiments] [--index 0] [--synthetic-seed 0]

Differences from the reference, by design:
  * data paths come from the config/CLI instead of hard-coded Windows paths
    (F8_IMAGES4.py:20-32); a synthetic generator stands in when no DSTL data
    is present;
  * runs on whatever jax.devices() provides (TPU first-class) instead of
    ``cuda:0``;
  * curve PNGs are written via matplotlib when available, else skipped.
"""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path

import jax
import numpy as np

from corrifnet_tpu.config import ExperimentConfig, load_config
from corrifnet_tpu.data import cross_val, load_dstl
from corrifnet_tpu.models import create_model, get_spec
from corrifnet_tpu.run.segplot import segplot
from corrifnet_tpu.train import (
    Checkpointer,
    init_state,
    make_optimizer,
    test_model,
    train_model,
)
from corrifnet_tpu.utils.logfiles import RunLogs

__all__ = ["run_experiment", "main"]


def _build_model(cfg: ExperimentConfig):
    spec = get_spec(cfg.modeltype)
    if cfg.modeltype in ("MMVit4", "MMVit2", "mmformer"):
        # these share the Pallas correlation path + depth-pruned decoder
        kwargs = dict(
            dtype=cfg.jax_dtype,
            use_pallas=cfg.use_pallas,
            depth_mode=cfg.depth_mode,
        )
        if cfg.modeltype == "MMVit4":
            kwargs["fuse_expand_bn"] = cfg.fuse_expand_bn
            kwargs["pallas_fused_blocks"] = cfg.pallas_fused_blocks
            kwargs["remat_mode"] = cfg.remat_mode
            kwargs["decoder_remat"] = cfg.decoder_remat
            kwargs["decoder_lean"] = cfg.decoder_lean
            kwargs["decoder_chunk"] = cfg.decoder_chunk
            kwargs["scan_unroll"] = cfg.scan_unroll
    else:
        kwargs = dict(dtype=cfg.jax_dtype)
    return create_model(cfg.modeltype, **kwargs), spec


def _prepare_images(images, spec, chindex="0"):
    """5-D models take (B,3,3,H,W); 4-D models take one modality selected by
    the config's ``chindex`` line (the reference's single-modality loaders
    F8_IMAGES/F8_IMAGES2 are absent from the snapshot; chindex 0/1/2 maps to
    RGB/NIR/SWIR here)."""
    if spec.input_kind == "4d":
        try:
            m = int(chindex)
        except (TypeError, ValueError):
            m = 0
        return images[:, m if 0 <= m < images.shape[1] else 0]
    return images


def _enable_compile_cache():
    """Persistent XLA compilation cache — long-model compiles (and a flaky
    remote compile service) make cache hits valuable across runs."""
    cache_dir = os.environ.get(
        "CORRIFNET_COMPILE_CACHE",
        str(Path.home() / ".cache" / "corrifnet_tpu" / "xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def run_experiment(cfg: ExperimentConfig, run_root=".", index: int = 0,
                   resume_dir=None, deadline_s=None):
    """One experiment (F2_MAIN.py:45-313). With ``resume_dir`` (a prior
    run directory trained with ``extended_checkpoints=true``), training
    continues mid-protocol from the ``state{index}`` checkpoint — full
    TrainState (params + optimizer moments + step), log files truncated
    to the last completed epoch and appended, per-epoch dropout RNG
    folded from the base key so the stream is process-count independent.
    True resume is a capability the reference lacks (it saves weights
    only, F4_TRAIN.py:84).

    ``deadline_s`` bounds the TRAINING wall clock: past it, training
    stops at the next epoch boundary (fully logged + resumable) and the
    test phase runs on the model reached — so a budgeted run still
    produces the complete 7-logfile artifact set incl. testaccFile."""
    begin = datetime.datetime.now()
    _enable_compile_cache()
    print("devices:", jax.devices())
    import time as _time

    deadline = (_time.monotonic() + float(deadline_s)) if deadline_s else None

    tsind, trind, vlind = cross_val(cfg.train_set_size, cfg.fno, cfg.fsiz)
    data = load_dstl(
        cfg.train_set_size,
        trind,
        rgb_dir=(cfg.data_dirs or {}).get("rgb"),
        all20_dir=(cfg.data_dirs or {}).get("all20"),
        mask_dir=(cfg.data_dirs or {}).get("mask"),
        pack_path=cfg.data_pack,
        synthetic_seed=cfg.synthetic_seed,
    )

    model, spec = _build_model(cfg)
    images = _prepare_images(data.images, spec, cfg.chindex)
    masks = data.masks if spec.input_kind == "5d" else data.masks[:, 0]

    optimizer = make_optimizer(cfg.optimizer_type)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng, scheme_rng = jax.random.split(rng, 3)
    sample = images[: cfg.mini_batch_size]
    state = init_state(model, init_rng, sample, optimizer)

    # transfertype dispatch (F2_MAIN.py:160-165): 'notr' applies the
    # configured init scheme to 2-D convs; 'yestr' warm-starts from a
    # checkpoint; 'loratr' leaves the model as constructed.
    if cfg.transfertype == "notr":
        from corrifnet_tpu.nn.init import apply_reference_init_scheme

        state = state.replace(
            params=apply_reference_init_scheme(
                state.params, cfg.initialization, scheme_rng
            )
        )
    elif cfg.transfertype == "yestr":
        transfer = getattr(cfg, "transfer_checkpoint", None)
        if transfer:
            warm = Checkpointer(str(Path(transfer).parent))
            params, batch_stats = warm.restore(
                Path(transfer).name,
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            state = state.replace(params=params, batch_stats=batch_stats)
            warm.close()

    start_epoch, prior_history = 0, None
    if resume_dir is not None:
        run_dir = Path(resume_dir)
        ckpt = Checkpointer(run_dir)
        state_name = f"state{index}"
        if not ckpt.exists(state_name):
            raise FileNotFoundError(
                f"{run_dir / state_name}: no extended checkpoint to resume "
                "from — start the run with extended_checkpoints=true"
            )
        state = ckpt.restore_state(state_name, state)
        steps_per_epoch = -(-len(trind) // cfg.mini_batch_size)
        start_epoch, rem = divmod(int(state.step), steps_per_epoch)
        if rem or start_epoch == 0:
            raise ValueError(
                f"{run_dir / state_name}: step {int(state.step)} is not a "
                f"whole number of epochs ({steps_per_epoch} steps/epoch) — "
                "was the checkpoint written by this config?"
            )
        logs = RunLogs.open_resumed(run_dir, start_epoch)
        prior_history = {
            "train_loss": _read_curve(run_dir / "trainFile.txt"),
            "train_jac": _read_curve(run_dir / "trainaccFile.txt"),
            "val_loss": _read_curve(run_dir / "valFile.txt"),
            "val_jac": _read_curve(run_dir / "valaccFile.txt"),
        }
        print(f"resuming {run_dir} at epoch {start_epoch}/{cfg.n_epochs}")
    else:
        d = datetime.datetime.now()
        run_dir = Path(run_root) / (
            f"{d.year}_{d.month}_{d.day}_{d.hour}_{d.minute}_model{index}"
        )
        run_dir.mkdir(parents=True, exist_ok=True)
        logs = RunLogs.open(run_dir)
        ckpt = Checkpointer(run_dir)

    mesh = None
    if cfg.mesh_shape:
        from corrifnet_tpu.parallel import make_mesh

        mesh = make_mesh(tuple(cfg.mesh_shape))
        print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

    device_data = _maybe_device_dataset(
        model, images, masks, mesh, vlind, tsind)

    state, history = train_model(
        model, state, optimizer,
        n_epochs=cfg.n_epochs, learn_rate=cfg.learn_rate,
        step_size=cfg.step_size, gamma=cfg.gamma,
        images=images, masks=masks, trind=trind, vlind=vlind,
        batch_size=cfg.mini_batch_size, lim=cfg.lim,
        logs=logs, ckpt=ckpt, i=index, rng=rng,
        val_from_checkpoint=cfg.val_from_checkpoint,
        mesh=mesh,
        chain_steps=cfg.chain_steps,
        auto_layout=cfg.auto_layout,
        start_epoch=start_epoch,
        # a resumed run must stay resumable regardless of the flag
        extended_checkpoints=cfg.extended_checkpoints or resume_dir is not None,
        deadline=deadline,
        device_data=device_data,
    )
    if prior_history is not None:
        history = {k: prior_history[k] + history[k] for k in history}

    test_loss, test_jac, fps, first_outputs = test_model(
        model, state, images, masks, tsind,
        cfg.mini_batch_size, cfg.lim, logs, ckpt, i=index,
        device_data=device_data,
    )

    # First-test-image overlay (F7_TEST2.py:136-166).
    if first_outputs is not None and spec.input_kind == "5d":
        first_idx = tsind[0]
        img_hwc = np.moveaxis(data.images[first_idx, 0], 0, -1)  # RGB (H,W,3)
        pred = first_outputs[0, 0, 0]  # (H, W)
        gt = masks[first_idx, 0, 0]
        segplot(run_dir, cfg.lim, img_hwc, pred, gt,
                data.tr_mean_r, data.tr_mean_g, data.tr_mean_b)

    logs.close()
    _write_summary_log(run_dir, cfg, begin, trind, vlind, test_jac, model)
    _write_curves(run_dir, history)
    ckpt.close()

    # device-memory telemetry before/after releasing the model state
    # (torch.cuda.memory_allocated parity, F2_MAIN.py:306-309)
    from corrifnet_tpu.utils.profiling import device_memory_stats, live_array_bytes

    print(f"Memory allocated before model {index}", live_array_bytes(),
          device_memory_stats().get("bytes_in_use", "n/a"))
    del state
    print(f"Memory allocated after model {index}", live_array_bytes(),
          device_memory_stats().get("bytes_in_use", "n/a"))
    return {
        "run_dir": str(run_dir),
        "test_loss": test_loss,
        "test_jaccard": test_jac,
        "fps": fps,
        "history": history,
    }


def _maybe_device_dataset(model, images, masks, mesh, vlind=None,
                          tsind=None):
    """Place the dataset (or just the re-streamed eval folds) in device
    memory when it fits (``data.dataset.DeviceDataset`` — through a
    tunneled TPU attach the host->device stream is the wall-clock
    bottleneck).

    Auto: on for accelerator backends, single-device only (under a mesh
    the sharding layer owns batch placement), sized against a
    conservative HBM budget (CORRIFNET_DEVICE_DATA_BUDGET_GB; the
    measured full-depth MMVit4 step peaks at 6.1 GB at B=4 of the ~12
    usable — NOTES round-4 memory ladder). When the full set is too big,
    the fallbacks are tried largest-first: val+test folds (the val fold
    is re-evaluated every epoch, F4_TRAIN.py:96-180, and the test fold
    streams during the FPS-measured test phase, F7_TEST2.py — r4's test
    phase ran at 17 patches/s purely on wire bytes), then val-only.
    ``CORRIFNET_DEVICE_DATA``: ``0`` kills it, ``1`` forces the full set
    (e.g. to exercise the path on CPU), unset = auto."""
    from corrifnet_tpu.data.dataset import DeviceDataset
    from corrifnet_tpu.train.loop import _wire_cast_enabled

    mode = os.environ.get("CORRIFNET_DEVICE_DATA", "auto")
    wire = _wire_cast_enabled(model)
    if mode == "0" or mesh is not None:
        return None
    indices, what = None, "dataset"
    if mode != "1":
        on_accel = jax.default_backend() not in ("cpu",)
        if not on_accel:
            return None
        mc = wire and DeviceDataset._masks_compressible(masks)
        if not DeviceDataset.fits_bytes(
                images.nbytes, masks.nbytes, wire, mask_compressible=mc):
            # byte math only — images[subset] would copy GBs host-side
            n_val = 0 if vlind is None else len(vlind)
            n_test = 0 if tsind is None else len(tsind)
            candidates = []
            if n_val and n_test:
                candidates.append(
                    (np.concatenate([np.asarray(vlind), np.asarray(tsind)]),
                     "val+test-fold"))
            if n_val:
                candidates.append((np.asarray(vlind), "val-fold"))
            for cand, label in candidates:
                frac = len(cand) / len(images) if len(images) else 0.0
                if DeviceDataset.fits_bytes(
                        int(images.nbytes * frac), int(masks.nbytes * frac),
                        wire, mask_compressible=mc):
                    indices, what = cand, label
                    break
            if indices is None:
                return None
    dd = DeviceDataset(images, masks, wire_cast=wire, indices=indices)
    print(f"device-resident {what}: {dd.nbytes / 1e9:.2f} GB on "
          f"{jax.devices()[0].platform}")
    return dd


def _read_curve(path):
    """One-float-per-line log file -> list (for resumed curve PNGs)."""
    if not Path(path).exists():
        return []
    return [float(ln) for ln in Path(path).read_text().split()]


def _write_summary_log(run_dir, cfg, begin, trind, vlind, test_jac, model):
    """Dated human-readable summary (F2_MAIN.py:258-287)."""
    a = datetime.datetime.now()
    path = Path(run_dir) / f"{a.year}_{a.month}_{a.day}_{a.hour}_{a.minute}.txt"
    with open(path, "w") as f:
        f.write("Date:" + str(datetime.date.today()) + "\n")
        f.write(f"Ending Time:{a.hour}:{a.minute}\n")
        f.write(f"Starting Time:{begin.hour}:{begin.minute}\n")
        f.write("Data set size:" + str(cfg.train_set_size) + "\n")
        f.write("Fold number:" + str(cfg.fno) + "\n")
        f.write("Fold number:" + str(cfg.fsiz) + "\n")
        f.write("Number of validation images:" + str(len(vlind)) + "\n")
        f.write("Number of training images:" + str(len(trind)) + "\n")
        f.write("Mini batch size:" + str(cfg.mini_batch_size) + "\n")
        f.write("Type of initialization:" + cfg.initialization + "\n")
        f.write("Test accuracy:" + str([test_jac]) + "\n")
        f.write("Learning rate:" + str(cfg.learn_rate) + "\n")
        f.write("Model version:" + str(cfg.modeltype) + "\n")
        f.write("Optimizer type:" + cfg.optimizer_type + "\n")
        f.write("Total number of epochs:" + str(cfg.n_epochs) + "\n")
        f.write("Training loss function:" + str(cfg.trainloss) + "\n")
        f.write("Validation loss function:" + str(cfg.validationloss) + "\n")
        f.write("Accuracy function:" + str(cfg.accuracy) + "\n")
        f.write("Channel index:" + str(cfg.chindex) + "\n")
        f.write("Transfer:" + str(cfg.transfertype) + "\n")
        f.write("Model Summary:\n" + repr(model) + "\n")


def _write_curves(run_dir, history):
    """learning/accuracy curve PNGs (F2_MAIN.py:290-304)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    plt.figure()
    plt.plot(history["train_loss"], "k-", label="Train Loss")
    plt.plot(history["val_loss"], "r--", label="Validation Loss")
    plt.title("Learning Curves")
    plt.legend(loc="upper left")
    plt.savefig(Path(run_dir) / "learning_curves.png")
    plt.close()
    plt.figure()
    plt.plot(history["train_jac"], "k-", label="Train Accuracy")
    plt.plot(history["val_jac"], "r--", label="Validation Accuracy")
    plt.title("Accuracy Curves")
    plt.legend(loc="upper left", bbox_to_anchor=(1, 1))
    plt.savefig(Path(run_dir) / "accuracy_curves.png", bbox_inches="tight")
    plt.close()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config",
                    help="config file; with --indices, a template containing "
                         "{i} (the reference's ../../experiments/model{i}.txt "
                         "loop, F2_MAIN.py:60-62)")
    ap.add_argument("--run-root", default=".")
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--indices", default=None,
                    help="comma-separated experiment indices, e.g. 0,1,2")
    ap.add_argument("--synthetic-seed", type=int, default=None)
    ap.add_argument("--resume", default=None, metavar="RUN_DIR",
                    help="continue an interrupted run in-place from its "
                         "state{i} extended checkpoint (requires the run to "
                         "have been started with extended_checkpoints=true)")
    ap.add_argument("--train-deadline-s", type=float, default=None,
                    help="wall-clock budget for TRAINING: past it, stop at "
                         "the next epoch boundary (fully logged, resumable) "
                         "and proceed to the test phase")
    args = ap.parse_args(argv)
    if not args.config:
        ap.error("--config is required")
    if args.resume and args.indices:
        ap.error("--resume takes a single run directory; use --index")

    indices = (
        [int(i) for i in args.indices.split(",")] if args.indices else [args.index]
    )
    results = {}
    for i in indices:
        cfg_path = args.config.format(i=i) if "{i}" in args.config else args.config
        cfg = load_config(cfg_path)
        if args.synthetic_seed is not None:
            cfg.synthetic_seed = args.synthetic_seed
        result = run_experiment(cfg, args.run_root, i, resume_dir=args.resume,
                                deadline_s=args.train_deadline_s)
        print(f"[model{i}] test jaccard:", result["test_jaccard"],
              "fps:", result["fps"])
        results[i] = result
    return results if args.indices else results[indices[0]]


if __name__ == "__main__":
    main()
