"""Training / validation / test loops (reference: F4_TRAIN.py, F7_TEST2.py).

Epoch flow mirrors ``train_model`` (F4_TRAIN.py:39-86): per epoch the
(epoch-start-stepped) StepLR value is logged, every batch runs one jitted
train step accumulating batch losses and batchLoad-weighted Jaccard2, the
epoch checkpoint ``iremmodel{i}`` is written, and validation runs; after all
epochs ``Finaliremmodel{i}`` is saved. Validation reproduces the reference's
restore-every-epoch semantics (``validate`` reloads the just-saved
checkpoint into a fresh state, F4_TRAIN.py:96-180) behind
``val_from_checkpoint`` (default True for parity; False skips the disk
round-trip).

Test (F7_TEST2.py:38-184) restores the final checkpoint, accumulates
loss/Jaccard over the test fold, measures wall-clock FPS (the reference
started a timer at F7_TEST2.py:135 but never wrote fpsfile.txt — here the
FPS is actually written), and returns the first batch's outputs for
visualization (segplot hook).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import os

from corrifnet_tpu.data.dataset import device_prefetch, make_batches
from corrifnet_tpu.train.checkpoint import (
    Checkpointer,
    epoch_ckpt_name,
    final_ckpt_name,
)
from corrifnet_tpu.train.schedule import step_lr, step_lr_reported
from corrifnet_tpu.train.state import (
    TrainState,
    make_eval_step,
    make_train_step,
)
from corrifnet_tpu.utils.logfiles import RunLogs

__all__ = ["train_model", "validate", "test_model", "default_dropout_key"]


def default_dropout_key(seed: int = 0):
    """Base RNG key for the training dropout stream.

    On TPU the default impl is ``rbg`` (XLA RngBitGenerator — the hardware
    PRNG): generating the four per-transformer dropout masks with software
    threefry measured 1.9 ms/step of device time at B=8 (2.5% of the
    MMVit4 train step), all recovered by rbg. Elsewhere (CPU tests,
    goldens) the JAX default threefry2x32 is kept. Override with
    ``CORRIFNET_RNG_IMPL``. Dropout is stochastic regularization — the
    impl changes the sampled masks' bits, not their distribution; runs
    remain deterministic for a fixed impl+seed+program."""
    impl = os.environ.get("CORRIFNET_RNG_IMPL")
    if impl is None:
        # Same TPU predicate as ops/: tunneled TPU backends register under
        # their plugin name (e.g. 'axon'), not 'tpu'.
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        impl = "rbg" if on_tpu else "threefry2x32"
    return jax.random.key(seed, impl=impl)


def _wire_cast_enabled(model) -> bool:
    """Host->device wire casting (data.dataset.wire_cast_batch) is exact
    only when the model's first op casts to bf16 anyway — gate on the
    compute dtype. CORRIFNET_WIRE_CAST=0 kills it."""
    return (
        os.environ.get("CORRIFNET_WIRE_CAST", "1") == "1"
        and getattr(model, "dtype", None) == jnp.bfloat16
    )


def _run_eval(eval_step, params, batch_stats, images, masks, indices, batch_size,
              lim, wire_cast=False, device_data=None):
    """Shared eval loop: (mean loss, weighted Jaccard, first-batch outputs)."""
    if len(indices) == 0:
        raise ValueError(
            "empty evaluation index list (e.g. valRatio rounds the val split "
            "to 0 samples) — nothing to evaluate"
        )
    losses, jI, total = [], 0.0, 0.0
    first_outputs = None
    prev = None  # one-deep pipeline: fetch batch i-1 while i executes

    def drain():
        nonlocal jI, total, first_outputs, prev
        if prev is None:
            return
        m, prev = prev, None
        losses.append(float(m["loss"]))
        n_valid = float(m["n_valid"])
        batch_load = n_valid * lim * lim
        jI += float(m["jaccard"]) * batch_load
        total += batch_load
        if first_outputs is None:
            first_outputs = np.asarray(m["outputs"])

    if device_data is not None and device_data.covers(indices):
        source = device_data.batches(indices, batch_size)
        device_data_used = True
    else:
        source = make_batches(images, masks, indices, batch_size)
        device_data_used = False
    for batch in source:
        if wire_cast and not device_data_used:
            from corrifnet_tpu.data.dataset import wire_cast_batch

            batch = wire_cast_batch(batch)
        m = eval_step(params, batch_stats, batch.images, batch.masks, batch.valid)
        drain()
        prev = m
    drain()
    return float(np.mean(losses)), jI / total, first_outputs


def validate(
    eval_step,
    state: TrainState,
    images,
    masks,
    vlind,
    batch_size,
    lim,
    logs: Optional[RunLogs],
    ckpt: Optional[Checkpointer] = None,
    i: int = 0,
    val_from_checkpoint: bool = True,
    wire_cast: bool = False,
    device_data=None,
):
    """F4_TRAIN.py:90-208. Optionally restores the epoch checkpoint from
    disk (the reference's accidental end-to-end save/load test, :180)."""
    params, batch_stats = state.params, state.batch_stats
    if val_from_checkpoint and ckpt is not None:
        params, batch_stats = ckpt.restore(
            epoch_ckpt_name(i), {"params": params, "batch_stats": batch_stats}
        )
    val_loss, val_jac, _ = _run_eval(
        eval_step, params, batch_stats, images, masks, vlind, batch_size, lim,
        wire_cast=wire_cast, device_data=device_data,
    )
    if logs is not None:
        logs.val.write(str(val_loss) + "\n")
        logs.valacc.write(str(val_jac) + "\n")
        logs.lr.write("Validation loss:" + str(val_loss) + "\n")
        logs.lr.write("Validation accuracy:" + str(val_jac) + "\n")
    print("Validation Jaccard:", val_jac)
    return val_loss, val_jac


def _with_kernel_mesh(fn, mesh):
    """Enter the ambient kernel-mesh context (ops/meshctx.py) around each
    call of a step function, so Pallas call sites traced inside the jitted
    program wrap themselves in batch-sharded shard_map islands. No mesh:
    the function is returned unchanged."""
    if mesh is None:
        return fn
    import functools

    from corrifnet_tpu.ops.meshctx import kernel_mesh

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with kernel_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def train_model(
    model,
    state: TrainState,
    optimizer,
    n_epochs: int,
    learn_rate: float,
    step_size: int,
    gamma: float,
    images,
    masks,
    trind,
    vlind,
    batch_size: int,
    lim: int,
    logs: Optional[RunLogs],
    ckpt: Optional[Checkpointer],
    i: int = 0,
    rng=None,
    val_from_checkpoint: bool = True,
    checkpoint_every_epoch: bool = True,
    mesh=None,
    start_epoch: int = 0,
    extended_checkpoints: bool = False,
    chain_steps: int = 1,
    auto_layout: bool = False,  # opt-in since round 4 (see config.py)
    deadline: Optional[float] = None,
    device_data=None,
):
    """F4_TRAIN.py:39-86 equivalent. Returns the final TrainState.

    ``chain_steps=K`` dispatches K optimizer steps per device call
    (``make_train_multi_step`` — one lax.scan program, verified equal to
    K single steps): through a tunneled/remote TPU attach each dispatch
    costs a 30-40 ms host round trip, ~40% of a real DSTL epoch at K=1.
    Metrics are still recorded per step. The dropout stream differs from
    K=1 (step keys fold from the chunk key), so the default preserves the
    reference-equivalent stream; single-device only (ignored with mesh).

    With ``mesh`` (a ('data','model') jax.sharding.Mesh) the state is
    sharded by the tensor-parallel rules and batches ride the data axis —
    XLA inserts the gradient psums/all-gathers (SPMD; new capability vs the
    single-GPU reference, SURVEY §5.8).

    True resume (capability the reference lacks — it only saves weights,
    F4_TRAIN.py:84): with ``extended_checkpoints`` the full TrainState
    (params + optimizer moments + step) is saved each epoch as
    ``state{i}``; restore it with ``Checkpointer.restore_state`` and pass
    ``start_epoch`` to continue bitwise-identically — the per-epoch RNG is
    folded from the base key and the epoch index, so the dropout stream
    does not depend on how many epochs ran in this process.

    ``deadline`` (absolute ``time.monotonic()`` value) stops training at
    the first EPOCH BOUNDARY past it — the epoch's logs, per-epoch
    checkpoint, validation and ``state{i}`` resume checkpoint have all
    been written, so the run is complete-so-far and resumable; the
    caller proceeds to the test phase as usual. At least one epoch
    always runs. New capability vs the reference (whose interrupted runs
    lose everything, F4_TRAIN.py:39-86) — it turns a wall-clock budget
    into a bounded, fully-logged, resumable protocol prefix."""
    rng = rng if rng is not None else default_dropout_key(0)
    batch_sh = None
    if mesh is not None:
        from corrifnet_tpu.parallel import batch_sharding, shard_state

        state = shard_state(state, mesh)
        batch_sh = batch_sharding(mesh)
    # XLA-chosen state layouts kill the ~8 ms/step of param/grad layout
    # copies around the conv backward (NOTES.md); single-device only —
    # under a mesh the sharding layer owns placement. One slot is shared
    # by the chain and tail executables so the state layout is stable.
    slot = None
    if auto_layout and mesh is None:
        from corrifnet_tpu.train.state import LayoutSlot

        slot = LayoutSlot()
    train_step = _with_kernel_mesh(
        make_train_step(model, optimizer, auto_layout=slot), mesh)
    multi_step = None
    if chain_steps > 1 and mesh is not None:
        import warnings

        warnings.warn(
            "chain_steps is single-device only and is ignored when a mesh "
            "is configured — running one optimizer step per dispatch",
            stacklevel=2,
        )
    elif chain_steps > 1:
        from corrifnet_tpu.train.state import make_train_multi_step

        multi_step = make_train_multi_step(model, optimizer, auto_layout=slot)
    eval_step = _with_kernel_mesh(make_eval_step(model), mesh)
    wire_cast = _wire_cast_enabled(model)

    history = {"train_loss": [], "train_jac": [], "val_loss": [], "val_jac": []}
    for epoch in range(start_epoch, n_epochs):
        epoch_rng = jax.random.fold_in(rng, epoch)
        lr = step_lr(learn_rate, step_size, gamma, epoch)
        lr_rep = step_lr_reported(learn_rate, step_size, gamma, epoch)
        print("Epoch:", epoch, "LR:", [lr_rep])
        if logs is not None:
            logs.lr.write(f"Epoch: {epoch} LR: [{lr_rep}]\n")
            logs.lr.write(
                str({
                    "step_size": step_size, "gamma": gamma,
                    "base_lrs": [learn_rate], "last_epoch": epoch + 1,
                    "_last_lr": [lr],
                }) + "\n"
            )

        batch_losses, jI, total = [], 0.0, 0.0

        def record(loss, jac, n_valid):
            nonlocal jI, total
            batch_losses.append(loss)
            batch_load = n_valid * lim * lim
            jI += jac * batch_load
            total += batch_load

        # One-deep metric pipeline: dispatch chunk i, THEN fetch chunk
        # i-1's metrics to the host — the device computes i during the
        # 30-40 ms tunnel round trip instead of idling. At most two
        # un-synced dispatches are ever in flight (the axon attach
        # tolerates ~5). Record order is unchanged.
        inflight = None  # (device metrics, steps in the chunk)

        def drain():
            nonlocal inflight
            if inflight is None:
                return
            ms, k = inflight
            inflight = None
            if k > 1:
                losses = np.asarray(ms["loss"], np.float64)
                jacs = np.asarray(ms["jaccard"], np.float64)
                nvs = np.asarray(ms["n_valid"], np.float64)
                for j in range(k):
                    record(float(losses[j]), float(jacs[j]), float(nvs[j]))
            else:
                record(float(ms["loss"]), float(ms["jaccard"]),
                       float(ms["n_valid"]))

        def run_chunk(chunk):
            nonlocal state, epoch_rng, inflight
            epoch_rng, sub = jax.random.split(epoch_rng)
            if multi_step is not None and len(chunk) > 1:
                state, ms = multi_step(
                    state,
                    jnp.stack([b.images for b in chunk]),
                    jnp.stack([b.masks for b in chunk]),
                    jnp.stack([b.valid for b in chunk]),
                    lr,
                    sub,
                )
                k = len(chunk)
            else:
                (b,) = chunk
                state, ms = train_step(
                    state, b.images, b.masks, b.valid, lr, sub
                )
                k = 1
            drain()  # previous chunk's metrics, while this one executes
            inflight = (ms, k)

        if (device_data is not None and mesh is None
                and device_data.covers(trind)):
            # device-RESIDENT data: batches gather on-chip, nothing rides
            # the wire (data/dataset.py DeviceDataset). A subset-resident
            # dataset (e.g. val-fold-only) streams here and serves eval.
            source = device_data.batches(trind, batch_size)
        else:
            source = device_prefetch(
                make_batches(images, masks, trind, batch_size),
                sharding=batch_sh, wire_cast=wire_cast,
            )
        pending = []
        for batch in source:
            if multi_step is None:
                run_chunk([batch])
                continue
            pending.append(batch)
            if len(pending) == chain_steps:
                run_chunk(pending)
                pending = []
        for b in pending:  # tail: padded shapes match, but run singly
            run_chunk([b])
        drain()

        train_loss = float(np.mean(batch_losses))
        train_jac = jI / total
        history["train_loss"].append(train_loss)
        history["train_jac"].append(train_jac)
        if logs is not None:
            logs.train.write(str(train_loss) + "\n")
            logs.trainacc.write(str(train_jac) + "\n")
            logs.trainepoch.write(str(epoch) + "\n")
            logs.lr.write("Training loss:" + str(train_loss) + "\n")
            logs.lr.write("Training accuracy:" + str(train_jac) + "\n")
        print("Training Jaccard:", train_jac, " (epoch:", epoch, ")")

        if checkpoint_every_epoch and ckpt is not None:
            ckpt.save(epoch_ckpt_name(i), state.params, state.batch_stats)
        val_loss, val_jac = validate(
            eval_step, state, images, masks, vlind, batch_size, lim, logs,
            ckpt if checkpoint_every_epoch else None, i, val_from_checkpoint,
            wire_cast=wire_cast,
            device_data=device_data if mesh is None else None,
        )
        history["val_loss"].append(val_loss)
        history["val_jac"].append(val_jac)
        if logs is not None:
            logs.flush()
        # The extended (resume) checkpoint is written LAST, after the
        # epoch's log lines are flushed — so ``state{i}`` always marks a
        # fully-logged epoch and run.main --resume can truncate any
        # partial epoch an interrupted process left behind.
        if checkpoint_every_epoch and ckpt is not None and extended_checkpoints:
            ckpt.save_state(f"state{i}", state)
        if deadline is not None and time.monotonic() >= deadline:
            hint = (
                "resume with run.main --resume"
                if extended_checkpoints and checkpoint_every_epoch
                and ckpt is not None
                else "not resumable (extended_checkpoints is off — no "
                     "state{i} was written)"
            )
            msg = (f"deadline reached after epoch {epoch} "
                   f"({epoch + 1}/{n_epochs} epochs) — stopping; {hint}")
            print(msg)
            if logs is not None:
                logs.lr.write(msg + "\n")
            break

    if ckpt is not None:
        ckpt.save(final_ckpt_name(i), state.params, state.batch_stats)
    return state, history


def test_model(
    model,
    state_template: TrainState,
    images,
    masks,
    tsind,
    batch_size,
    lim,
    logs: Optional[RunLogs],
    ckpt: Optional[Checkpointer],
    i: int = 0,
    device_data=None,
):
    """F7_TEST2.py:38-184 equivalent: restore Finaliremmodel{i}, evaluate,
    write testFile/testaccFile + FPS, return first-batch outputs."""
    eval_step = make_eval_step(model)
    params, batch_stats = state_template.params, state_template.batch_stats
    if ckpt is not None and ckpt.exists(final_ckpt_name(i)):
        params, batch_stats = ckpt.restore(
            final_ckpt_name(i), {"params": params, "batch_stats": batch_stats}
        )
    start = time.time()
    test_loss, test_jac, first_outputs = _run_eval(
        eval_step, params, batch_stats, images, masks, tsind, batch_size, lim,
        wire_cast=_wire_cast_enabled(model), device_data=device_data,
    )
    elapsed = time.time() - start
    fps = len(tsind) / elapsed if elapsed > 0 else 0.0
    if logs is not None:
        logs.test.write(str(test_loss) + "\n")
        logs.testacc.write(str(test_jac) + "\n")
        if ckpt is not None:
            with open(ckpt.run_dir / "fpsfile.txt", "w") as f:
                f.write(str(fps) + "\n")
    print("Test Jaccard:", test_jac, "FPS:", fps)
    return test_loss, test_jac, fps, first_outputs
