"""Training-loop integration: log files, checkpoint round-trip, LR schedule
application, masked metrics, and overfit-one-batch convergence — using a
tiny stand-in model so the loop mechanics run fast on CPU."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as fnn

from corrifnet_tpu.data import synthetic_dstl
from corrifnet_tpu.train import (
    Checkpointer,
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train_model,
)
from corrifnet_tpu.train import test_model as run_test_model
from corrifnet_tpu.utils.logfiles import RunLogs


class TinySeg(fnn.Module):
    """Minimal 5-D-in / 5-D-out sigmoid model mirroring zoo I/O contracts."""

    @fnn.compact
    def __call__(self, x, train: bool = True):
        b, m, c, h, w = x.shape
        y = jnp.moveaxis(x.reshape(b, m * c, h, w), 1, -1)  # NHWC
        y = fnn.Conv(8, (3, 3), padding="SAME")(y)
        y = jax.nn.relu(y)
        y = fnn.Conv(3, (1, 1))(y)
        y = jax.nn.sigmoid(y)
        return jnp.moveaxis(y, -1, 1)[:, :, None, :, :]  # (B,3,1,H,W)


@pytest.fixture
def setup():
    # function-scoped: train steps donate (and thus delete) the state buffers
    lim = 16
    data = synthetic_dstl(12, lim=lim, seed=0)
    model = TinySeg()
    optimizer = make_optimizer("Adam")
    state = init_state(
        model, jax.random.PRNGKey(0), jnp.asarray(data.images[:2]), optimizer
    )
    return data, model, optimizer, state, lim


def test_train_writes_logs_and_checkpoints(setup, tmp_path):
    data, model, optimizer, state, lim = setup
    trind, vlind, tsind = np.arange(8), np.arange(8, 10), np.arange(10, 12)
    logs = RunLogs.open(tmp_path)
    ckpt = Checkpointer(tmp_path)
    state2, history = train_model(
        model, state, optimizer,
        n_epochs=2, learn_rate=1e-3, step_size=5, gamma=0.9,
        images=data.images, masks=data.masks, trind=trind, vlind=vlind,
        batch_size=3, lim=lim, logs=logs, ckpt=ckpt, i=0,
        rng=jax.random.PRNGKey(1),
    )
    test_loss, test_jac, fps, outs = run_test_model(
        model, state2, data.images, data.masks, tsind, 3, lim, logs, ckpt, i=0
    )
    logs.close()
    ckpt.close()

    for name in ["trainFile", "valFile", "trainaccFile", "valaccFile",
                 "trainepochFile", "lrFile", "testFile", "testaccFile",
                 "fpsfile"]:
        assert (tmp_path / f"{name}.txt").exists(), name
    assert len((tmp_path / "trainFile.txt").read_text().splitlines()) == 2
    assert (tmp_path / "iremmodel0").exists()
    assert (tmp_path / "Finaliremmodel0").exists()
    assert np.isfinite(test_loss) and 0 <= test_jac <= 1
    assert outs.shape == (3, 3, 1, lim, lim)
    # loss is BCE(double sigmoid): sits in the reference's ~0.5-0.9 band
    assert 0.4 < test_loss < 1.0


def test_checkpoint_roundtrip_changes_nothing(setup, tmp_path):
    data, model, optimizer, state, lim = setup
    ckpt = Checkpointer(tmp_path)
    ckpt.save("iremmodel7", state.params, state.batch_stats)
    params, batch_stats = ckpt.restore(
        "iremmodel7", {"params": state.params, "batch_stats": state.batch_stats}
    )
    ckpt.close()
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overfit_one_batch(setup):
    """End-to-end optimization sanity: loss must fall materially and the
    prediction must separate positive from negative pixels.

    Note the reference's double-sigmoid loss (F4_TRAIN.py:58-60 on sigmoid
    outputs) squashes gradients by ~sigma'(sigma(z)), so soft-Jaccard rises
    slowly by construction — the committed run needed 70 epochs. This test
    checks gradient flow/direction, not final accuracy."""
    data, model, optimizer, state, lim = setup
    images = jnp.asarray(data.images[:4])
    masks = jnp.asarray(data.masks[:4])
    valid = jnp.ones((4,), jnp.float32)
    step = make_train_step(model, optimizer)
    ev = make_eval_step(model)
    rng = jax.random.PRNGKey(0)
    first_loss = None
    for it in range(400):
        state, m = step(state, images, masks, valid, 1e-2, rng)
        if first_loss is None:
            first_loss = float(m["loss"])
    final_loss = float(m["loss"])
    assert final_loss < first_loss - 0.15, (first_loss, final_loss)

    out = ev(state.params, state.batch_stats, images, masks, valid)["outputs"]
    pos = np.asarray(out)[np.asarray(masks) > 0.5]
    neg = np.asarray(out)[np.asarray(masks) < 0.5]
    assert pos.mean() > neg.mean() + 0.05, (pos.mean(), neg.mean())


def test_padded_batch_metrics_match_unpadded(setup):
    """Metrics from a padded batch must equal the unpadded computation."""
    data, model, optimizer, state, lim = setup
    ev = make_eval_step(model)
    im, ma = jnp.asarray(data.images[:2]), jnp.asarray(data.masks[:2])
    pad_im = jnp.concatenate([im, jnp.zeros_like(im)])
    pad_ma = jnp.concatenate([ma, jnp.zeros_like(ma)])
    valid = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    m_pad = ev(state.params, state.batch_stats, pad_im, pad_ma, valid)
    m_ref = ev(state.params, state.batch_stats, im, ma, jnp.ones((2,)))
    np.testing.assert_allclose(
        float(m_pad["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_pad["jaccard"]), float(m_ref["jaccard"]), rtol=1e-5
    )


def test_extended_checkpoint_resume(setup, tmp_path):
    """save_state/restore_state round-trips optimizer state (true resume)."""
    data, model, optimizer, state, lim = setup
    images = jnp.asarray(data.images[:4])
    masks = jnp.asarray(data.masks[:4])
    valid = jnp.ones((4,), jnp.float32)
    step = make_train_step(model, optimizer)
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        state, _ = step(state, images, masks, valid, 1e-3, rng)

    ckpt = Checkpointer(tmp_path)
    ckpt.save_state("full0", state)

    # fresh template, restore, continue — must equal continuing the original
    template = init_state(
        model, jax.random.PRNGKey(9), images, make_optimizer("Adam")
    )
    restored = ckpt.restore_state("full0", template)
    assert int(restored.step) == 3
    cont_a, ma = step(restored, images, masks, valid, 1e-3, rng)
    state_b = ckpt.restore_state("full0", init_state(
        model, jax.random.PRNGKey(11), images, make_optimizer("Adam")))
    cont_b, mb = step(state_b, images, masks, valid, 1e-3, rng)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(cont_a.params), jax.tree.leaves(cont_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_kill_and_resume_matches_uninterrupted(setup, tmp_path):
    """Train 3 epochs straight vs train 2, 'kill', restore the extended
    checkpoint, resume epoch 2 -> identical final params and metrics
    (true resume — capability the reference lacks, F4_TRAIN.py:84)."""
    data, model, optimizer, _, lim = setup
    trind, vlind = np.arange(8), np.arange(8, 10)
    base_rng = jax.random.PRNGKey(42)

    def fresh_state():
        return init_state(
            model, jax.random.PRNGKey(0), jnp.asarray(data.images[:2]), optimizer
        )

    kw = dict(
        learn_rate=1e-3, step_size=5, gamma=0.9, images=data.images,
        masks=data.masks, trind=trind, vlind=vlind, batch_size=3, lim=lim,
        logs=None, i=0, rng=base_rng, val_from_checkpoint=False,
        # pinned ON: the resume x auto-layout interaction (the r3 canary
        # aliasing crash) must stay covered now the default is off
        auto_layout=True,
    )

    ck_a = Checkpointer(tmp_path / "a")
    state_a, hist_a = train_model(
        model, fresh_state(), optimizer, n_epochs=3, ckpt=ck_a,
        extended_checkpoints=True, **kw
    )
    ck_a.close()

    ck_b = Checkpointer(tmp_path / "b")
    state_b, _ = train_model(
        model, fresh_state(), optimizer, n_epochs=2, ckpt=ck_b,
        extended_checkpoints=True, **kw
    )
    del state_b  # "kill": only the on-disk extended checkpoint survives
    resumed = ck_b.restore_state("state0", fresh_state())
    state_b2, hist_b2 = train_model(
        model, resumed, optimizer, n_epochs=3, ckpt=ck_b, start_epoch=2,
        extended_checkpoints=True, **kw
    )
    ck_b.close()

    np.testing.assert_allclose(hist_a["train_loss"][2], hist_b2["train_loss"][0], rtol=0)
    np.testing.assert_allclose(hist_a["val_jac"][2], hist_b2["val_jac"][0], rtol=0)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_style_noise_model_traces_through_pipeline_steps():
    """RobustMseg(style_noise=True) draws a 'style_noise' RNG stream even
    in eval mode (the reference's valid=True path) — init_state,
    make_train_step and make_eval_step must all supply it. Trace-level
    check (eval_shape): a missing stream raises flax InvalidRngError at
    trace time."""
    from corrifnet_tpu.models.robustseg import RobustMseg
    from corrifnet_tpu.train import init_state, make_optimizer
    from corrifnet_tpu.train.state import make_eval_step, make_train_step

    model = RobustMseg(style_noise=True)
    images = jnp.zeros((1, 3, 3, 32, 32), jnp.float32)
    masks = jnp.zeros((1, 3, 1, 32, 32), jnp.float32)
    valid = jnp.ones((1,), jnp.float32)
    opt = make_optimizer("Adam")
    state = init_state(model, jax.random.PRNGKey(0), images, opt)

    train_step = make_train_step(model, opt)
    jax.eval_shape(
        train_step, state, images, masks, valid, 1e-4, jax.random.PRNGKey(1)
    )
    eval_step = make_eval_step(model)
    jax.eval_shape(eval_step, state.params, state.batch_stats, images, masks, valid)


def test_multi_step_matches_sequential_single_steps(setup):
    """make_train_multi_step(k) runs the same computation as k sequential
    make_train_step calls with rng = fold_in(base, i). The two compile as
    different XLA programs (scan body vs standalone step), so f32
    reassociation differences of ~1e-6 appear — tight allclose, not
    bitwise."""
    from corrifnet_tpu.train import make_train_multi_step

    data, model, optimizer, state, lim = setup
    k, bsz = 3, 4
    rng = np.random.default_rng(1)
    images = jnp.asarray(data.images[:bsz])[None].repeat(k, axis=0)
    images = images + jnp.asarray(
        rng.normal(0, 0.1, images.shape).astype(np.float32)
    )
    masks = jnp.asarray(data.masks[:bsz])[None].repeat(k, axis=0)
    valid = jnp.ones((k, bsz), jnp.float32)
    base = jax.random.PRNGKey(5)

    single = make_train_step(model, optimizer)
    st_a = state
    seq_metrics = []
    for i in range(k):
        st_a, m = single(
            st_a, images[i], masks[i], valid[i], 1e-3,
            jax.random.fold_in(base, i),
        )
        seq_metrics.append(m)

    # fresh identical state (the first chain donated its buffers)
    _, model2, optimizer2, state2, _ = (
        data, model, optimizer,
        init_state(model, jax.random.PRNGKey(0),
                   jnp.asarray(data.images[:2]), optimizer), lim,
    )
    multi = make_train_multi_step(model2, optimizer2)
    st_b, ms = multi(state2, images, masks, valid, 1e-3, base)

    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )
    for i in range(k):
        np.testing.assert_allclose(
            np.asarray(seq_metrics[i]["loss"]), np.asarray(ms["loss"])[i],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(seq_metrics[i]["jaccard"]), np.asarray(ms["jaccard"])[i],
            rtol=1e-4,
        )


def test_chain_steps_matches_single_dispatch(setup, tmp_path):
    """chain_steps=2 (multi-step dispatch) reproduces the K=1 loop's
    training history on a dropout-free model: the RNG stream only feeds
    dropout, so chained and single runs see identical math up to the
    scanned program's f32 reassociation (state.py multi-step contract)."""
    data, model, optimizer, state, lim = setup
    trind, vlind = np.arange(8), np.arange(8, 10)

    def run(st, k):
        return train_model(
            model, st, optimizer,
            n_epochs=2, learn_rate=1e-3, step_size=5, gamma=0.9,
            images=data.images, masks=data.masks, trind=trind, vlind=vlind,
            batch_size=3,  # 8 samples / 3 -> chunks of 2 + a tail batch
            lim=lim, logs=None, ckpt=None,
            val_from_checkpoint=False, checkpoint_every_epoch=False,
            rng=jax.random.PRNGKey(5), chain_steps=k,
        )

    _, hist1 = run(state, 1)
    state_b = init_state(
        model, jax.random.PRNGKey(0), jnp.asarray(data.images[:2]), optimizer
    )
    _, hist2 = run(state_b, 2)
    for key in ("train_loss", "train_jac", "val_loss", "val_jac"):
        np.testing.assert_allclose(hist1[key], hist2[key], rtol=2e-5, atol=2e-6)


def test_auto_layout_matches_default_layout(setup, tmp_path):
    """train_model with auto_layout=True (AOT step, XLA-chosen state
    layouts, train/state.py _AutoLayoutStep) reproduces the plain-jit
    history. On CPU the compiler picks default layouts, so the programs
    are identical — exact history match; the point is the AOT wrapper's
    call/donate/restore mechanics, which the TPU run then reuses."""
    data, model, optimizer, state, lim = setup
    trind, vlind = np.arange(8), np.arange(8, 10)
    common = dict(
        n_epochs=2, learn_rate=1e-3, step_size=5, gamma=0.9,
        images=data.images, masks=data.masks, trind=trind, vlind=vlind,
        batch_size=3, lim=lim, logs=None, ckpt=None, i=0,
        rng=jax.random.PRNGKey(1), val_from_checkpoint=False,
    )
    _, hist_auto = train_model(
        model, state, optimizer, auto_layout=True, **common)
    state_b = init_state(
        model, jax.random.PRNGKey(0), jnp.asarray(data.images[:2]), optimizer)
    _, hist_plain = train_model(
        model, state_b, optimizer, auto_layout=False, **common)
    for key in ["train_loss", "train_jac", "val_loss", "val_jac"]:
        np.testing.assert_allclose(hist_auto[key], hist_plain[key], rtol=1e-6)


def test_wire_cast_batch_semantics():
    """wire_cast_batch: images f32->bf16, binary masks ->uint8, non-binary
    masks untouched (data/dataset.py — tunneled-TPU transfer bytes)."""
    import ml_dtypes

    from corrifnet_tpu.data.dataset import Batch, wire_cast_batch

    im = np.random.default_rng(0).normal(size=(2, 3, 3, 8, 8)).astype(np.float32)
    binary = (np.random.default_rng(1).random((2, 3, 1, 8, 8)) > 0.5).astype(
        np.float32
    )
    valid = np.ones((2,), np.float32)
    b = wire_cast_batch(Batch(im, binary, valid))
    assert b.images.dtype == ml_dtypes.bfloat16
    assert b.masks.dtype == np.uint8
    np.testing.assert_array_equal(b.masks.astype(np.float32), binary)
    np.testing.assert_array_equal(
        b.images, im.astype(ml_dtypes.bfloat16)
    )
    assert b.valid.dtype == np.float32

    soft = binary * 0.5  # non-binary: must pass through untouched
    b2 = wire_cast_batch(Batch(im, soft, valid))
    assert b2.masks.dtype == np.float32
    np.testing.assert_array_equal(b2.masks, soft)


class TinySegBf16(fnn.Module):
    """bf16-compute variant: first op casts the input, like the zoo models."""

    dtype: object = jnp.bfloat16

    @fnn.compact
    def __call__(self, x, train: bool = True):
        b, m, c, h, w = x.shape
        y = jnp.moveaxis(x.reshape(b, m * c, h, w), 1, -1).astype(self.dtype)
        y = fnn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = fnn.Conv(3, (1, 1), dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y.astype(jnp.float32))
        return jnp.moveaxis(y, -1, 1)[:, :, None, :, :]


def test_wire_cast_training_is_bit_identical(tmp_path, monkeypatch):
    """For a bf16-compute model the host-side wire cast must not change a
    single bit of the trained weights or metrics: the same RTNE f32->bf16
    cast happens either host-side (before the wire) or device-side (the
    model's first op)."""
    lim = 16
    data = synthetic_dstl(12, lim=lim, seed=0)
    trind, vlind = np.arange(8), np.arange(8, 10)

    def run(wire: str):
        monkeypatch.setenv("CORRIFNET_WIRE_CAST", wire)
        model = TinySegBf16()
        optimizer = make_optimizer("Adam")
        state = init_state(
            model, jax.random.PRNGKey(0), jnp.asarray(data.images[:2]),
            optimizer,
        )
        state2, history = train_model(
            model, state, optimizer,
            n_epochs=2, learn_rate=1e-3, step_size=5, gamma=0.9,
            images=data.images, masks=data.masks, trind=trind, vlind=vlind,
            batch_size=3, lim=lim, logs=None, ckpt=None, i=0,
            rng=jax.random.PRNGKey(1), val_from_checkpoint=False,
        )
        return state2, history

    s_on, h_on = run("1")
    s_off, h_off = run("0")
    assert h_on == h_off
    for a, b in zip(jax.tree.leaves(s_on.params), jax.tree.leaves(s_off.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_dataset_batches_match_host_batcher():
    """DeviceDataset's on-chip gather must produce the host batcher's exact
    padded batches (incl. zeroed padding rows) in both dtypes paths."""
    from corrifnet_tpu.data.dataset import (
        Batch, DeviceDataset, batch_iterator, wire_cast_batch,
    )

    rng = np.random.default_rng(0)
    images = rng.normal(size=(7, 3, 3, 8, 8)).astype(np.float32)
    masks = (rng.random((7, 3, 1, 8, 8)) > 0.5).astype(np.float32)
    indices = np.array([3, 0, 6, 2, 5])  # 5 samples, batch 2 -> padded tail

    for wire in (False, True):
        dd = DeviceDataset(images, masks, wire_cast=wire)
        got = list(dd.batches(indices, 2))
        want = list(batch_iterator(images, masks, indices, 2))
        if wire:
            want = [wire_cast_batch(b) for b in want]
        assert len(got) == len(want) == 3
        for g, w in zip(got, want):
            assert np.asarray(g.images).dtype == w.images.dtype
            assert np.asarray(g.masks).dtype == w.masks.dtype
            np.testing.assert_array_equal(np.asarray(g.images), w.images)
            np.testing.assert_array_equal(np.asarray(g.masks), w.masks)
            np.testing.assert_array_equal(g.valid, w.valid)


def test_device_dataset_run_experiment_matches_streaming(tmp_path, monkeypatch):
    """The full driver with CORRIFNET_DEVICE_DATA=1 must reproduce the
    streaming run's metrics exactly (bf16 model: same casts either way)."""
    from corrifnet_tpu.config import ExperimentConfig
    from corrifnet_tpu.data import write_permutation
    from corrifnet_tpu.models import registry
    from corrifnet_tpu.run.main import run_experiment
    import corrifnet_tpu.data.crossval as cv

    registry._REGISTRY["TinySegBf16"] = registry.ModelSpec(
        "TinySegBf16", TinySegBf16, "5d", "test stand-in", True
    )
    write_permutation(24, tmp_path, seed=0)
    old = cv._SPLITS_DIR
    cv._SPLITS_DIR = tmp_path
    try:
        def run(mode, root):
            monkeypatch.setenv("CORRIFNET_DEVICE_DATA", mode)
            cfg = ExperimentConfig(
                train_set_size=24, fno=1, fsiz=4, mini_batch_size=4,
                n_epochs=2, learn_rate=1e-3, modeltype="TinySegBf16",
                lim=224, synthetic_seed=0,
            )
            return run_experiment(cfg, run_root=tmp_path / root, index=0)

        res_d = run("1", "dev")
        res_s = run("0", "stream")
        assert res_d["test_jaccard"] == res_s["test_jaccard"]
        assert res_d["test_loss"] == res_s["test_loss"]
        assert res_d["history"] == res_s["history"]
    finally:
        cv._SPLITS_DIR = old
        registry._REGISTRY.pop("TinySegBf16", None)


def test_device_dataset_subset_residency():
    """A val-fold-only DeviceDataset serves exactly its subset (remapped
    global indices, host-batcher-identical batches) and reports coverage
    honestly so train/test fall back to streaming."""
    from corrifnet_tpu.data.dataset import DeviceDataset, batch_iterator

    rng = np.random.default_rng(0)
    images = rng.normal(size=(10, 3, 3, 8, 8)).astype(np.float32)
    masks = (rng.random((10, 3, 1, 8, 8)) > 0.5).astype(np.float32)
    vlind = np.array([7, 2, 9])
    dd = DeviceDataset(images, masks, wire_cast=False, indices=vlind)
    assert dd.covers(vlind) and dd.covers([2, 7])
    assert not dd.covers([0]) and not dd.covers([7, 3])
    got = list(dd.batches(vlind, 2))
    want = list(batch_iterator(images, masks, vlind, 2))
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.images), w.images)
        np.testing.assert_array_equal(np.asarray(g.masks), w.masks)
        np.testing.assert_array_equal(g.valid, w.valid)


def test_run_eval_streams_when_subset_not_covered():
    """_run_eval with a subset dataset must stream for uncovered indices
    (and produce the same metrics either way)."""
    from corrifnet_tpu.data.dataset import DeviceDataset
    from corrifnet_tpu.train.loop import _run_eval
    from corrifnet_tpu.train.state import make_eval_step

    lim = 16
    data = synthetic_dstl(8, lim=lim, seed=0)
    model = TinySeg()
    state = init_state(
        model, jax.random.PRNGKey(0), jnp.asarray(data.images[:2]),
        make_optimizer("Adam"),
    )
    eval_step = make_eval_step(model)
    vlind, tsind = np.array([5, 6]), np.array([0, 1, 2])
    dd = DeviceDataset(data.images, data.masks, indices=vlind)
    base = _run_eval(eval_step, state.params, state.batch_stats, data.images,
                     data.masks, tsind, 2, lim)
    sub = _run_eval(eval_step, state.params, state.batch_stats, data.images,
                    data.masks, tsind, 2, lim, device_data=dd)
    assert base[0] == sub[0] and base[1] == sub[1]
    cov = _run_eval(eval_step, state.params, state.batch_stats, data.images,
                    data.masks, vlind, 2, lim, device_data=dd)
    plain = _run_eval(eval_step, state.params, state.batch_stats, data.images,
                      data.masks, vlind, 2, lim)
    assert cov[0] == plain[0] and cov[1] == plain[1]


def test_maybe_device_dataset_val_fold_auto(monkeypatch):
    """Auto path on an 'accelerator': full set over budget -> val-fold-only
    residency; nothing fits -> None. (Regression: the fits math must use
    numpy index arrays — `vlind or ()` crashed the TPU path, r4.)"""
    import jax as _jax

    from corrifnet_tpu.run.main import _maybe_device_dataset

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("CORRIFNET_DEVICE_DATA", raising=False)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(10, 3, 3, 16, 16)).astype(np.float32)
    masks = (rng.random((10, 3, 1, 16, 16)) > 0.5).astype(np.float32)
    vlind = np.array([1, 4])
    model = TinySegBf16()

    # budget fits only ~2 samples' bytes -> val fold resident, not the set
    per_sample = images[0].nbytes // 2 + masks[0].nbytes // 4  # wire-cast
    monkeypatch.setenv(
        "CORRIFNET_DEVICE_DATA_BUDGET_GB", str(3 * per_sample / 1e9))
    dd = _maybe_device_dataset(model, images, masks, None, vlind)
    assert dd is not None and not dd.covers([0]) and dd.covers(vlind)

    monkeypatch.setenv(
        "CORRIFNET_DEVICE_DATA_BUDGET_GB", str(per_sample / 1e9))
    assert _maybe_device_dataset(model, images, masks, None, vlind) is None

    monkeypatch.setenv("CORRIFNET_DEVICE_DATA_BUDGET_GB", "100")
    full = _maybe_device_dataset(model, images, masks, None, vlind)
    assert full is not None and full.covers(np.arange(10))

    # val+test-fold residency (r5): preferred over val-only when it fits,
    # dropped back to val-only when it does not
    tsind = np.array([7, 8, 9])
    monkeypatch.setenv(
        "CORRIFNET_DEVICE_DATA_BUDGET_GB", str(6 * per_sample / 1e9))
    dd = _maybe_device_dataset(model, images, masks, None, vlind, tsind)
    assert dd is not None and dd.covers(vlind) and dd.covers(tsind)
    assert not dd.covers([0])
    monkeypatch.setenv(
        "CORRIFNET_DEVICE_DATA_BUDGET_GB", str(3 * per_sample / 1e9))
    dd = _maybe_device_dataset(model, images, masks, None, vlind, tsind)
    assert dd is not None and dd.covers(vlind) and not dd.covers(tsind)


def test_save_state_crash_safe_generations(setup, tmp_path):
    """save_state writes {name}@{step} and retires older generations only
    after the new one is durable — a kill mid-save can never destroy the
    last good resume point (r4: a 26-epoch run died exactly that way)."""
    data, model, optimizer, state, lim = setup
    ck = Checkpointer(tmp_path)
    p1 = ck.save_state("state0", state)
    assert p1.name == "state0@0"
    # a fake interrupted-save leftover + an advanced state
    (tmp_path / "state0@0.orbax-checkpoint-tmp-123").mkdir()
    state2 = state.replace(step=state.step + 5)
    p2 = ck.save_state("state0", state2)
    assert p2.name == "state0@5"
    left = sorted(q.name for q in tmp_path.glob("state0*"))
    assert left == ["state0@5"]  # old gen + tmp both retired
    restored = ck.restore_state("state0", state)
    assert int(restored.step) == 5
    assert ck.exists("state0")
    ck.close()


def test_restore_state_accepts_legacy_plain_name(setup, tmp_path):
    """Runs checkpointed before the @step scheme still resume."""
    import orbax.checkpoint as ocp

    data, model, optimizer, state, lim = setup
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            (tmp_path / "state0").resolve(),
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step},
        )
    ck = Checkpointer(tmp_path)
    assert ck.exists("state0")
    restored = ck.restore_state("state0", state)
    assert int(restored.step) == int(state.step)
    ck.close()
