"""Train state + jitted train/eval steps (reference: F4_TRAIN.py:39-208).

Parity-preserving semantics baked into the steps:
  * loss = BCE-with-logits applied to the model's sigmoid output (the
    reference's double-sigmoid composition, F4_TRAIN.py:58-60);
  * accuracy = soft Jaccard2 on the first modality channel, flattened to a
    (batchLoad, 1) column and weighted by batchLoad = n_valid * lim * lim
    (F4_TRAIN.py:65-71) — padded samples masked out;
  * optimizer: torch-default Adam (betas 0.9/0.999, eps 1e-8) or plain SGD
    (F2_MAIN.py:168-173); LR passed per step from train.schedule (epoch-start
    StepLR); optimizer state is NOT checkpointed (the reference only saves
    ``model.state_dict()``, F4_TRAIN.py:84).

TPU-first: a single jitted step updates params/opt-state in place
(donated); under a ``jax.sharding.Mesh`` the batch is sharded along the
``data`` axis and selected transformer matmuls along ``model`` (see
``corrifnet_tpu.parallel``) — XLA inserts the psum/all-gather collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from corrifnet_tpu.metrics import jaccard2_masked

__all__ = ["TrainState", "make_optimizer", "make_train_step",
           "make_train_multi_step", "make_eval_step", "init_state",
           "LayoutSlot"]


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(kind: str) -> optax.GradientTransformation:
    """LR-less transform; the step scales by the per-epoch LR (StepLR)."""
    if kind == "Adam":
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    if kind == "SGD":
        return optax.identity()
    raise ValueError(f"unknown optimizerType {kind!r}")


def init_state(model, rng, sample_images, optimizer) -> TrainState:
    variables = jax.jit(
        functools.partial(model.init, train=False), static_argnames=()
    )({"params": rng, "style_noise": jax.random.fold_in(rng, 7)},
      sample_images)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _masked_loss_and_jaccard(outputs, masks, valid):
    """(mean BCE over valid elements, batch Jaccard2, n_valid)."""
    b = masks.shape[0]
    vmask = valid.reshape((b,) + (1,) * (masks.ndim - 1))
    per = jnp.maximum(outputs, 0.0) - outputs * masks + jnp.log1p(
        jnp.exp(-jnp.abs(outputs))
    )
    elems_per_sample = 1
    for s in masks.shape[1:]:
        elems_per_sample *= s
    n_valid = valid.sum()
    loss = (per * vmask).sum() / (n_valid * elems_per_sample)

    # channel-0 slice before metrics (F4_TRAIN.py:68-69)
    m0 = masks[:, 0, ...].reshape(b, -1)
    o0 = outputs[:, 0, ...].reshape(b, -1)
    ve = jnp.broadcast_to(valid[:, None], m0.shape)
    jac = jaccard2_masked(
        m0.reshape(-1, 1), o0.reshape(-1, 1), ve.reshape(-1, 1)
    )[0]
    return loss, jac, n_valid


class LayoutSlot:
    """Shared state-layout resolution across step executables.

    One train run may mix executables that donate the same TrainState
    (``make_train_multi_step`` for full chains + ``make_train_step`` for
    the epoch tail). Whichever wrapper compiles FIRST resolves the
    compiler-chosen (``Layout.AUTO``) state format and records it here;
    every other wrapper sharing the slot compiles against that concrete
    format, so the state never bounces between layouts.

    ``failed=True`` records that the mechanism was found unreliable on
    this backend (see ``_AutoLayoutStep._canary``); every wrapper sharing
    the slot then uses default layouts, so the state never mixes."""

    def __init__(self):
        self.fmt = None          # compiler-chosen Format pytree for the state
        self.last_out = None     # weakref to the state we last returned
        self.failed = False      # canary tripped: use default layouts


class _AutoLayoutStep:
    """AOT-compiled train step with XLA-chosen ("auto") state layouts.

    The unrolled region map (NOTES.md) shows ~8 ms/step of untagged
    parameter/gradient layout copies at B=8: conv kernels leave the conv
    backward in conv-preferred layout and are re-laid-out to the default
    row-major parameter layout before the Adam update (and back again
    before the next forward). With ``Format(Layout.AUTO)`` on the donated
    state argument AND result, XLA instead picks one layout per leaf and
    the donated round trip preserves it — measured 76.2 -> 74.0 ms/step
    wall at B=8 (scripts/layout_probe.py, 207 leaves non-default).

    Non-state args pass through with default layouts; ``lr`` is coerced
    to a f32 scalar array so the AOT signature is call-stable. On the
    first call (or after an external state swap, e.g. a checkpoint
    restore) the state is ``device_put`` into the resolved format once.

    Remote/tunneled TPU backends have been observed to (a) choose
    DIFFERENT layouts for the donated input state and the returned state
    under double-AUTO, and (b) report executable layout metadata that
    disagrees with what the device enforces at enqueue — both fault the
    run one step later with InvalidArgument. (a) is fixed by pinning the
    output to the input choice (``_compile``); (b) is unobservable
    client-side, so the first call runs a two-step CANARY on a cloned
    state (``_canary``) and, if the executable faults, degrades to a
    plain donated jit with default layouts — auto layout is a ~3% win
    (NOTES.md), never worth a crashed run.
    """

    def __init__(self, fn, slot: "LayoutSlot"):
        self._fn = fn
        self._slot = slot
        self._compiled = None
        self._fallback = None
        self._validated = False

    @staticmethod
    def _norm_args(args):
        # lr arrives as a python float from step_lr; fix its aval so the
        # compiled executable accepts every call.
        return tuple(
            a if isinstance(a, jax.Array) else jnp.asarray(a, jnp.float32)
            for a in args
        )

    def _compile(self, state, args):
        from jax.experimental.layout import Format, Layout

        slot = self._slot
        state_spec = (
            slot.fmt
            if slot.fmt is not None
            else jax.tree.map(lambda _: Format(Layout.AUTO), state)
        )
        # Lower on abstract avals: Layout.AUTO rejects concrete jax.Arrays
        # (they already carry a layout — e.g. a checkpoint-restored state).
        abs_ = lambda t: jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), t)

        def compile_with(spec):
            jitted = jax.jit(
                self._fn,
                donate_argnums=(0,),
                in_shardings=(spec,) + (None,) * len(args),
                out_shardings=(spec, None),
            )
            return jitted.lower(abs_(state), *abs_(args)).compile()

        self._compiled = compile_with(state_spec)
        if slot.fmt is None:
            in_fmt = self._compiled.input_formats[0][0]
            out_fmt = self._compiled.output_formats[0]
            if jax.tree.leaves(in_fmt) != jax.tree.leaves(out_fmt):
                # With AUTO on both sides XLA may choose DIFFERENT layouts
                # for the donated input state and the returned state (seen
                # on TPU: opt_state.nu conv-kernel leaves) — the donated
                # round trip then faults on the second step
                # (InvalidArgument: passed layout != required layout).
                # Pin both sides to the input choice and recompile: one
                # extra (persistently cached) compile, zero per-step
                # relayout copies.
                self._compiled = compile_with(in_fmt)
            slot.fmt = in_fmt

    def _canary(self, state, args):
        """Prove the compiled executable's layout round trip on a CLONED
        state before trusting it with the real one: step on the clone,
        step again on that output (the in->out->in round trip is where
        layout mismatches fault), and fetch a metric value (tunneled
        backends surface enqueue faults only at a host read).

        ``may_alias=False`` is load-bearing: when a leaf is ALREADY in the
        resolved layout (exactly the checkpoint-restore/resume case),
        ``device_put`` would otherwise return the caller's array itself,
        and the donated canary execution would delete the real state
        ("Array has been deleted" at the post-canary move)."""
        import numpy as np

        probe = jax.tree.map(
            lambda a, f: jax.device_put(a, f, may_alias=False),
            state, self._slot.fmt,
        )
        p1, _ = self._compiled(probe, *args)
        p2, m = self._compiled(p1, *args)
        np.asarray(m["loss"])
        del p2

    def __call__(self, state, *args):
        import warnings
        import weakref

        args = self._norm_args(args)
        slot = self._slot
        if self._fallback is None and slot.failed:
            self._fallback = jax.jit(self._fn, donate_argnums=(0,))
        if self._fallback is not None:
            return self._fallback(state, *args)
        if self._compiled is None:
            self._compile(state, args)
        if not self._validated:
            try:
                self._canary(state, args)
                self._validated = True
            except Exception as e:
                warnings.warn(
                    "auto-layout train step failed its layout canary "
                    f"({type(e).__name__}); falling back to default "
                    "layouts for this run",
                    stacklevel=2,
                )
                slot.failed = True
                self._fallback = jax.jit(self._fn, donate_argnums=(0,))
                return self._fallback(state, *args)
        if slot.last_out is None or slot.last_out() is not state:
            # first call, or the state was swapped outside the step chain
            # (e.g. extended-checkpoint resume): move it into the resolved
            # layouts once; thereafter the donated round trip preserves them.
            state = jax.tree.map(jax.device_put, state, slot.fmt)
        out_state, metrics = self._compiled(state, *args)
        slot.last_out = weakref.ref(out_state)
        return out_state, metrics


def make_train_step(model, optimizer, auto_layout=None) -> Callable:
    """Returns jitted f(state, images, masks, valid, lr, rng) ->
    (state, metrics) with metrics = dict(loss, jaccard, n_valid).

    ``auto_layout``: a ``LayoutSlot`` (or True for a private one) swaps the
    plain jit for the AOT auto-layout wrapper (see ``_AutoLayoutStep``).
    Single-device only — under a mesh the sharding layer owns placement."""
    fn = _train_step_fn(model, optimizer)
    if auto_layout:
        slot = auto_layout if isinstance(auto_layout, LayoutSlot) else LayoutSlot()
        return _AutoLayoutStep(fn, slot)
    return jax.jit(fn, donate_argnums=(0,))


def make_train_multi_step(model, optimizer, auto_layout=None) -> Callable:
    """K sequential optimizer steps in ONE device dispatch.

    Returns jitted f(state, images, masks, valid, lr, rng) -> (state,
    metrics) where images/masks/valid carry a leading steps axis
    (``(k, B, ...)``); a ``lax.scan`` applies the single train step to
    each slice in order, using ``fold_in(rng, i)`` as step i's RNG.
    Same computation as k calls of ``make_train_step`` with those folded
    keys (tested to ~1e-6; the scanned body compiles separately, so f32
    reassociation differs), but the host round-trip — 30-40 ms through a
    tunneled TPU attach — is paid once per k steps instead of per step.
    Metrics come back stacked per step. ``auto_layout`` as in
    ``make_train_step`` (share one ``LayoutSlot`` across the chain and
    tail steps of a run)."""
    step = _train_step_fn(model, optimizer)

    def multi(state: TrainState, images, masks, valid, lr, rng):
        def body(st, xs):
            im, mk, vd, i = xs
            return step(st, im, mk, vd, lr, jax.random.fold_in(rng, i))

        k = images.shape[0]
        return jax.lax.scan(body, state, (images, masks, valid, jnp.arange(k)))

    if auto_layout:
        slot = auto_layout if isinstance(auto_layout, LayoutSlot) else LayoutSlot()
        return _AutoLayoutStep(multi, slot)
    return jax.jit(multi, donate_argnums=(0,))


def _train_step_fn(model, optimizer) -> Callable:
    def step(state: TrainState, images, masks, valid, lr, rng):
        # masks may arrive uint8 over the wire (data.dataset.wire_cast_batch
        # — tunneled-TPU transfer is the epoch bottleneck); the f32 loss
        # arithmetic is exact for 0/1 either way.
        masks = jnp.asarray(masks, jnp.float32)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                True,
                mutable=["batch_stats"],
                # 'style_noise' feeds RobustMseg(style_noise=True)
                # (RobustSeg.py valid=True path); unused streams are free.
                rngs={"dropout": rng,
                      "style_noise": jax.random.fold_in(rng, 7)},
            )
            out = out.astype(jnp.float32)
            loss, jac, n_valid = _masked_loss_and_jaccard(out, masks, valid)
            return loss, (mut["batch_stats"], jac, n_valid)

        (loss, (new_bs, jac, n_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p - lr * u, state.params, updates
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "jaccard": jac, "n_valid": n_valid}

    return step


def make_eval_step(model) -> Callable:
    """Returns jitted f(params, batch_stats, images, masks, valid) ->
    metrics dict. Eval mode: running BN stats, no dropout (model.eval())."""

    def step(params, batch_stats, images, masks, valid):
        masks = jnp.asarray(masks, jnp.float32)  # uint8 over the wire
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, False,
            # deterministic eval elsewhere; RobustMseg(style_noise=True)
            # draws this stream even in eval (reference valid=True path)
            rngs={"style_noise": jax.random.PRNGKey(7)},
        ).astype(jnp.float32)
        loss, jac, n_valid = _masked_loss_and_jaccard(out, masks, valid)
        return {"loss": loss, "jaccard": jac, "n_valid": n_valid, "outputs": out}

    return jax.jit(step)
