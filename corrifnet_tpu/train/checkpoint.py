"""Checkpointing via Orbax (reference: torch.save/load of state_dicts).

The reference saves ``model.state_dict()`` every epoch to
``iremmodel{i}.pt`` (F4_TRAIN.py:84) and finally ``Finaliremmodel{i}.pt``
(:86); optimizer state is never saved — mirrored here: checkpoints hold
``{'params', 'batch_stats'}`` only. Checkpoint names keep the reference's
``iremmodel{i}`` / ``Finaliremmodel{i}`` stems.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax

__all__ = ["Checkpointer", "epoch_ckpt_name", "final_ckpt_name"]


def epoch_ckpt_name(i: int) -> str:
    return f"iremmodel{i}"


def final_ckpt_name(i: int) -> str:
    return f"Finaliremmodel{i}"


class Checkpointer:
    """Thin wrapper over orbax StandardCheckpointer with torch-like names."""

    def __init__(self, run_dir: str):
        import orbax.checkpoint as ocp

        self.run_dir = Path(run_dir).resolve()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, name: str, params: Any, batch_stats: Any) -> Path:
        path = self.run_dir / name
        self._ckptr.save(
            path, {"params": params, "batch_stats": batch_stats}, force=True
        )
        self._ckptr.wait_until_finished()
        return path

    def restore(self, name: str, template: Optional[Any] = None) -> Any:
        path = self.run_dir / name
        if template is not None:
            restored = self._ckptr.restore(path, target=template)
        else:
            restored = self._ckptr.restore(path)
        return restored["params"], restored["batch_stats"]

    def save_state(self, name: str, state) -> Path:
        """Extended checkpoint including optimizer state + step — enables
        true mid-training resume (a capability the reference lacks: it only
        saves model weights, F4_TRAIN.py:84).

        CRASH-SAFE BY CONSTRUCTION: each save goes to a fresh
        ``{name}@{step}`` directory (orbax's tmp-then-rename makes that
        atomic) and older generations are deleted only AFTER the new one
        is durable — so a kill at ANY instant leaves at least one complete
        resume point. The round-4 rehearsal lost a 26-epoch run to the
        previous scheme (overwriting ``state0`` in place: the process was
        killed mid-save and only a ``.orbax-checkpoint-tmp`` survived)."""
        import shutil

        step = int(jax.device_get(state.step))
        path = self.run_dir / f"{name}@{step}"
        # clear leftovers of an identically-named interrupted attempt
        for stale in self.run_dir.glob(f"{name}@{step}.orbax-checkpoint-tmp*"):
            shutil.rmtree(stale, ignore_errors=True)
        self._ckptr.save(
            path,
            {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
            },
            force=True,
        )
        self._ckptr.wait_until_finished()
        # new generation durable -> retire everything older (incl. any
        # legacy un-suffixed dir and orphaned tmps)
        for old in self.run_dir.glob(f"{name}@*"):
            if old != path:
                shutil.rmtree(old, ignore_errors=True)
        legacy = self.run_dir / name
        if legacy.exists():
            shutil.rmtree(legacy, ignore_errors=True)
        for stale in self.run_dir.glob(f"{name}.orbax-checkpoint-tmp*"):
            shutil.rmtree(stale, ignore_errors=True)
        return path

    def _resolve_state(self, name: str) -> Optional[Path]:
        """Newest complete resume point: highest-step ``{name}@N``, else a
        legacy plain ``{name}`` directory; tmp dirs never match."""
        best, best_step = None, -1
        for p in self.run_dir.glob(f"{name}@*"):
            tail = p.name.rsplit("@", 1)[1]
            if tail.isdigit() and int(tail) > best_step:
                best, best_step = p, int(tail)
        if best is not None:
            return best
        legacy = self.run_dir / name
        return legacy if legacy.exists() else None

    def restore_state(self, name: str, template_state):
        path = self._resolve_state(name)
        if path is None:
            raise FileNotFoundError(self.run_dir / name)
        restored = self._ckptr.restore(
            path,
            target={
                "params": template_state.params,
                "batch_stats": template_state.batch_stats,
                "opt_state": template_state.opt_state,
                "step": template_state.step,
            },
        )
        return template_state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def exists(self, name: str) -> bool:
        return (self.run_dir / name).exists() or (
            self._resolve_state(name) is not None
        )

    def close(self):
        self._ckptr.close()
