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
        saves model weights, F4_TRAIN.py:84)."""
        path = self.run_dir / name
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
        return path

    def restore_state(self, name: str, template_state):
        restored = self._ckptr.restore(
            self.run_dir / name,
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
        return (self.run_dir / name).exists()

    def close(self):
        self._ckptr.close()
