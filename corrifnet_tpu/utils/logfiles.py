"""Run log files (reference: F2_MAIN.py:179-203, F4_TRAIN.py:48-81,205-208).

The reference writes seven append-mode text files per run — one float per
line per epoch — plus a verbose lrFile. Formats are kept line-compatible so
downstream tooling (curve plotting, allJaccardResults log parsing) works on
either framework's outputs.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import TextIO

__all__ = ["RunLogs"]


@dataclasses.dataclass
class RunLogs:
    """The seven per-run log files, opened in the run directory."""

    lr: TextIO
    train: TextIO
    trainacc: TextIO
    trainepoch: TextIO
    val: TextIO
    valacc: TextIO
    test: TextIO
    testacc: TextIO

    @classmethod
    def open(cls, run_dir, append: bool = False) -> "RunLogs":
        d = Path(run_dir)
        d.mkdir(parents=True, exist_ok=True)
        mode = "a" if append else "w"
        return cls(
            lr=open(d / "lrFile.txt", mode),
            train=open(d / "trainFile.txt", mode),
            trainacc=open(d / "trainaccFile.txt", mode),
            trainepoch=open(d / "trainepochFile.txt", mode),
            val=open(d / "valFile.txt", mode),
            valacc=open(d / "valaccFile.txt", mode),
            test=open(d / "testFile.txt", mode),
            testacc=open(d / "testaccFile.txt", mode),
        )

    @classmethod
    def open_resumed(cls, run_dir, completed_epochs: int) -> "RunLogs":
        """Reopen a run's log files for a mid-training resume.

        An interrupted process may have written a partial epoch past the
        last ``state{i}`` checkpoint (the train lines land before the
        checkpoint, the val lines after) — truncate every per-epoch file
        back to ``completed_epochs`` entries so the resumed run appends a
        clean continuation. Single-line-per-epoch files are cut by line
        count; ``lrFile`` (6 lines per epoch: header, scheduler dict,
        train loss/acc, val loss/acc) is cut at the next epoch header;
        test files are rewritten empty (test only runs after training)."""
        d = Path(run_dir)
        for name in ("trainFile.txt", "trainaccFile.txt",
                     "trainepochFile.txt", "valFile.txt", "valaccFile.txt"):
            p = d / name
            lines = p.read_text().splitlines(keepends=True) if p.exists() else []
            p.write_text("".join(lines[:completed_epochs]))
        lr = d / "lrFile.txt"
        if lr.exists():
            kept, marker = [], f"Epoch: {completed_epochs} LR:"
            for ln in lr.read_text().splitlines(keepends=True):
                if ln.startswith(marker):
                    break
                kept.append(ln)
            lr.write_text("".join(kept))
        for name in ("testFile.txt", "testaccFile.txt"):
            (d / name).write_text("")
        return cls.open(d, append=True)

    def flush(self):
        for f in self._files():
            f.flush()

    def close(self):
        for f in self._files():
            f.close()

    def _files(self):
        return (
            self.lr, self.train, self.trainacc, self.trainepoch,
            self.val, self.valacc, self.test, self.testacc,
        )
