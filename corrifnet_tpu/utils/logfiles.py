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
    def open(cls, run_dir) -> "RunLogs":
        d = Path(run_dir)
        d.mkdir(parents=True, exist_ok=True)
        return cls(
            lr=open(d / "lrFile.txt", "w"),
            train=open(d / "trainFile.txt", "w"),
            trainacc=open(d / "trainaccFile.txt", "w"),
            trainepoch=open(d / "trainepochFile.txt", "w"),
            val=open(d / "valFile.txt", "w"),
            valacc=open(d / "valaccFile.txt", "w"),
            test=open(d / "testFile.txt", "w"),
            testacc=open(d / "testaccFile.txt", "w"),
        )

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
