"""TensorBoard writing (tensorboardX) + the global writer singleton.

Parity surface of reference utils.py:62-74 (SingletonWriter holding
writer / cur_iter / test_iter globals) and train.py:94-103 (run naming).
"""

from __future__ import annotations

from typing import Optional


class SingletonWriter:
    """Process-global writer handle (reference utils.py:62-74)."""

    writer = None
    cur_iter: int = 0
    test_iter: int = 1000

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    @property
    def write_test_iter(self) -> bool:
        return bool(self.writer) and self.cur_iter % self.test_iter == 0


def make_writer(comment: str = "", log_dir: Optional[str] = None):
    """Create a tensorboardX SummaryWriter (None-safe import)."""
    from tensorboardX import SummaryWriter

    if log_dir:
        return SummaryWriter(log_dir=log_dir + comment)
    return SummaryWriter(comment=comment)
