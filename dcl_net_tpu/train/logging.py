"""Logging, metric writing and experiment bookkeeping.

TPU-native equivalents of the reference train utilities
(reference utils/tools_train.py): dual console/file logger (:32-46),
tensorboard-style scalar writer with per-mode counters (:7-30), and per-run
source backup (:60-65). The scalar writer logs JSONL (always greppable);
if tensorboard is importable it mirrors scalars there too.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import time
from typing import Dict, Optional


def get_logger(
    level_print: int = logging.INFO,
    level_save: int = logging.WARNING,
    path_file: Optional[str] = None,
    name_logger: str = "dcl_net_tpu",
) -> logging.Logger:
    """Console + file logger (reference utils/tools_train.py:32-46)."""
    logger = logging.getLogger(name_logger)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    formatter = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    handler_view = logging.StreamHandler()
    handler_view.setFormatter(formatter)
    handler_view.setLevel(level_print)
    logger.addHandler(handler_view)
    if path_file:
        os.makedirs(os.path.dirname(path_file) or ".", exist_ok=True)
        handler_save = logging.FileHandler(path_file)
        handler_save.setFormatter(formatter)
        handler_save.setLevel(level_save)
        logger.addHandler(handler_save)
    return logger


class ScalarWriter:
    """JSONL scalar writer with independent per-mode step counters
    (reference utils/tools_train.py tools_writer:7-30)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "scalars.jsonl")
        self._fh = open(self.path, "a")
        self._counters: Dict[str, int] = {}
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalars(self, mode: str, scalars: Dict[str, float], step: Optional[int] = None):
        if step is None:
            step = self._counters.get(mode, 0)
            self._counters[mode] = step + 1
        record = {"mode": mode, "step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{mode}_{k}", float(v), int(step))

    def close(self):
        self._fh.close()
        if self._tb:
            self._tb.close()


def backup_source(log_dir: str, repo_root: Optional[str] = None):
    """Snapshot the package source into the run dir for reproducibility
    (reference utils/tools_train.py:60-65)."""
    repo_root = repo_root or os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    dst = os.path.join(log_dir, "source_backup")
    src_pkg = os.path.join(repo_root, "dcl_net_tpu")
    if os.path.isdir(src_pkg):
        shutil.copytree(src_pkg, os.path.join(dst, "dcl_net_tpu"), dirs_exist_ok=True)
    for f in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(repo_root, f)
        if os.path.isfile(p):
            os.makedirs(dst, exist_ok=True)
            shutil.copy2(p, dst)


def set_random_seed(seed: int):
    """Seed numpy + python hash-free RNGs (reference gorilla.set_random_seed)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


def parameter_count(params) -> int:
    """Total parameter count (reference gorilla.parameter_count)."""
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))
