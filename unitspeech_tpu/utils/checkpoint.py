"""Checkpoint save/load — atomic, resumable, with optimizer state.

Replaces the reference's plain `torch.save` dict checkpoints which do NOT
save optimizer state and overwrite in place (SURVEY.md §5: "Training crashes
= lost epoch"; /root/reference/train_STEP1.py:278-304). Here:

  * orbax-checkpoint with atomic finalization (write-then-rename)
  * params + optimizer state + step saved together, so resume is exact
  * `latest_checkpoint` scans a directory of step-numbered checkpoints
  * retention: keep the newest N (configurable)

Decoder checkpoints bundle {params, spk_emb, mel_min, mel_max, step} like the
reference's pretrained_decoder.pt (train_STEP1.py:297-304) so fine-tuned
voices stay self-contained.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(directory: str, step: int, tree: Any, keep: int = 3) -> str:
    """Atomically save `tree` as <directory>/step_<step>; prune old ones."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_host(tree), force=True)
    ckptr.wait_until_finished()
    _prune(directory, keep)
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a checkpoint; `target` (a pytree of like-shaped arrays) restores
    exact structure/dtypes when given."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target=_to_host(target))
    return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, name), int(m.group(1))
    return best


def checkpoint_step(path: str) -> int:
    m = _STEP_RE.match(os.path.basename(path))
    return int(m.group(1)) if m else -1


def _prune(directory: str, keep: int):
    entries = []
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-keep] if keep > 0 else []:
        shutil.rmtree(os.path.join(directory, name), ignore_errors=True)
