"""Checkpoint / resume of the branch-and-bound state.

The reference has no checkpointing at all — on timeout the tree is lost
(SURVEY.md section 5).  Here the entire solver state is small host data:
the frontier (nodes with their cut arrays), the incumbent, counters, and
the RNG state.  Serialising it periodically makes resume free; the device
holds no state between super-steps (warm-start caches are a pure
optimisation and are rebuilt lazily).
"""

from __future__ import annotations

import pickle
import tempfile
import os
from typing import Any, Dict


CHECKPOINT_VERSION = 1


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomically write a checkpoint (write temp + rename)."""
    payload = dict(payload)
    payload["__version__"] = CHECKPOINT_VERSION
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    version = payload.pop("__version__", None)
    if version != CHECKPOINT_VERSION:
        raise ValueError(
            f"checkpoint version mismatch: file has {version}, "
            f"code expects {CHECKPOINT_VERSION}"
        )
    return payload
