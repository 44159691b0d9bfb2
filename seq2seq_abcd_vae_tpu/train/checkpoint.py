"""Self-describing rolling checkpoint (single overwritten ``checkpoint.pt``).

Keeps the reference's checkpoint contract (ABCD-VAE/learning.py:293-347):
one rolling file per run dir; each module's parameters are stored beside
its ``*_init_parameters`` dict so ``retrieve_model`` can rebuild the model
without the original CLI flags; optimizer, lr-scheduler, gradient clip and
RNG state ride along for bit-faithful resume.  Writes are atomic
(tmp + rename) — the retry-on-I/O-error the reference documents but never
implemented (learning.py:294-297).
"""

from __future__ import annotations

import os
import pickle
import tempfile
import threading
from typing import Any, Optional

import jax
import numpy as np

CHECKPOINT_NAME = "checkpoint.pt"


def tree_to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def tree_to_device(tree, device=None):
    def put(x):
        if isinstance(x, np.ndarray) or np.isscalar(x):
            return jax.device_put(x, device)
        return x
    return jax.tree_util.tree_map(put, tree)


def save_checkpoint(save_dir: str, payload: dict[str, Any]) -> str:
    path = os.path.join(save_dir, CHECKPOINT_NAME)
    fd, tmp = tempfile.mkstemp(dir=save_dir, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


class AsyncCheckpointer:
    """Background-thread checkpoint writer (the SURVEY.md section-5 "async
    save" note, without an orbax dependency).

    The device->host copy happens on the caller's thread (cheap at these
    sizes and required for consistency); serialization + atomic write
    overlap the next epoch.  ``wait()`` joins the in-flight save; a new
    save waits for the previous one, preserving the single rolling-file
    contract.
    """

    def __init__(self) -> None:
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, save_dir: str, payload: dict[str, Any]) -> None:
        self.wait()

        def _run() -> None:
            try:
                save_checkpoint(save_dir, payload)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
