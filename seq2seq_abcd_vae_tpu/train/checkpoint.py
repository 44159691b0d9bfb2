"""Self-describing rolling checkpoint (single overwritten ``checkpoint.pt``).

Keeps the reference's checkpoint contract (ABCD-VAE/learning.py:293-347):
one rolling file per run dir; each module's parameters are stored beside
its ``*_init_parameters`` dict so ``retrieve_model`` can rebuild the model
without the original CLI flags; optimizer, lr-scheduler, gradient clip and
RNG state ride along for bit-faithful resume.  Writes are atomic
(tmp + rename) — the retry-on-I/O-error the reference documents but never
implemented (learning.py:294-297).

Format v2 (this file's writer): a **versioned zip container** — one
``meta.json`` entry (format version + all JSON-safe payload values with
array placeholders) plus one ``.npy`` entry per array.  No pickle on the
write path: loading cannot execute code, the layout survives refactors of
the config dataclasses, and third-party tools can open it with
``zipfile`` + ``numpy`` alone.  The optimizer state is stored as its flat
leaf list (``__optimizer_leaves__``); the tree structure is rebuilt from
``tx.init(params)`` at resume, so optax's internal namedtuple classes are
never serialized.

``load_checkpoint`` sniffs the container: zip magic -> v2, anything else
-> the round-1 pickle format (read-only migration path).
"""

from __future__ import annotations

import io
import json
import os
import tempfile
import threading
import zipfile
from dataclasses import dataclass
from typing import Any, Optional

import jax
import numpy as np

CHECKPOINT_NAME = "checkpoint.pt"
FORMAT_VERSION = 2

_ARRAY_MARKER = "__array__"
_OPT_MARKER = "__optimizer_leaves__"


@dataclass
class OptimizerLeaves:
    """Flat leaf list of a saved optimizer state; the caller rebuilds the
    tree structure with ``tree_unflatten(tree_structure(tx.init(params)),
    leaves)`` (see Learner.learn resume path)."""
    leaves: list


def tree_to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def tree_to_device(tree, device=None):
    def put(x):
        if isinstance(x, np.ndarray) or np.isscalar(x):
            return jax.device_put(x, device)
        return x
    return jax.tree_util.tree_map(put, tree)


# ---------------------------------------------------------------------
# v2 container


def _encode(value, arrays: dict):
    """Payload value -> JSON-safe structure; arrays are pulled out into
    ``arrays`` and referenced by name."""
    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    if isinstance(value, (np.ndarray, np.generic, jax.Array)):
        name = "a%d" % len(arrays)
        arrays[name] = np.asarray(value)
        return {_ARRAY_MARKER: name}
    if isinstance(value, dict):
        return {str(k): _encode(v, arrays) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_encode(v, arrays) for v in value]
    raise TypeError("checkpoint payload value of unsupported type "
                    "%r" % type(value))


def _decode(value, arrays):
    if isinstance(value, dict):
        if set(value) == {_ARRAY_MARKER}:
            return arrays[value[_ARRAY_MARKER]]
        if set(value) == {_OPT_MARKER}:
            n = value[_OPT_MARKER]
            return OptimizerLeaves([arrays["opt%d" % i] for i in range(n)])
        return {k: _decode(v, arrays) for k, v in value.items()}
    if isinstance(value, list):
        return [_decode(v, arrays) for v in value]
    return value


def save_checkpoint(save_dir: str, payload: dict[str, Any]) -> str:
    path = os.path.join(save_dir, CHECKPOINT_NAME)
    arrays: dict[str, np.ndarray] = {}
    meta: dict[str, Any] = {"format_version": FORMAT_VERSION}
    for k, v in payload.items():
        if k == "optimizer" and v is not None:
            # arbitrary pytree (optax namedtuples): store leaves only.
            # A re-saved loaded payload hands the leaves back directly.
            leaves = (v.leaves if isinstance(v, OptimizerLeaves)
                      else jax.tree_util.tree_leaves(v))
            for i, leaf in enumerate(leaves):
                arrays["opt%d" % i] = np.asarray(leaf)
            meta[k] = {_OPT_MARKER: len(leaves)}
        else:
            meta[k] = _encode(v, arrays)

    fd, tmp = tempfile.mkstemp(dir=save_dir, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            with zipfile.ZipFile(f, "w", zipfile.ZIP_STORED) as z:
                z.writestr("meta.json", json.dumps(meta))
                for name, arr in arrays.items():
                    buf = io.BytesIO()
                    np.save(buf, arr, allow_pickle=False)
                    z.writestr(name + ".npy", buf.getvalue())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str) -> dict[str, Any]:
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"PK":  # round-1 format: pickle (read-only migration path)
        import pickle
        with open(path, "rb") as f:
            return pickle.load(f)
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        arrays = {}
        for info in z.infolist():
            if info.filename.endswith(".npy"):
                arrays[info.filename[:-4]] = np.load(
                    io.BytesIO(z.read(info.filename)), allow_pickle=False)
    version = meta.pop("format_version", None)
    if version is None or version > FORMAT_VERSION:
        raise ValueError("unsupported checkpoint format version: %r "
                         "(this build reads <= %d)" % (version,
                                                       FORMAT_VERSION))
    return {k: _decode(v, arrays) for k, v in meta.items()}


# ---------------------------------------------------------------------
# tolerant parameter overlay (the reference's strict=False analogue,
# learning.py:325)


def _flatten_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_paths(v, prefix + "/" + str(k)))
    else:
        out[prefix] = tree
    return out


def overlay_params(template: dict, loaded: dict, module_name: str = "",
                   strict: bool = True, log=None) -> dict:
    """Overlay ``loaded`` arrays onto ``template`` by path.

    strict=True requires identical key sets (exact-resume path).
    strict=False tolerates missing keys (template values kept — freshly
    initialized) and unexpected keys (dropped with a warning): the
    reference loads the encoder with ``load_state_dict(..., strict=False)``
    (learning.py:325) to allow schema drift.
    """
    t_flat = _flatten_paths(template)
    l_flat = _flatten_paths(loaded)
    missing = sorted(set(t_flat) - set(l_flat))
    unexpected = sorted(set(l_flat) - set(t_flat))
    if (missing or unexpected) and strict:
        raise KeyError(
            "checkpoint/%s parameter mismatch: missing %s, unexpected %s "
            "(pass strict=False for a tolerant load)"
            % (module_name, missing, unexpected))
    if log is not None:
        for k in missing:
            log.warning("%s: checkpoint lacks %s; keeping fresh init",
                        module_name, k)
        for k in unexpected:
            log.warning("%s: dropping unexpected checkpoint entry %s",
                        module_name, k)

    def rebuild(tmpl, path=""):
        if isinstance(tmpl, dict):
            return {k: rebuild(v, path + "/" + str(k))
                    for k, v in tmpl.items()}
        return l_flat.get(path, tmpl)

    return rebuild(template)


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
