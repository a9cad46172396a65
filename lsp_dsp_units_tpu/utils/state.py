"""State introspection and checkpoint/resume.

The reference's only introspection hook is the ``IStateDumper`` visitor
(reference: src/main/iface/IStateDumper.cpp; every unit implements
``dump()`` over all fields including filter delays,
FilterBank.cpp:332-424).  In this framework ALL processor state is an
explicit pytree, so checkpoint/resume is structural:

* :func:`dump_state` — pytree -> nested plain dict of numpy arrays
  (the visitor equivalent, also human-printable);
* :func:`save_state` / :func:`load_state` — npz round trip keyed by
  pytree paths, restoring into the same treedef;
* :class:`StateDumper` — a visitor-style text formatter mirroring the
  reference's ``write/begin_object/end_object`` surface for parity.
"""

from __future__ import annotations

import io
import warnings
import os
from typing import Any, Dict

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def dump_state(tree: Any) -> Dict[str, np.ndarray]:
    """Flatten any state pytree into {path: numpy array}."""
    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        out[_path_str(path)] = np.asarray(leaf)
    return out


def save_state(path: str, tree: Any) -> None:
    np.savez(path, **dump_state(tree))


def load_state(path: str, like: Any) -> Any:
    """Load a checkpoint into the structure of ``like``."""
    # np.savez appends '.npz' to extensionless paths; mirror that so
    # save_state('ckpt') / load_state('ckpt') round-trips
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    with np.load(path) as data:
        keys = set(data.files)
        for p, leaf in leaves_p:
            key = _path_str(p)
            if key not in keys:
                raise KeyError(f"checkpoint missing state leaf: {key}")
            keys.discard(key)
            arr = data[key]
            new_leaves.append(
                jax.numpy.asarray(arr, np.asarray(leaf).dtype))
        if keys:
            warnings.warn(
                f"checkpoint keys unused by this state structure: "
                f"{sorted(keys)}", stacklevel=2)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), new_leaves)


class StateDumper:
    """Visitor-style text dump (reference IStateDumper surface)."""

    def __init__(self):
        self._buf = io.StringIO()
        self._indent = 0

    def _line(self, s: str) -> None:
        self._buf.write("  " * self._indent + s + "\n")

    def write(self, name: str, value) -> None:
        v = np.asarray(value)
        if v.ndim == 0:
            self._line(f"{name} = {v}")
        else:
            self._line(f"{name} = array{v.shape} {v.dtype} "
                       f"[{np.min(v):.6g}..{np.max(v):.6g}]")

    def begin_object(self, name: str) -> None:
        self._line(f"{name} = {{")
        self._indent += 1

    def end_object(self) -> None:
        self._indent -= 1
        self._line("}")

    def write_tree(self, name: str, tree) -> None:
        self.begin_object(name)
        for k, v in dump_state(tree).items():
            self.write(k, v)
        self.end_object()

    def text(self) -> str:
        return self._buf.getvalue()
