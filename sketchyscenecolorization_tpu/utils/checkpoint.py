"""Orbax checkpointing with step-named directories.

Replaces the reference's ``tf.train.Saver`` snapshots whose iteration is
parsed back out of the filename (``matching_main.py:143-147``,
``obj_colorization_main.py:52-60``, ``bg_colorization_main.py:820-828``):
here steps are directory names under the checkpoint root, and
``latest_checkpoint`` recovers the newest step for resume.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def _step_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"step_{step}")


def save_checkpoint(root: str, step: int, tree: Any,
                    max_to_keep: Optional[int] = None) -> str:
    """Save a pytree at <root>/step_<step>; optionally prune old steps."""
    os.makedirs(root, exist_ok=True)
    path = _step_dir(root, step)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    if max_to_keep is not None:
        steps = sorted(list_checkpoint_steps(root))
        for old in steps[:-max_to_keep]:
            target = _step_dir(root, old)
            if target != path:
                import shutil
                shutil.rmtree(target, ignore_errors=True)
    return path


def list_checkpoint_steps(root: str):
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _STEP_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint(root: str) -> Optional[Tuple[int, str]]:
    """(step, path) of the newest snapshot, or None."""
    steps = list_checkpoint_steps(root)
    if not steps:
        return None
    return steps[-1], _step_dir(root, steps[-1])


def restore_checkpoint(path: str, template: Any = None) -> Any:
    """Restore a pytree; ``template`` (a matching pytree of arrays) pins
    leaf dtypes/shapes when given."""
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)
