"""Checkpoint / resume (SURVEY.md §5).

The reference has none; its only resume-like property is that each animation
frame's BMP is written eagerly (simple_raytracer.cpp:488-494) — reproduced by
driver/animation.py's resume=True.  For differentiable workloads this module
checkpoints optimizer/scene-parameter state as a numpy .npz, atomically
(write temp + rename) so a crash never leaves a torn checkpoint.  The format
is a flat pytree-leaf dump, dependency-free on purpose: checkpoints stay
loadable on any host with numpy alone (no orbax in this image's hot path).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Optional, Tuple

import numpy as np
import jax


def save_checkpoint(path: str, params, step: int, extra: Optional[dict] = None
                    ) -> None:
    """Save a pytree of arrays + step counter to ``path`` (.npz), atomic."""
    leaves, treedef = jax.tree.flatten(params)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__step__"] = np.int64(step)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, params_template) -> Optional[Tuple[Any, int]]:
    """Restore (params, step) from ``path`` into the template's tree
    structure; None if the file does not exist."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        leaves, treedef = jax.tree.flatten(params_template)
        restored = [z[f"leaf_{i}"] for i in range(len(leaves))]
        step = int(z["__step__"])
    return jax.tree.unflatten(treedef, restored), step
