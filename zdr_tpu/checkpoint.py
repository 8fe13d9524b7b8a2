"""Checkpoint / resume for texture optimization runs.

The reference has no checkpointing (SURVEY.md §5: "the optimized variable is
a single tensor"); outputs are ad-hoc image dumps. Here: save/restore the
material texture + optimizer state + step counter atomically, so long
recovery runs survive preemption. Plain npz (the state is small); orbax
would be overkill for one texture.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, material, opt_state, step: int, extra: Optional[Dict[str, Any]] = None) -> None:
    """Atomically write material + optimizer state + step to `path` (.npz)."""
    leaves, treedef = jax.tree.flatten(opt_state)
    payload = {
        "material": np.asarray(material),
        "step": np.asarray(step, np.int64),
        "n_opt_leaves": np.asarray(len(leaves), np.int64),
    }
    for i, leaf in enumerate(leaves):
        payload[f"opt_{i}"] = np.asarray(leaf)
    for k, v in (extra or {}).items():
        payload[f"x_{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, opt_state_template) -> Tuple[jnp.ndarray, Any, int, Dict[str, np.ndarray]]:
    """Restore (material, opt_state, step, extras); opt_state_template
    provides the pytree structure (e.g. optimizer.init(material_like))."""
    raw = np.load(path)
    material = jnp.asarray(raw["material"])
    n = int(raw["n_opt_leaves"])
    leaves = [jnp.asarray(raw[f"opt_{i}"]) for i in range(n)]
    treedef = jax.tree.structure(opt_state_template)
    opt_state = jax.tree.unflatten(treedef, leaves)
    extras = {k[2:]: raw[k] for k in raw.files if k.startswith("x_")}
    return material, opt_state, int(raw["step"]), extras
