"""Checkpointing for model params + entropy-model tables (orbax-backed).

The crucial serialization invariant carried over from the reference
(continuous_base.py:176-184): range-coding tables are SAVED, never rebuilt,
since independent rebuilds on sender/receiver can diverge in float math and
corrupt range decoding.  Checkpoints therefore bundle the flax params with
the frozen cdf/cdf_offset arrays of every entropy model.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

__all__ = ["save_checkpoint", "load_checkpoint"]


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, em_weights: Optional[dict] = None,
                    config: Optional[dict] = None):
    """Saves params (+ optional EM tables and model config) to `path`.

    Args:
      path: checkpoint directory.
      params: flax param pytree.
      em_weights: dict name -> list of arrays (from em.get_weights()).
      config: JSON-serializable model/EM configuration.
    """
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    payload = {"params": _to_numpy_tree(params)}
    if em_weights:
        payload["em"] = {
            name: [np.asarray(w) for w in weights]
            for name, weights in em_weights.items()}
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(path, "state"), payload, force=True)
    else:  # fallback: flat npz
        flat, treedef = jax.tree_util.tree_flatten(payload)
        np.savez(os.path.join(path, "state.npz"),
                 *[np.asarray(x) for x in flat])
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2)


def load_checkpoint(path: str, like: Optional[Any] = None):
    """Loads a checkpoint saved by save_checkpoint.

    Returns (payload dict with 'params' and optional 'em', config dict or
    None).
    """
    path = os.path.abspath(path)
    config = None
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    if _HAVE_ORBAX and os.path.exists(os.path.join(path, "state")):
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.join(path, "state"))
        return payload, config
    raise FileNotFoundError(f"No checkpoint found at {path}")
