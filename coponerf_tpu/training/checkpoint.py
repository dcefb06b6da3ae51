"""Checkpointing: orbax-backed save/restore of {params, batch_stats,
opt_state, step} (replaces torch.save dicts, wrapper.py:97-99,134-136,256-269),
plus a converter that ingests the reference's released PyTorch ``.pth``
checkpoints into the flax param tree for parity evaluation (see
coponerf_tpu/utils/torch_import.py for the key mapping)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(jax.device_get(tree))
    return out


def _unflatten(flat):
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save(ckpt_dir: str, state, step: int, name: Optional[str] = None) -> str:
    """npz-based checkpoint: robust, dependency-light, works over the TPU
    tunnel.  Stores params + batch_stats + step (optimizer state can be
    rebuilt; resuming mid-schedule restores step)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = name or f"model_step_{step:08d}"
    path = os.path.join(ckpt_dir, name + ".npz")
    flat = _flatten({"params": state.params, "batch_stats": state.batch_stats})
    flat["__step__"] = np.asarray(step)
    np.savez(path, **flat)
    return path


def load(path: str):
    """Returns (params, batch_stats, step) as nested dicts of np arrays."""
    data = np.load(path)
    flat = {k: data[k] for k in data.files if k != "__step__"}
    step = int(data["__step__"]) if "__step__" in data.files else 0
    tree = _unflatten(flat)
    return tree.get("params", {}), tree.get("batch_stats", {}), step


def restore_into(state, path: str):
    params, batch_stats, step = load(path)
    target = jax.device_get(state.params)
    params = jax.tree.map(lambda t, s: np.asarray(s, dtype=np.asarray(t).dtype), target, params)
    return state.replace(params=params, batch_stats=batch_stats, step=step)


# ---------------------------------------------------------------------- #
# Optional Orbax backend (async, sharding-aware) for large-scale runs;
# the npz path above remains the dependency-light default.
# ---------------------------------------------------------------------- #

def save_orbax(ckpt_dir: str, state, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step:08d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats),
             "step": step},
        )
    return path


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    return tree["params"], tree["batch_stats"], int(tree["step"])
