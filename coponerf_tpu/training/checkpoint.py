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
    tunnel.  Stores params + batch_stats + optimizer state + step, matching
    the reference's torch.save({'model', 'optimizer'}) (wrapper.py:97-99);
    without opt_state a resume silently resets Adam moments."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = name or f"model_step_{step:08d}"
    path = os.path.join(ckpt_dir, name + ".npz")
    flat = _flatten({"params": state.params, "batch_stats": state.batch_stats})
    flat["__step__"] = np.asarray(step)
    # optax states are nested namedtuples, not dicts: store flattened leaves
    # by index and rebuild with the live state's treedef on restore.
    opt_state = getattr(state, "opt_state", None)
    if opt_state is not None:
        for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
            flat[f"__opt__/{i:05d}"] = np.asarray(jax.device_get(leaf))
    np.savez(path, **flat)
    return path


def load(path: str):
    """Returns (params, batch_stats, opt_leaves, step); opt_leaves is a list
    of np arrays (flattened optax state) or None for pre-round-2 checkpoints."""
    data = np.load(path)
    opt_keys = sorted(k for k in data.files if k.startswith("__opt__/"))
    flat = {k: data[k] for k in data.files if k != "__step__" and not k.startswith("__opt__/")}
    step = int(data["__step__"]) if "__step__" in data.files else 0
    opt_leaves = [data[k] for k in opt_keys] if opt_keys else None
    tree = _unflatten(flat)
    return tree.get("params", {}), tree.get("batch_stats", {}), opt_leaves, step


def restore_into(state, path: str):
    """Restore params/batch_stats/opt_state/step into an existing TrainState.

    The optimizer state is rebuilt from the live state's tree structure
    (reference resume: train.py:111-117 load of the 'optimizer' entry)."""
    import jax.numpy as jnp

    params, batch_stats, opt_leaves, step = load(path)
    target = jax.device_get(state.params)
    # restore as jax arrays (not numpy): mixed numpy/jax leaves change optax's
    # arithmetic path (numpy scalar ops vs XLA fused FMA) by ~1 ulp per step,
    # breaking bit-exact resume.
    params = jax.tree.map(lambda t, s: jnp.asarray(s, dtype=np.asarray(t).dtype), target, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    new = state.replace(params=params, batch_stats=batch_stats, step=step)
    if opt_leaves is not None:
        treedef = jax.tree_util.tree_structure(state.opt_state)
        if treedef.num_leaves == len(opt_leaves):
            live = jax.tree_util.tree_leaves(state.opt_state)
            leaves = [
                jnp.asarray(np.asarray(s, dtype=np.asarray(t).dtype).reshape(np.asarray(t).shape))
                for t, s in zip(live, opt_leaves)
            ]
            new = new.replace(opt_state=jax.tree_util.tree_unflatten(treedef, leaves))
    return new


# ---------------------------------------------------------------------- #
# Optional Orbax backend (async, sharding-aware) for large-scale runs;
# the npz path above remains the dependency-light default.
# ---------------------------------------------------------------------- #

def save_orbax(ckpt_dir: str, state, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step:08d}"))
    opt_state = getattr(state, "opt_state", None)
    tree = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": step,
    }
    if opt_state is not None:
        tree["opt_leaves"] = [
            np.asarray(jax.device_get(x)) for x in jax.tree_util.tree_leaves(opt_state)
        ]
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    return path


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    return tree["params"], tree["batch_stats"], tree.get("opt_leaves"), int(tree["step"])
