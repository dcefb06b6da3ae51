"""Fast structural parameter initialization.

``model.init`` traces the full forward and draws tens of millions of uniform
samples — ~100s for this model.  For tests and benchmarks we only need
statistically sane parameters: get the variable SHAPES via ``jax.eval_shape``
(no compute), then fill them with numpy using name-aware rules (norm scales
-> 1, biases/means -> 0, kernels -> fan-in-scaled normal).  Real training
uses the faithful ``model.init``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _fill(path: str, shape, dtype, rng: np.random.RandomState) -> np.ndarray:
    name = path.split("/")[-1]
    if name in ("bias", "mean"):
        return np.zeros(shape, dtype)
    if name in ("scale", "var"):
        return np.ones(shape, dtype)
    if name == "pos_embed":
        return (rng.randn(*shape) * 0.02).astype(dtype)
    fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else max(shape[0], 1)
    return (rng.randn(*shape) / np.sqrt(max(fan_in, 1))).astype(dtype)


def fast_init(model, batch, seed: int = 0, **apply_kwargs) -> Any:
    """Shape-only init: returns a variables dict filled with numpy arrays."""
    shapes = jax.eval_shape(
        lambda b: model.init(jax.random.PRNGKey(0), b, **apply_kwargs), batch
    )
    rng = np.random.RandomState(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        leaves.append(_fill(path_str, leaf.shape, leaf.dtype, rng))
    return jax.tree_util.tree_unflatten(treedef, leaves)
