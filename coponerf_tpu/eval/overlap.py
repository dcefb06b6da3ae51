"""Overlap-table generation.

The reference ships precomputed per-scene overlap scalars
(assets/overlap/{realestate,acid}.npy, loaded at realestate10k_dataio.py:471)
but not the code that produced them.  For datasets without a shipped table,
this computes a standard proxy: the fraction of context-view-1 pixels whose
forward flow lands inside view 2 AND passes forward-backward consistency —
i.e. the co-visible image fraction under the model's own correspondence
field.  Use the official tables when available; this keeps the binned eval
runnable without them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.flow import cyclic_consistency_masks


def compute_overlap_table(model, variables, dataset, batch_size: int = 1) -> np.ndarray:
    encode = jax.jit(lambda v, b: model.apply(v, b, train=False, method="encode"))

    @jax.jit
    def overlap_from_flows(flow_f, flow_b):
        _, _, mask_f, _ = cyclic_consistency_masks(flow_f, flow_b, out_size=256)
        return mask_f.mean(axis=(1, 2))

    out = np.zeros((len(dataset), 1), np.float32)
    for i in range(len(dataset)):
        item = dataset[i]
        batch = jax.tree.map(lambda x: jnp.asarray(x)[None], item[0])  # add batch dim
        state = encode(variables, batch)
        out[i, 0] = float(overlap_from_flows(state.flows[0], state.flows[1])[0])
    return out
