"""Probe: speed of Mosaic's tpu.dynamic_gather for bilinear row gathers.

Constraint (jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule): only
take_along_axis-shaped gathers lower — input (M, N), indices (M, N), output
(M, N), out[i, j] = x[idx[i, j], j].  So each kernel block gathers exactly
HW rows; we put HW points per block and loop the 4 bilinear corners.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = W = 64
C = 256
P = 262144
BLOCK_P = H * W  # required: indices/out shape == table shape


def kernel(idx_ref, w_ref, table_ref, out_ref):
    table = table_ref[:]                       # (HW, C)
    acc = jnp.zeros((BLOCK_P, C), jnp.float32)
    for c in range(4):
        idx = jax.lax.broadcast_in_dim(idx_ref[:, c], (BLOCK_P, C), (0,))
        rows = jnp.take_along_axis(table, idx, axis=0, mode="promise_in_bounds")
        acc = acc + rows * w_ref[:, c][:, None]
    out_ref[:] = acc


@jax.jit
def gather_pallas(table, idx, w):
    grid = (P // BLOCK_P,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_P, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_P, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H * W, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_P, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, w, table)


def main():
    k = jax.random.PRNGKey(0)
    table = jax.random.uniform(k, (H * W, C))
    idx = jax.random.randint(k, (P, 4), 0, H * W, jnp.int32)
    w = jax.random.uniform(k, (P, 4))

    out = gather_pallas(table, idx, w)
    ref = sum(jnp.take(table, idx[:, c], axis=0) * w[:, c][:, None] for c in range(4))
    err = float(jnp.max(jnp.abs(out - ref)))
    print("correct:", err < 1e-4, "err", err, flush=True)

    from coponerf_tpu.utils.timing import bench_fn

    t = bench_fn(gather_pallas, table, idx, w, n_lo=1, n_hi=6)
    gb = P * 4 * C * 4 / 1e9
    print(f"pallas dynamic_gather: {t * 1000:.2f} ms ({gb / t:.0f} GB/s)")


if __name__ == "__main__":
    main()
