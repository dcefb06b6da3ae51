"""Reliable TPU timing over the tunneled (axon) backend.

``jax.block_until_ready`` is a NO-OP on this backend and per-call dispatch
overhead is ~30ms, so naive timing is garbage.  ``bench_fn`` runs the target
K times inside ONE jitted lax.fori_loop whose carried value consumes the full
output (defeating DCE), fetches a scalar to force completion, and differences
two K values to cancel the fixed per-call overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _consume(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def bench_fn(fn: Callable, *args, n_lo: int = 2, n_hi: int = 12) -> float:
    """Returns seconds per invocation of fn(*args)."""

    def perturb(a, i):
        # make the input depend on the loop index so XLA cannot hoist the
        # loop-invariant body out of the fori_loop
        leaves, treedef = jax.tree.flatten(a)
        bumped = False
        out = []
        for x in leaves:
            if not bumped and jnp.issubdtype(x.dtype, jnp.floating):
                out.append(x + (i * 1e-37).astype(x.dtype))
                bumped = True
            else:
                out.append(x)
        return jax.tree.unflatten(treedef, out)

    @jax.jit
    def f(n, *a):
        def body(i, acc):
            out = fn(*perturb(a, i))
            return acc + _consume(out)

        # dynamic bound -> ONE compilation serves all n
        return jax.lax.fori_loop(0, n, body, 0.0)

    float(f(jnp.int32(1), *args))  # compile + warm

    def runner(n):
        t0 = time.time()
        float(f(jnp.int32(n), *args))
        return time.time() - t0

    t_lo = runner(n_lo)
    t_hi = runner(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)
