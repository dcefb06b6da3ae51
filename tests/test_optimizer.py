"""Optimizer wrappers: per-leaf finite-select semantics and the flat
(single-vector) variant — both must produce the same parameter trajectory as
the stock formulation (reference semantics: Adam + clip 1.0 + NaN step skip,
wrapper.py:44-58,139-151)."""

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.config import Config, TrainConfig
from coponerf_tpu.training.trainer import make_optimizer


def _toy():
    params = {
        "a": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 10.0,
              "bias": jnp.ones(4, jnp.float32)},
        "b": {"w": jnp.full((5,), -0.5, jnp.float32)},
    }
    grads = jax.tree.map(lambda p: jnp.sin(p) + 0.1, params)
    return params, grads


def _cfg(flat):
    return Config(train=TrainConfig(lr=1e-3, flat_optimizer=flat))


def test_flat_optimizer_matches_default():
    params, grads = _toy()
    outs = {}
    for flat in (False, True):
        tx = make_optimizer(_cfg(flat), steps_per_epoch=10)
        state = tx.init(params)
        p = params
        for _ in range(3):
            updates, state = tx.update(grads, state, p)
            p = jax.tree.map(lambda x, u: x + u, p, updates)
        outs[flat] = p
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(outs[False]),
        jax.tree_util.tree_leaves_with_path(outs[True]),
    ):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_flat_optimizer_skips_nonfinite():
    params, grads = _toy()
    bad = jax.tree.map(lambda g: g.at[(0,) * g.ndim].set(jnp.nan), grads)
    tx = make_optimizer(_cfg(True), steps_per_epoch=10)
    state = tx.init(params)
    updates, state = tx.update(bad, state, params)
    for u in jax.tree.leaves(updates):
        np.testing.assert_array_equal(np.asarray(u), 0.0)  # step skipped exactly
    # a following finite step still applies
    updates, state = tx.update(grads, state, params)
    assert any(np.abs(np.asarray(u)).max() > 0 for u in jax.tree.leaves(updates))
