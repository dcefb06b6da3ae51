"""Checkpoint save/load roundtrips (npz default + optional orbax backend),
including optimizer state (reference parity: wrapper.py:97-99 saves
{'model','optimizer'}; train.py:111-117 restores both)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from coponerf_tpu.training import checkpoint as C

pytestmark = pytest.mark.slow


class FakeState:
    params = {"layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
              "bias": np.ones(4, np.float32)}
    batch_stats = {"bn": {"mean": np.zeros(4, np.float32)}}
    opt_state = None

    def replace(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)
        return self


def test_npz_roundtrip(tmp_path):
    path = C.save(str(tmp_path), FakeState(), step=7)
    params, batch_stats, opt_leaves, step = C.load(path)
    assert step == 7
    assert opt_leaves is None  # FakeState carries no optimizer
    np.testing.assert_array_equal(params["layer"]["kernel"], FakeState.params["layer"]["kernel"])
    np.testing.assert_array_equal(batch_stats["bn"]["mean"], np.zeros(4))
    st = C.restore_into(FakeState(), path)
    np.testing.assert_array_equal(st.params["layer"]["kernel"], FakeState.params["layer"]["kernel"])


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = C.save_orbax(str(tmp_path), FakeState(), step=3)
    params, batch_stats, opt_leaves, step = C.load_orbax(path)
    assert step == 3
    np.testing.assert_array_equal(params["layer"]["kernel"], FakeState.params["layer"]["kernel"])


# --------------------------------------------------------------------- #
# Resume exactness: train k steps -> save -> restore into a FRESH state ->
# the next step must be bit-identical to an uninterrupted run.  This is
# exactly what breaks if Adam moments / apply_if_finite counters are not
# checkpointed (reference resume: train.py:111-117).
# --------------------------------------------------------------------- #

def _tiny_state(cfg_lr=1e-2):
    """A minimal TrainState over the production optimizer stack."""
    from flax.training import train_state

    class TS(train_state.TrainState):
        batch_stats: dict = None

    params = {"w": jnp.linspace(-1.0, 1.0, 8).reshape(2, 4), "b": jnp.zeros(4)}
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0),
                    optax.adam(optax.exponential_decay(cfg_lr, 50, 0.95, staircase=True))),
        max_consecutive_errors=10 ** 8,
    )
    return TS.create(apply_fn=None, params=params, batch_stats={}, tx=tx)


def _step(state, x):
    def loss_fn(p):
        y = x @ p["w"] + p["b"]
        return jnp.sum(y ** 2)

    grads = jax.grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads)


def test_resume_exactness(tmp_path):
    xs = [jnp.asarray(np.random.RandomState(i).randn(3, 2), jnp.float32) for i in range(8)]

    # uninterrupted: 8 steps
    ref = _tiny_state()
    for x in xs:
        ref = _step(ref, x)

    # interrupted: 5 steps -> save -> restore into a fresh state -> 3 more
    st = _tiny_state()
    for x in xs[:5]:
        st = _step(st, x)
    path = C.save(str(tmp_path), st, step=5)
    resumed = C.restore_into(_tiny_state(), path)
    assert int(resumed.step) == 5
    for x in xs[5:]:
        resumed = _step(resumed, x)

    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state (mu/nu/count and finite-guard counters) also matches
    for a, b in zip(jax.tree_util.tree_leaves(ref.opt_state),
                    jax.tree_util.tree_leaves(resumed.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_without_opt_state_is_backward_compatible(tmp_path):
    """Old checkpoints (no __opt__ keys) still restore params/step."""
    st = _tiny_state()
    st = _step(st, jnp.ones((3, 2)))
    path = C.save(str(tmp_path), st, step=1)
    # strip the opt keys to fabricate a round-1 checkpoint
    data = dict(np.load(path))
    old = {k: v for k, v in data.items() if not k.startswith("__opt__/")}
    np.savez(path, **old)
    resumed = C.restore_into(_tiny_state(), path)
    assert int(resumed.step) == 1
    np.testing.assert_array_equal(np.asarray(resumed.params["w"]), np.asarray(st.params["w"]))
