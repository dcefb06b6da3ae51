"""Checkpoint save/load roundtrips (npz default + optional orbax backend)."""

import numpy as np
import pytest

from coponerf_tpu.training import checkpoint as C


class FakeState:
    params = {"layer": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
              "bias": np.ones(4, np.float32)}
    batch_stats = {"bn": {"mean": np.zeros(4, np.float32)}}

    def replace(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)
        return self


def test_npz_roundtrip(tmp_path):
    path = C.save(str(tmp_path), FakeState(), step=7)
    params, batch_stats, step = C.load(path)
    assert step == 7
    np.testing.assert_array_equal(params["layer"]["kernel"], FakeState.params["layer"]["kernel"])
    np.testing.assert_array_equal(batch_stats["bn"]["mean"], np.zeros(4))
    st = C.restore_into(FakeState(), path)
    np.testing.assert_array_equal(st.params["layer"]["kernel"], FakeState.params["layer"]["kernel"])


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = C.save_orbax(str(tmp_path), FakeState(), step=3)
    params, batch_stats, step = C.load_orbax(path)
    assert step == 3
    np.testing.assert_array_equal(params["layer"]["kernel"], FakeState.params["layer"]["kernel"])
