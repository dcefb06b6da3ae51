"""Native scene-cache runtime: build, roundtrip, fused processing."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from coponerf_tpu.data import fast_loader  # noqa: E402


@pytest.fixture(scope="module")
def cache_file(tmp_path_factory):
    try:
        fast_loader.get_lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native toolchain unavailable: {e}")
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (5, 64, 96, 3), np.uint8)
    ts = np.arange(5, dtype=np.int64) * 1000
    path = str(tmp_path_factory.mktemp("cache") / "scene.cache")
    fast_loader.write_cache(path, ts, frames)
    return path, frames, ts


def test_roundtrip(cache_file):
    path, frames, ts = cache_file
    c = fast_loader.SceneCache(path)
    assert c.n_frames == 5
    assert (c.height, c.width) == (64, 96)
    np.testing.assert_array_equal(c.timestamps, ts)
    np.testing.assert_array_equal(c.frame(3), frames[3])
    with pytest.raises(IndexError):
        c.frame(99)


def test_truncated_cache_rejected(cache_file, tmp_path):
    """A corrupt/short file must fail cleanly at open, not SIGBUS in frame
    accessors (scenecache_open validates size vs header+ts+payload)."""
    path, _, _ = cache_file
    blob = open(path, "rb").read()
    for cut in (4, 30, len(blob) // 2, len(blob) - 1):
        bad = tmp_path / f"trunc_{cut}.cache"
        bad.write_bytes(blob[:cut])
        with pytest.raises(IOError):
            fast_loader.SceneCache(str(bad))
    # header present but frame count lies about the payload
    import struct
    hacked = bytearray(blob)
    hacked[8:16] = struct.pack("<Q", 10 ** 6)
    bad = tmp_path / "hacked_n.cache"
    bad.write_bytes(bytes(hacked))
    with pytest.raises(IOError):
        fast_loader.SceneCache(str(bad))


def test_processed_matches_cv2_pipeline(cache_file):
    cv2 = pytest.importorskip("cv2")
    path, frames, _ = cache_file
    c = fast_loader.SceneCache(path)
    got = c.processed(2, out_size=32)
    # oracle: square crop -> cv2 bilinear resize -> [-1, 1]
    f = frames[2]
    d = min(f.shape[:2])
    cy, cx = f.shape[0] // 2, f.shape[1] // 2
    crop = f[cy - d // 2: cy + d // 2, cx - d // 2: cx + d // 2]
    ref = cv2.resize(crop, (32, 32), interpolation=cv2.INTER_LINEAR).astype(np.float32) / 127.5 - 1
    np.testing.assert_allclose(got, ref, atol=2e-2)  # cv2 uses fixed-point interp
    assert np.abs(got - ref).mean() < 5e-3
