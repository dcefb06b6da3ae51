"""Measure BASELINE config 5: 30-frame 256^2 novel-view trajectory render
wall-time with encode amortized once (reference analogue: test.py:102-108
circle path + realestate10k_dataio.py:80-172).

The whole path renders in ONE jitted dispatch (lax.map over poses), so on
the ~30 ms/dispatch tunneled backend the timing below is honest device time
plus a single dispatch, not 30 of them.

Usage: python scripts/bench_trajectory.py [n_frames] [image_size] [--cf A,B] [--chunk N]
"""

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

# serving quality config = the bench.py default: quality-gated two-stage
# coarse-to-fine sampling (PARITY.md gate 1, +0.027 dB on trained weights)
# and the 32768-ray chunk sweep optimum (PERF.md)
CF_DEFAULT = (16, 4)
CHUNK_DEFAULT = 32768


def main():
    cf, chunk = CF_DEFAULT, CHUNK_DEFAULT
    _pos = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):  # space-separated flag values must not leak into _pos
        a = argv[i]
        if a.startswith("--cf"):
            ab = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            cf = tuple(int(x) for x in ab.split(","))
            i += 1 if "=" in a else 2
        elif a.startswith("--chunk"):
            ab = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            chunk = int(ab)
            i += 1 if "=" in a else 2
        elif a.startswith("-"):
            raise SystemExit(f"unknown flag {a!r} (known: --cf A,B  --chunk N)")
        else:
            _pos.append(a)
            i += 1
    n_frames = int(_pos[0]) if _pos else 30
    size = int(_pos[1]) if len(_pos) > 1 else 256
    chunk = min(chunk, size * size)

    import jax
    import jax.numpy as jnp

    import dataclasses

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.eval.trajectory import render_trajectory
    from coponerf_tpu.utils.fast_init import fast_init

    cfg = dataclasses.replace(
        ModelConfig(), fast_sampling=True, compute_dtype="bfloat16",
        coarse_samples=cf[0], fine_samples=cf[1],
    )
    model = CoPoNeRF(cfg)
    batch_np, _ = make_batch(1, size, 16, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)

    # build the jitted path renderer ONCE (render_trajectory reconstructs its
    # jit closures per call, which retraces — fine for one-shot use, wrong
    # for timing the serving path)
    import numpy as np

    from coponerf_tpu.eval.harness import make_renderer
    from coponerf_tpu.eval.trajectory import interpolate_poses, make_circle, make_path_renderer

    encode, _ = make_renderer(model, chunk=chunk)
    render_path = make_path_renderer(model, chunk=chunk)
    state = encode(variables, batch)
    c2w = np.asarray(batch["context"]["cam2world"])[0]
    path = interpolate_poses(c2w[0], c2w[1], n_frames)
    g = np.stack(np.meshgrid(np.arange(size), np.arange(size)), -1).reshape(-1, 2)
    n_rays = size * size
    fb = {
        "context": batch["context"],
        "query": {
            "uv": jnp.asarray(g.astype(np.float32))[None, None],
            "rgb": jnp.zeros((1, 1, n_rays, 3), jnp.float32),
            "cam2world": jnp.asarray(path[0])[None, None],
            "intrinsics": batch["query"]["intrinsics"],
        },
    }

    t0 = time.time()
    frames = np.asarray(render_path(variables, fb, state, jnp.asarray(path), n_rays))
    t_first = time.time() - t0  # includes compile

    path2 = path.copy()
    path2[:, :3, 3] += make_circle(n_frames, 0.05)
    t0 = time.time()
    frames = np.asarray(render_path(variables, fb, state, jnp.asarray(path2), n_rays))
    t_warm = time.time() - t0
    assert frames.shape[0] == n_frames and frames.shape[-1] == 3

    rays = n_frames * size * size
    print(
        f"trajectory {n_frames}x{size}^2: cold {t_first:.2f}s, warm "
        f"{t_warm:.2f}s ({rays / t_warm / 1e3:.1f}k rays/s incl. encode+fetch)"
    )


if __name__ == "__main__":
    main()
