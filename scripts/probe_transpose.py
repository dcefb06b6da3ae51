"""Micro-bench the one-hot transpose matmul (gather backward) at the train
step's 256^2 shape: B=12 rows, P=12288 tokens, C=64, HW=65536.  This is the
top single item in the train-step trace (2 x ~54 ms of the 665 ms step).

Variants: block sizes and the mt build dtype (the dense one-hot build is
VPU-compare bound, not MXU bound).
Usage: python scripts/probe_transpose.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from coponerf_tpu.ops.pallas import bilinear_sample as bs  # noqa: E402
from coponerf_tpu.utils.timing import bench_fn  # noqa: E402

B, P, C, HW = 12, 12288, 64, 65536
W_IMG = 256


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, W_IMG - 1, (B, P)).astype(np.float32)
    y = rng.uniform(0, W_IMG - 1, (B, P)).astype(np.float32)
    idx, w = bs._corners_from_pixel_xy(jnp.asarray(x), jnp.asarray(y), W_IMG, zeros_mode=False)
    g = jnp.asarray(rng.standard_normal((B, P, C)).astype(np.float32))

    ref = None
    for kwargs in (
        dict(block_hw=512, block_p=2048),
        dict(block_hw=512, block_p=4096),
        dict(block_hw=512, block_p=12288),
        dict(block_hw=1024, block_p=2048),
        dict(block_hw=256, block_p=2048),
        dict(block_hw=512, block_p=2048, build_dtype=jnp.bfloat16),
        dict(block_hw=512, block_p=4096, build_dtype=jnp.bfloat16),
        dict(block_hw=1024, block_p=4096, build_dtype=jnp.bfloat16),
        dict(block_hw=2048, block_p=4096, build_dtype=jnp.bfloat16),
        dict(block_hw=1024, block_p=12288, build_dtype=jnp.bfloat16),
        dict(block_hw=2048, block_p=12288, build_dtype=jnp.bfloat16),
    ):
        try:
            fn = lambda gg: bs.onehot_transpose_matmul(gg, idx, w, HW, **kwargs)
            out = fn(g)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
            dt = bench_fn(fn, g)
            print(f"{kwargs}: {dt * 1e3:7.2f} ms  relerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"{kwargs}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
