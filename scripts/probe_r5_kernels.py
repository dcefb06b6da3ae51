"""Micro-bench the render hot kernels at their EXACT cf[16,4] render shapes
on the real chip: the banded one-hot samplers per level, weighted_sum_smaj
variants (block_n sweep, vsum fold), and split_dense_relu block_t sweep.

Usage: python scripts/probe_r5_kernels.py [group ...]
Groups: sample wsum sdr   (default: all)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np

from coponerf_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from coponerf_tpu.utils.timing import bench_fn  # noqa: E402

GROUPS = [a for a in sys.argv[1:] if not a.startswith("-")] or ["sample", "wsum", "sdr"]

BV = 2          # view rows (1 image pair)
N = 32768       # rays per chunk
S1, S2 = 16, 4  # cf samples
rng = np.random.RandomState(0)


def t(name, fn, *args):
    sec = bench_fn(fn, *args)
    print(f"{name:58s} {sec * 1e3:8.2f} ms", flush=True)
    return sec


def probe_samplers():
    from coponerf_tpu.ops.pallas.bilinear_sample import grid_sample_onehot

    P = N * S1
    for hw_side, C in ((16, 256), (32, 128), (64, 64)):
        z = jnp.asarray(rng.randn(BV, hw_side, hw_side, C).astype(np.float32))
        pts = jnp.asarray(rng.rand(BV, P, 2).astype(np.float32) * 2 - 1)
        hw = hw_side * hw_side
        base = dict(padding_mode="border", out_dtype=jnp.bfloat16)
        t(
            f"sample {hw_side}^2 C={C} banded bhw={max(256, hw // 4)} bp=2048 (cur)",
            lambda z, p: grid_sample_onehot(
                z, p, banded=True, block_hw=max(256, hw // 4), block_p=2048, **base
            ),
            z, pts,
        )
        for bp in (4096, 8192):
            # selection block (bhw, bp) f32 must fit scoped vmem (~16 MB)
            if max(256, hw // 4) * bp * 4 > 12 * 1024 * 1024:
                continue
            t(
                f"sample {hw_side}^2 C={C} banded bhw={max(256, hw // 4)} bp={bp}",
                lambda z, p, bp=bp: grid_sample_onehot(
                    z, p, banded=True, block_hw=max(256, hw // 4), block_p=bp, **base
                ),
                z, pts,
            )
        if hw <= 1024:
            # non-banded full-table at the small grids
            t(
                f"sample {hw_side}^2 C={C} full bhw={hw} bp=4096",
                lambda z, p: grid_sample_onehot(
                    z, p, banded=False, block_hw=hw, block_p=4096, **base
                ),
                z, pts,
            )
        if hw == 4096:
            # bhw sweep at 64^2: narrower bands = finer skip granularity
            for bhw, bp in ((512, 2048), (512, 4096), (2048, 2048)):
                if bhw * bp * 4 > 12 * 1024 * 1024:
                    continue
                t(
                    f"sample {hw_side}^2 C={C} banded bhw={bhw} bp={bp}",
                    lambda z, p, bhw=bhw, bp=bp: grid_sample_onehot(
                        z, p, banded=True, block_hw=bhw, block_p=bp, **base
                    ),
                    z, pts,
                )


def probe_wsum():
    from coponerf_tpu.ops.pallas.weighted_sum import weighted_sum_smaj

    C = 832
    for S in (S1, S2):
        pre = jnp.asarray(rng.randn(BV, S * N, C).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.rand(BV, N, S).astype(np.float32))
        t(f"wsum S={S} block_n=32 (old)", lambda p, w: weighted_sum_smaj(p, w, S, block_n=32), pre, w)
        for bn in (128, 256, 512):
            if S * bn * C * 2 > 8 * 1024 * 1024:
                continue
            t(f"wsum S={S} block_n={bn}", lambda p, w, bn=bn: weighted_sum_smaj(p, w, S, block_n=bn), pre, w)
            t(f"wsum S={S} block_n={bn} vsum", lambda p, w, bn=bn: weighted_sum_smaj(p, w, S, block_n=bn, vsum=2), pre, w)
        t(f"wsum S={S} auto vsum", lambda p, w: weighted_sum_smaj(p, w, S, vsum=2), pre, w)


def probe_sdr():
    from coponerf_tpu.ops.pallas.split_matmul import split_dense_relu

    latent = 832
    T = N * S1
    # mimic the render parts: 4 level samples + tanh(pt) 3ch
    parts = tuple(
        jnp.asarray(rng.randn(BV, T, c).astype(np.float32)).astype(jnp.bfloat16)
        for c in (256, 128, 64, 64, 3)
    )
    kernel = jnp.asarray(rng.randn(latent + 3, latent).astype(np.float32) * 0.02)
    bias = jnp.zeros((latent,), jnp.float32)
    fk = jnp.asarray(rng.randn(latent, 128).astype(np.float32) * 0.02)
    from coponerf_tpu.ops.pallas import split_matmul as sm

    for bt in (512, 1024, 2048):
        t(
            f"split_dense_relu T={T} block_t={bt}",
            lambda *p, bt=bt: sm._forward(p, kernel, bias, fk, jnp.bfloat16, True, block_t=bt),
            *parts,
        )


if __name__ == "__main__":
    if "sample" in GROUPS:
        probe_samplers()
    if "wsum" in GROUPS:
        probe_wsum()
    if "sdr" in GROUPS:
        probe_sdr()
