"""Pallas TPU kernel: attention-weighted sample sum over the S axis.

The render path's value contraction ``sum_s w[s] * pre[s]`` (reference
CoPoNeRF.py:455-461, with the linear value maps algebraically deferred to
per-ray tokens — see models/coponerf.py render()) is a pure bandwidth
reduction over the 832-wide pre-activations.  XLA reassociates the
(multiply, V-sum, S-sum) chain into a two-stage reduce that materializes a
per-token f32 copy of the whole activation (3.5 GB per pass, trace-verified
at 45 ms vs the ~5 ms bandwidth bound).  This kernel streams the bf16
activation exactly once per pass and accumulates in f32 registers.

Token order is SAMPLE-MAJOR: pre is (R, S*N, C) with token t = s*N + n, the
order the fast render path uses (models/coponerf.py).  Forward-only: the
training path (tiny token counts) keeps the XLA reduction.

r5: the view sum is folded into the kernel (``vsum=V``): grid order puts the
view rows innermost so the (N-block, C) f32 accumulator block is revisited
consecutively and stays in VMEM — the old two-step form wrote per-view f32
copies (218 MB each) that a separate XLA reduce re-read (~1.07 ms x8/image,
r5 trace).  Blocks are sized adaptively (~4 MB of activation per grid step):
the old fixed block_n=32 cost ~2k grid steps per stage-A pass at ~1 us of
step overhead each, ~3x the bandwidth bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pre_ref, w_ref, out_ref, *, S):
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for s in range(S):
        acc = acc + pre_ref[0, s].astype(jnp.float32) * w_ref[0, :, s][:, None]
    out_ref[0] = acc.astype(out_ref.dtype)


def _kernel_vsum(pre_ref, w_ref, out_ref, *, S):
    v = pl.program_id(2)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for s in range(S):
        acc = acc + pre_ref[0, s].astype(jnp.float32) * w_ref[0, :, s][:, None]

    @pl.when(v == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(v > 0)
    def _acc():
        out_ref[0] = out_ref[0] + acc


def _auto_block_n(S: int, C: int, itemsize: int, N: int) -> int:
    """Largest power-of-two block_n <= 512 keeping the streamed activation
    block around 4 MB (fits VMEM double-buffered alongside the f32 out)."""
    budget = 4 * 1024 * 1024
    bn = budget // max(1, S * C * itemsize)
    out = 32
    while out * 2 <= min(bn, 512, max(32, N)):
        out *= 2
    return out


def weighted_sum_smaj(
    pre: jnp.ndarray,
    w: jnp.ndarray,
    S: int,
    block_n: int | None = None,
    vsum: int | None = None,
) -> jnp.ndarray:
    """pre: (R, S*N, C) sample-major tokens; w: (R, N, S) f32 weights
    (ray-major — S on the lane axis keeps the block tiling legal and matches
    the softmax output layout directly).

    Returns (R, N, C) f32 = sum_s w[:, n, s] * pre[:, s*N + n], or with
    ``vsum=V`` (R must be B*V) the view-row sum (B, N, C) f32 =
    sum_v sum_s w[b*V+v, n, s] * pre[b*V+v, s*N + n]."""
    R, T, C = pre.shape
    N = T // S
    assert S * N == T, (S, N, T)
    if block_n is None:
        block_n = _auto_block_n(S, C, pre.dtype.itemsize, N)
    pad = (-N) % block_n
    if pad:
        pre = jnp.pad(pre.reshape(R, S, N, C), ((0, 0), (0, 0), (0, pad), (0, 0))).reshape(R, S * (N + pad), C)
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
    Np = N + pad
    interpret = jax.default_backend() not in ("tpu", "axon")
    if vsum is None:
        out = pl.pallas_call(
            functools.partial(_kernel, S=S),
            out_shape=jax.ShapeDtypeStruct((R, Np, C), jnp.float32),
            grid=(R, Np // block_n),
            in_specs=[
                pl.BlockSpec((1, S, block_n, C), lambda r, n: (r, 0, n, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n, S), lambda r, n: (r, n, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_n, C), lambda r, n: (r, n, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(pre.reshape(R, S, Np, C), w)
        return out[:, :N]

    V = vsum
    assert R % V == 0, (R, V)
    B = R // V
    out = pl.pallas_call(
        functools.partial(_kernel_vsum, S=S),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
        # view rows innermost: the out block is revisited consecutively and
        # lives in VMEM across the V accumulation steps
        grid=(B, Np // block_n, V),
        in_specs=[
            pl.BlockSpec(
                (1, S, block_n, C), lambda b, n, v: (b * V + v, 0, n, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_n, S), lambda b, n, v: (b * V + v, n, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_n, C), lambda b, n, v: (b, n, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pre.reshape(R, S, Np, C), w)
    return out[:, :N]
