"""Pallas TPU kernel: fused split-input dense + bias + relu.

The render path's W1 (query_encode_latent, reference CoPoNeRF.py:384-408
applied at models/CoPoNeRF.py:393) consumes the concat of four sampled
feature tensors plus a 3-channel tanh positional term.  Materializing that
(tokens, 835) concat in HBM costs ~50 ms/image at 256^2 eval (trace-verified,
~6x the pure-bandwidth cost), and an XLA K-split accumulator chain is worse
(each partial product round-trips the (tokens, 832) accumulator).  This
kernel reads the pieces directly and K-accumulates in VMEM: each input is
streamed exactly once and the output written exactly once.

Forward only — the backward (training path, where token counts are ~3 orders
of magnitude smaller) recomputes with plain XLA ops via the custom VJP below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p0, p1, p2, pc, pt, w0, w1, w2, wc, wt, b, fk, out_ref, k_ref, *, relu):
    acc = jnp.dot(p0[0], w0[:], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(p1[0], w1[:], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(p2[0], w2[:], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(pc[0], wc[:], preferred_element_type=jnp.float32)
    # the 3-wide positional part as VPU FMAs (a K=3 matmul wastes the MXU)
    t = pt[0].astype(jnp.float32)
    for j in range(3):
        acc = acc + t[:, j:j + 1] * wt[j:j + 1, :].astype(jnp.float32)
    acc = acc + b[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out = acc.astype(out_ref.dtype)
    out_ref[0] = out
    # fused second head: the 128-wide folded key product, computed while the
    # relu'd activation is still in VMEM (re-reading it from HBM costs ~6x
    # the matmul itself)
    k_ref[0] = jnp.dot(out, fk[:], preferred_element_type=jnp.float32).astype(k_ref.dtype)


def _forward(parts, kernel, bias, fk, out_dtype, relu, block_t=None, swap_k_pairs=False):
    p0, p1, p2, pc, pt = parts
    B, T, _ = p0.shape
    if block_t is None:
        # f32 operands double every VMEM buffer; 1024-token blocks fit only
        # in bf16 (measured: 23 MB scoped vmem at f32/1024 vs the 16 MB cap)
        block_t = 1024 if p0.dtype == jnp.bfloat16 else 384
    N = kernel.shape[1]
    NK = fk.shape[1]
    splits = [p.shape[-1] for p in parts]
    offs = [0]
    for s in splits:
        offs.append(offs[-1] + s)
    assert offs[-1] == kernel.shape[0], (offs, kernel.shape)
    kd = p0.dtype
    ws = [
        jax.lax.slice_in_dim(kernel, offs[i], offs[i + 1], axis=0).astype(kd)
        for i in range(len(splits))
    ]
    bias2d = bias.reshape(1, N)

    pad = (-T) % block_t
    if pad:
        parts = [jnp.pad(p, ((0, 0), (0, pad), (0, 0))) for p in parts]
    Tp = T + pad
    grid = (B, Tp // block_t)
    interpret = jax.default_backend() not in ("tpu", "axon")

    def part_spec(c):
        return pl.BlockSpec((1, block_t, c), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)

    def weight_spec(c, n=N):
        return pl.BlockSpec((c, n), lambda b, t: (0, 0), memory_space=pltpu.VMEM)

    out, k = pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, N), out_dtype),
            jax.ShapeDtypeStruct((B, Tp, NK), out_dtype),
        ),
        grid=grid,
        in_specs=[part_spec(c) for c in splits]
        + [weight_spec(c) for c in splits]
        + [
            pl.BlockSpec((1, N), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            weight_spec(N, NK),
        ],
        out_specs=(
            pl.BlockSpec((1, block_t, N), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            # optionally write the key head into the PAIRED view row
            # (b0 <-> b1 within each view pair): the renderer's slot-b keys
            # enter the joint chain view-flipped, and flipping here saves a
            # 536 MB reverse+copy per chunk (trace-verified ~13 ms/image)
            pl.BlockSpec(
                (1, block_t, NK),
                (lambda b, t: (b // 2 * 2 + 1 - b % 2, t, 0))
                if swap_k_pairs else (lambda b, t: (b, t, 0)),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*parts, *ws, bias2d, fk.astype(kd))
    return out[:, :T], k[:, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def split_dense_relu(parts, kernel, bias, fk, out_dtype=jnp.bfloat16, relu=True, swap_k_pairs=False):
    """Fused: out = relu(concat(parts, -1) @ kernel + bias); k = out @ fk —
    without materializing the concat, and with the second (128-wide folded
    key) head computed while ``out`` is still in VMEM.  parts: 5 tensors
    (B, T, K_i) in the compute dtype; kernel (sum K_i, N), bias (N,), fk
    (N, NK) may be f32 (cast to the part dtype inside).  Returns
    (out (B, T, N), k (B, T, NK)) in ``out_dtype``; with swap_k_pairs the
    k rows are written view-pair-swapped (row 2i <-> 2i+1)."""
    return _forward(tuple(parts), kernel, bias, fk, out_dtype, relu, swap_k_pairs=swap_k_pairs)


def _fwd(parts, kernel, bias, fk, out_dtype, relu, swap_k_pairs):
    out, k = _forward(tuple(parts), kernel, bias, fk, out_dtype, relu, swap_k_pairs=swap_k_pairs)
    return (out, k), (tuple(parts), kernel, fk, bias, out)


def _bwd(out_dtype, relu, swap_k_pairs, res, gs):
    parts, kernel, fk, bias, out = res
    g_out, g_k = gs
    if swap_k_pairs:
        R = g_k.shape[0]
        g_k = g_k.reshape(R // 2, 2, *g_k.shape[1:])[:, ::-1].reshape(g_k.shape)
    g_k = g_k.astype(jnp.float32)
    out_f = out.astype(jnp.float32)
    # k = out @ fk: route the key cotangent into out's, and accumulate dfk
    g = g_out.astype(jnp.float32) + g_k @ fk.astype(jnp.float32).T
    dfk = jnp.einsum("btn,btm->nm", out_f, g_k).astype(fk.dtype)
    if relu:
        g = g * (out_f > 0)
    splits = [p.shape[-1] for p in parts]
    offs = [0]
    for s in splits:
        offs.append(offs[-1] + s)
    dparts = tuple(
        (
            g @ jax.lax.slice_in_dim(kernel, offs[i], offs[i + 1], axis=0)
            .astype(jnp.float32).T
        ).astype(parts[i].dtype)
        for i in range(len(splits))
    )
    x = jnp.concatenate([p.astype(jnp.float32) for p in parts], axis=-1)
    dk = jnp.einsum("btk,btn->kn", x, g).astype(kernel.dtype)
    db = jnp.sum(g, axis=(0, 1)).astype(bias.dtype)
    return dparts, dk, db, dfk


split_dense_relu.defvjp(_fwd, _bwd)
