"""Fused dual-axis soft-argmax over a flat correlation volume.

The UFC head extracts BOTH flow directions from the same (B, Q, S) f32
correlation (models/ufc.py): softmax over S -> expected source coordinate per
q row (mapping_fwd), and softmax over Q -> expected coordinate per s column
(mapping_bwd).  Composed from jnp ops that costs, per direction, ~6 full
passes over the ~400 MB volume (max / exp / sum / divide / two coordinate
dots) plus — for the axis-1 direction — a full 400 MB layout transpose so the
reduction lands on the minor axis, and the autodiff backward re-reads
comparable traffic (reference analogue: softmax_with_temperature +
soft_argmax marginals, models/base/geometry.py:16-48).

This kernel streams the volume ONCE for the forward of BOTH directions:
row statistics (max / partition / coordinate dots over lanes) fall out
per-block, and column statistics accumulate across row blocks with the
online-softmax rescaling trick (running max + exp-rescale of the partial
sums, the flash-attention recurrence).  The custom VJP streams the volume
once more, rebuilding both softmaxes from the saved statistics and emitting

    dc[q, s] = p1[q, s]/beta * ((xv_s[s]-gx1[q])*dgx1[q] + (yv_s[s]-gy1[q])*dgy1[q])
             + p2[q, s]/beta * ((xv_q[q]-gx2[s])*dgx2[s] + (yv_q[q]-gy2[s])*dgy2[s])

(the softmax-expectation derivative, both directions in one elementwise
pass).  Net: ~14 volume passes + a transpose -> 2 passes.

Values match ops/correlation.py:soft_argmax_flat to f32 round-off (online
rescaling reassociates the partition sums); equality is pinned in
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(c_ref, xvs_ref, yvs_ref, xvq_ref, yvq_ref,
                row_ref, col_ref, *, beta, nq):
    q = pl.program_id(1)
    c = c_ref[0]                                   # (block_q, S) f32
    inv_b = 1.0 / beta

    # row (axis=2 softmax) statistics: private to this block
    m1 = jnp.max(c, axis=1)                        # (block_q,)
    e1 = jnp.exp((c - m1[:, None]) * inv_b)
    z1 = jnp.sum(e1, axis=1)
    gxu1 = jnp.sum(e1 * xvs_ref[0][None, :], axis=1)
    gyu1 = jnp.sum(e1 * yvs_ref[0][None, :], axis=1)
    row_ref[0, 0] = jnp.stack([m1, z1, gxu1, gyu1], axis=0)   # (4, block_q)

    # column (axis=1 softmax) statistics: online accumulation across blocks
    bm = jnp.max(c, axis=0)                        # (S,)
    xq = xvq_ref[0][:, None]                       # (block_q, 1)
    yq = yvq_ref[0][:, None]

    @pl.when(q == 0)
    def _init():
        e2 = jnp.exp((c - bm[None, :]) * inv_b)
        col_ref[0] = jnp.stack(
            [bm, jnp.sum(e2, axis=0), jnp.sum(e2 * xq, axis=0), jnp.sum(e2 * yq, axis=0)],
            axis=0,
        )

    @pl.when(q > 0)
    def _update():
        prev = col_ref[0]
        m_old = prev[0]
        m_new = jnp.maximum(m_old, bm)
        scale = jnp.exp((m_old - m_new) * inv_b)
        e2 = jnp.exp((c - m_new[None, :]) * inv_b)
        col_ref[0] = jnp.stack(
            [
                m_new,
                prev[1] * scale + jnp.sum(e2, axis=0),
                prev[2] * scale + jnp.sum(e2 * xq, axis=0),
                prev[3] * scale + jnp.sum(e2 * yq, axis=0),
            ],
            axis=0,
        )


def _bwd_kernel(c_ref, row_ref, col_ref, dr_ref, dc_ref, xvs_ref, yvs_ref,
                xvq_ref, yvq_ref, out_ref, *, beta):
    c = c_ref[0]                                   # (block_q, S)
    inv_b = 1.0 / beta
    m1, z1, gx1, gy1 = (row_ref[0][i] for i in range(4))      # (block_q,)
    m2, z2, gx2, gy2 = (col_ref[0][i] for i in range(4))      # (S,)
    dgx1, dgy1 = dr_ref[0][0], dr_ref[0][1]                   # (block_q,)
    dgx2, dgy2 = dc_ref[0][0], dc_ref[0][1]                   # (S,)
    p1 = jnp.exp((c - m1[:, None]) * inv_b) / z1[:, None]
    p2 = jnp.exp((c - m2[None, :]) * inv_b) / z2[None, :]
    t1 = (xvs_ref[0][None, :] - gx1[:, None]) * dgx1[:, None] \
        + (yvs_ref[0][None, :] - gy1[:, None]) * dgy1[:, None]
    t2 = (xvq_ref[0][:, None] - gx2[None, :]) * dgx2[None, :] \
        + (yvq_ref[0][:, None] - gy2[None, :]) * dgy2[None, :]
    out_ref[0] = (p1 * t1 + p2 * t2) * inv_b


def _coord_vectors(n, dtype):
    hs = int(round(n ** 0.5))
    ws = n // hs
    assert hs * ws == n, (hs, ws, n)
    ar = jnp.arange(n)
    xv = jnp.linspace(-1.0, 1.0, ws, dtype=dtype)[ar % ws]
    yv = jnp.linspace(-1.0, 1.0, hs, dtype=dtype)[ar // ws]
    return xv, yv, hs, ws


def _block_q(Q, S):
    # the kernels hold the (bq, S) c block double-buffered PLUS the exp()
    # temporaries of both directions on the scoped-vmem stack (~16 MB):
    # a 2 MB block keeps the whole working set ~10 MB (bq=512 OOM'd by 684 KB
    # at S=4096)
    bq = max(8, min(512, (2 * 1024 * 1024) // max(1, S * 4)))
    while Q % bq:
        bq //= 2
    return max(bq, 8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def soft_argmax_both(c: jnp.ndarray, beta: float = 0.02):
    """c: (B, Q, S) f32 -> (mapping_fwd (B, 2, hq, wq), mapping_bwd (B, 2, hs, ws)),
    equal to (soft_argmax_flat(c, axis=2), soft_argmax_flat(c, axis=1))."""
    out, _ = _fwd(c, beta)
    return out


def _stats(c, beta):
    B, Q, S = c.shape
    xvs, yvs, hs_s, ws_s = _coord_vectors(S, c.dtype)
    xvq, yvq, hs_q, ws_q = _coord_vectors(Q, c.dtype)
    bq = _block_q(Q, S)
    interpret = jax.default_backend() not in ("tpu", "axon")
    vec = lambda n: pl.BlockSpec((1, n), lambda b, q: (0, 0), memory_space=pltpu.VMEM)
    row, col = pl.pallas_call(
        functools.partial(_fwd_kernel, beta=beta, nq=Q // bq),
        out_shape=(
            jax.ShapeDtypeStruct((B, Q // bq, 4, bq), jnp.float32),
            jax.ShapeDtypeStruct((B, 4, S), jnp.float32),
        ),
        grid=(B, Q // bq),
        in_specs=[
            pl.BlockSpec((1, bq, S), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM),
            vec(S), vec(S),
            pl.BlockSpec((1, bq), lambda b, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda b, q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 4, bq), lambda b, q: (b, q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, S), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(c, xvs[None], yvs[None], xvq[None], yvq[None])
    # (B, Q//bq, 4, bq) -> (B, 4, Q)
    row = row.transpose(0, 2, 1, 3).reshape(B, 4, Q)
    return row, col, (xvs, yvs, xvq, yvq), (hs_q, ws_q, hs_s, ws_s), bq


def _fwd(c, beta):
    B, Q, S = c.shape
    row, col, _, (hq, wq, hs, ws), _ = _stats(c, beta)
    gx1 = row[:, 2] / row[:, 1]
    gy1 = row[:, 3] / row[:, 1]
    gx2 = col[:, 2] / col[:, 1]
    gy2 = col[:, 3] / col[:, 1]
    mapping_fwd = jnp.stack([gx1, gy1], axis=1).reshape(B, 2, hq, wq)
    mapping_bwd = jnp.stack([gx2, gy2], axis=1).reshape(B, 2, hs, ws)
    return (mapping_fwd, mapping_bwd), (c, row, col, gx1, gy1, gx2, gy2)


def _bwd(beta, res, cotangents):
    c, row, col, gx1, gy1, gx2, gy2 = res
    dfwd, dbwd = cotangents
    B, Q, S = c.shape
    xvs, yvs, _, _ = _coord_vectors(S, c.dtype)
    xvq, yvq, _, _ = _coord_vectors(Q, c.dtype)
    bq = _block_q(Q, S)
    interpret = jax.default_backend() not in ("tpu", "axon")

    # finalized per-row / per-column stats (m, z, gx, gy)
    rowf = jnp.stack([row[:, 0], row[:, 1], gx1, gy1], axis=1)   # (B, 4, Q)
    colf = jnp.stack([col[:, 0], col[:, 1], gx2, gy2], axis=1)   # (B, 4, S)
    dr = dfwd.reshape(B, 2, Q)
    dc_ = dbwd.reshape(B, 2, S)
    vec = lambda n: pl.BlockSpec((1, n), lambda b, q: (0, 0), memory_space=pltpu.VMEM)
    grad = pl.pallas_call(
        functools.partial(_bwd_kernel, beta=beta),
        out_shape=jax.ShapeDtypeStruct((B, Q, S), jnp.float32),
        grid=(B, Q // bq),
        in_specs=[
            pl.BlockSpec((1, bq, S), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, bq), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, S), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bq), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, S), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM),
            vec(S), vec(S),
            pl.BlockSpec((1, bq), lambda b, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda b, q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, S), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(c, rowf, colf, dr, dc_, xvs[None], yvs[None], xvq[None], yvq[None])
    return (grad,)


soft_argmax_both.defvjp(_fwd, _bwd)
