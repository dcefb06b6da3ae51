"""Pallas TPU kernels: fused epipolar-attention embedding chains.

The two attention rounds (reference CoPoNeRF.py:450-485) hang five small
128-wide Denses plus elementwise glue off every epipolar sample token:

  round 1:  kv = key_map_2(relu(ka + kb_swapped + bias))
            ce = query_embed_2(relu(query_embed(local_coords)))
            dot1 = sum(kv * ce) / 11.31
  round 2:  qre = repeat_embed_2(relu(repeat_embed([z_embed, local_coords])))
            dot2 = sum(qre * ce) / 11.31

Each 128-wide intermediate on the ~2M tokens of a 16k-ray chunk is a 536 MB
HBM round trip, and XLA's op-by-op execution of the chain costs ~90 ms/image
against a ~2 ms matmul bound (trace-verified).  These kernels run the whole
chain per token block in VMEM, emitting only the per-token logits (round 2
recomputes ce in-kernel rather than caching it through HBM).

Blocks span the FULL (small) row axis R = B*V and flatten rows into the
matmul token dim — per-row blocks of width 1 violate the TPU (8, 128) block
tiling on the 2-D logits output.

Token order is SAMPLE-MAJOR (models/coponerf.py fast path).  Forward-only:
training keeps the XLA chain (tiny token counts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SCALE = 1.0 / 11.31


def _round1_kernel(ka, kbs, lc, fkb, wk2, bk2, wq, bq, wq2, bq2, dots_ref, *, R, block_t):
    H = wk2.shape[0]
    kpre = (
        ka[:].reshape(R * block_t, H).astype(jnp.float32)
        + kbs[:].reshape(R * block_t, H).astype(jnp.float32)
        + fkb[0].astype(jnp.float32)
    )
    kv = jnp.dot(
        jnp.maximum(kpre, 0.0).astype(jnp.bfloat16), wk2[:],
        preferred_element_type=jnp.float32,
    ) + bk2[0].astype(jnp.float32)
    lcf = lc[:].reshape(R * block_t, lc.shape[-1])
    h = jnp.dot(lcf.astype(jnp.bfloat16), wq[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + bq[0].astype(jnp.float32), 0.0)
    ce = jnp.dot(h.astype(jnp.bfloat16), wq2[:], preferred_element_type=jnp.float32)
    ce = ce + bq2[0].astype(jnp.float32)
    dots_ref[:] = (jnp.sum(kv * ce, axis=-1) * _INV_SCALE).reshape(R, block_t)


def round1_logits(ka, kbs, lc, fk_bias, wk2, bk2, wq, bq, wq2, bq2, block_t: int = 2048):
    """ka, kbs: (R, T, 128) folded key products (kbs already view-swapped);
    lc: (R, T, 16) local coords.  Returns dots (R, T) f32 only; round 2
    recomputes ce in-kernel."""
    R, T, H = ka.shape
    L = lc.shape[-1]
    pad = (-T) % block_t
    if pad:
        ka = jnp.pad(ka, ((0, 0), (0, pad), (0, 0)))
        kbs = jnp.pad(kbs, ((0, 0), (0, pad), (0, 0)))
        lc = jnp.pad(lc, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    kd = jnp.bfloat16
    interpret = jax.default_backend() not in ("tpu", "axon")

    def tok_spec(c):
        return pl.BlockSpec((R, block_t, c), lambda t: (0, t, 0), memory_space=pltpu.VMEM)

    def w_spec(rows):
        return pl.BlockSpec((rows, H), lambda t: (0, 0), memory_space=pltpu.VMEM)

    dots = pl.pallas_call(
        functools.partial(_round1_kernel, R=R, block_t=block_t),
        out_shape=jax.ShapeDtypeStruct((R, Tp), jnp.float32),
        grid=(Tp // block_t,),
        in_specs=[
            tok_spec(H), tok_spec(H), tok_spec(L),
            w_spec(1), w_spec(H), w_spec(1), w_spec(L), w_spec(1), w_spec(H), w_spec(1),
        ],
        out_specs=pl.BlockSpec((R, block_t), lambda t: (0, t), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        ka, kbs, lc,
        fk_bias.reshape(1, H).astype(jnp.float32),
        wk2.astype(kd), bk2.reshape(1, H),
        wq.astype(kd), bq.reshape(1, H),
        wq2.astype(kd), bq2.reshape(1, H),
    )
    return dots[:, :T]


def _round2_kernel(ze, lc, wq, bq, wq2, bq2, wra, wrb, br, wr2, br2, dots_ref, *, R, V, block_n):
    H = wra.shape[0]
    ze_rows = jnp.concatenate([ze[r // V][None] for r in range(R)], axis=0)
    zef = ze_rows.reshape(R * block_n, H)
    lcf = lc[:, 0].reshape(R * block_n, lc.shape[-1])
    h = jnp.dot(zef.astype(jnp.bfloat16), wra[:], preferred_element_type=jnp.float32)
    h = h + jnp.dot(lcf.astype(jnp.bfloat16), wrb[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + br[0].astype(jnp.float32), 0.0)
    qre = jnp.dot(h.astype(jnp.bfloat16), wr2[:], preferred_element_type=jnp.float32)
    qre = qre + br2[0].astype(jnp.float32)
    # recompute ce from lc (a 536 MB cache round trip costs more than the
    # two tiny matmuls)
    hc = jnp.dot(lcf.astype(jnp.bfloat16), wq[:], preferred_element_type=jnp.float32)
    hc = jnp.maximum(hc + bq[0].astype(jnp.float32), 0.0)
    cef = jnp.dot(hc.astype(jnp.bfloat16), wq2[:], preferred_element_type=jnp.float32)
    cef = cef + bq2[0].astype(jnp.float32)
    dots_ref[0] = (jnp.sum(qre * cef, axis=-1) * _INV_SCALE).reshape(R, block_n)


def round2_logits(ze, lc, wq, bq, wq2, bq2, wra, wrb, br, wr2, br2, S: int, V: int, block_n: int = 2048):
    """ze: (B, N, H) per-ray round-1 latent embedding; lc: (R, S*N, 16)
    sample-major (R = B*V); ce is recomputed in-kernel from lc.
    Returns dots2 (R, S*N) f32."""
    B, N, H = ze.shape
    R, T, L = lc.shape[0], lc.shape[1], lc.shape[2]
    assert T == S * N, (T, S, N)
    block_n = min(block_n, N)
    pad = (-N) % block_n
    lc = lc.reshape(R, S, N, L)
    if pad:
        ze = jnp.pad(ze, ((0, 0), (0, pad), (0, 0)))
        lc = jnp.pad(lc, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Np = N + pad
    kd = jnp.bfloat16
    interpret = jax.default_backend() not in ("tpu", "axon")

    def w_spec(rows):
        return pl.BlockSpec((rows, H), lambda s, n: (0, 0), memory_space=pltpu.VMEM)

    dots = pl.pallas_call(
        functools.partial(_round2_kernel, R=R, V=V, block_n=block_n),
        # logits come out (S, R, Np): a (R, 1, block_n) block on (R, S, Np)
        # would put a 1-wide second-to-last dim against S, violating the
        # (8, 128) block tiling; (1, R, block_n) on (S, R, Np) is legal
        out_shape=jax.ShapeDtypeStruct((S, R, Np), jnp.float32),
        grid=(S, Np // block_n),
        in_specs=[
            pl.BlockSpec((B, block_n, H), lambda s, n: (0, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, block_n, L), lambda s, n: (0, s, n, 0), memory_space=pltpu.VMEM),
            w_spec(L), w_spec(1), w_spec(H), w_spec(1),
            w_spec(H), w_spec(L), w_spec(1), w_spec(H), w_spec(1),
        ],
        out_specs=pl.BlockSpec((1, R, block_n), lambda s, n: (s, 0, n), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(
        ze, lc,
        wq.astype(kd), bq.reshape(1, H), wq2.astype(kd), bq2.reshape(1, H),
        wra.astype(kd), wrb.astype(kd), br.reshape(1, H),
        wr2.astype(kd), br2.reshape(1, H),
    )
    return dots[:, :, :N].transpose(1, 0, 2).reshape(R, S * N)
