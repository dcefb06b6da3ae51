"""Pallas TPU kernel: fused banded sampling of ALL small feature levels.

The render path samples the three UFC feature levels (16^2, 32^2, 64^2 —
256 channels each) at the SAME normalized epipolar coordinates (reference
CoPoNeRF.py:312,370 grid_samples one concatenated pyramid).  The per-level
banded one-hot kernels are grid-step-overhead-bound (~1.6 us/step across
a (B, P/block, HW/chunk) grid, 6 launches per chunk); here ONE kernel per
sample set holds all three tables VMEM-resident (2.6 MB bf16 total),
computes per-level pixel coordinates from the shared normalized input on
the VPU, and walks each level's band with an in-kernel dynamic loop —
no h-grid axis, no per-level launches.

Token order: SAMPLE-MAJOR (narrow bands).  Forward-only (eval fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EDGE_EPS = 1e-5


def _kernel(band_ref, xn_ref, t0, t1, t2, o0, o1, o2, *, block_p, subs, hws, zeros_mode):
    b = pl.program_id(0)
    p = pl.program_id(1)
    xn = xn_ref[0, 0, :]
    yn = xn_ref[0, 1, :]
    for l, (tref, oref, (Hl, Wl), sub) in enumerate(
        zip((t0, t1, t2), (o0, o1, o2), hws, subs)
    ):
        # align_corners=False unnormalization (ops/grid_sample semantics)
        x = ((xn + 1.0) * Wl - 1.0) * 0.5
        y = ((yn + 1.0) * Hl - 1.0) * 0.5
        if not zeros_mode:
            x = jnp.clip(x, 0.0, Wl - 1.0 - _EDGE_EPS)
            y = jnp.clip(y, 0.0, Hl - 1.0 - _EDGE_EPS)
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        corners = []
        for a in (0, 1):
            for c in (0, 1):
                wc = (wx if c else 1.0 - wx) * (wy if a else 1.0 - wy)
                xi = x0 + c
                yi = y0 + a
                idx = yi * Wl + xi
                if zeros_mode:
                    idx = jnp.where((xi >= 0) & (xi < Wl) & (yi >= 0), idx, -1)
                corners.append((idx, wc))
        base_ids = jax.lax.broadcasted_iota(jnp.int32, (sub, block_p), 0)
        lo = band_ref[b, 2 * l, p]
        hi = band_ref[b, 2 * l + 1, p]

        def body(h, acc, corners=corners, base_ids=base_ids, tref=tref, sub=sub):
            ids = base_ids + h * sub
            mt = jnp.zeros((sub, block_p), jnp.float32)
            for idx, wc in corners:
                mt = mt + jnp.where(ids == idx[None, :], wc[None, :], 0.0)
            chunk = tref[0, pl.ds(h * sub, sub), :]
            return acc + jax.lax.dot_general(
                mt.astype(jnp.bfloat16), chunk.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            lo, hi + 1, body, jnp.zeros((block_p, oref.shape[-1]), jnp.float32)
        )
        oref[0] = acc.astype(oref.dtype)


def multilevel_banded_sample(
    tables, grid_norm, padding_mode: str, out_dtype=jnp.bfloat16,
    block_p: int = 2048, sub: int = 512,
):
    """tables: 3 NHWC feature maps (B, H_l, W_l, C_l), HW_l <= 4096;
    grid_norm: (B, P, 2) coords in [-1, 1] ((x, y), align_corners=False,
    NaN/Inf pre-scrubbed for zeros mode).  Returns 3 x (B, P, C_l)."""
    B = tables[0].shape[0]
    P = grid_norm.shape[1]
    zeros_mode = padding_mode != "border"
    gx = grid_norm[..., 0].astype(jnp.float32)
    gy = grid_norm[..., 1].astype(jnp.float32)
    if zeros_mode:
        # scrub to a finite far-out sentinel: corners never match any cell
        gx = jnp.clip(jnp.nan_to_num(gx, nan=-1e4, posinf=1e4, neginf=-1e4), -1e4, 1e4)
        gy = jnp.clip(jnp.nan_to_num(gy, nan=-1e4, posinf=1e4, neginf=-1e4), -1e4, 1e4)
    pad = (-P) % block_p
    if pad:
        gx = jnp.pad(gx, ((0, 0), (0, pad)), constant_values=-1e4)
        gy = jnp.pad(gy, ((0, 0), (0, pad)), constant_values=-1e4)
    Pp = P + pad
    NP = Pp // block_p
    xn = jnp.stack([gx, gy], axis=1)                     # (B, 2, Pp)

    hws = tuple((t.shape[1], t.shape[2]) for t in tables)
    subs = tuple(min(sub, h * w) for (h, w) in hws)
    bands = []
    for (Hl, Wl), sub_l in zip(hws, subs):
        y_px = ((gy + 1.0) * Hl - 1.0) * 0.5
        yc = jnp.clip(y_px, 0.0, Hl - 1.0).reshape(B, NP, block_p)
        rmin = jnp.floor(yc.min(axis=-1)).astype(jnp.int32)
        rmax = jnp.floor(yc.max(axis=-1)).astype(jnp.int32) + 1
        n_ch = (Hl * Wl) // sub_l
        lo = (rmin * Wl) // sub_l
        hi = jnp.minimum((rmax * Wl + Wl - 1) // sub_l, n_ch - 1)
        bands.extend([lo, hi])
    band = jnp.stack(bands, axis=1)                      # (B, 6, NP) int32

    flat = [t.reshape(B, -1, t.shape[-1]).astype(jnp.bfloat16) for t in tables]
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NP),
        in_specs=[
            pl.BlockSpec((1, 2, block_p), lambda b, p, band: (b, 0, p), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, t.shape[1], t.shape[2]), lambda b, p, band: (b, 0, 0), memory_space=pltpu.VMEM)
            for t in flat
        ],
        out_specs=tuple(
            pl.BlockSpec((1, block_p, t.shape[-1]), lambda b, p, band: (b, p, 0), memory_space=pltpu.VMEM)
            for t in flat
        ),
    )
    outs = pl.pallas_call(
        functools.partial(
            _kernel, block_p=block_p, subs=subs, hws=hws, zeros_mode=zeros_mode
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, Pp, t.shape[-1]), out_dtype) for t in flat
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(band, xn, *flat)
    return [o[:, :P] for o in outs]
