"""Pallas TPU kernel: bilinear sampling as blockwise one-hot matmuls.

Measured on v5e, XLA's gather costs ~50ns per index regardless of slice
size, which makes epipolar feature sampling gather-bound.  For feature grids
up to 64x64 it is faster to express the 4-corner bilinear blend as a sparse
(P x HW) selection matrix applied on the MXU: per (point-block, HW-chunk) we
build the one-hot-with-weights block in VMEM from an iota comparison and
accumulate ``M @ table`` — the selection matrix never touches HBM.

Numerics: M is bf16 (weights quantized to 8-bit mantissa) and the matmul
accumulates in f32, so results differ from the exact gather at ~1e-3
relative — use for the throughput path; parity uses ops.grid_sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mt_separable(x, y, r0, n_rows, block_p, w_img):
    """Separable selection-matrix build: bilinear 2x2 weights factor into a
    2-hot ROW vector (within the chunk's n_rows image-row window starting at
    r0) and a 2-hot COLUMN vector, combined by ONE broadcast multiply.  The
    flat build comparison-selects 4 corners over the full (block_hw, block_p)
    area (~12 VPU passes); this does 4-passes over the tiny (w_img|n_rows,
    block_p) factors plus a single block-area multiply — the M-build was the
    dominant per-step cost at the small grids (r5 trace: the 16^2-level call
    ran at ~3x its compute bound).

    Out-of-range corners need no masking here: a corner row/col outside the
    iota window simply matches nothing, and row/col aliasing (the flat build's
    idx=-1 guard) cannot happen because the axes are separated."""
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    xi = jax.lax.broadcasted_iota(jnp.int32, (w_img, block_p), 0)
    mx = jnp.where(xi == x0[None, :], (1.0 - wx)[None, :], 0.0)
    mx = mx + jnp.where(xi == (x0 + 1)[None, :], wx[None, :], 0.0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (n_rows, block_p), 0) + r0
    my = jnp.where(yi == y0[None, :], (1.0 - wy)[None, :], 0.0)
    my = my + jnp.where(yi == (y0 + 1)[None, :], wy[None, :], 0.0)
    return (my[:, None, :] * mx[None, :, :]).reshape(n_rows * w_img, block_p)


def _kernel_xy(xy_ref, table_ref, out_ref, *, block_p, block_hw, w_img, zeros_mode):
    """One-hot sampling with corners/weights computed IN-KERNEL from pixel
    x/y vectors.  The (B, P, 4) corner-id/weight tensors of the original
    kernel have a 4-wide lane axis that the TPU's (8, 128) tiling pads 32x —
    their HBM round-trips cost more than the matmul at small grids.  Here the
    input is a dense (B, 2, P) coordinate array and the 4-corner bilinear
    decomposition happens on the VPU inside the kernel.  The selection matrix
    is built TRANSPOSED (block_hw, block_p) so the per-point quantities stay
    lane vectors (no in-kernel transposes); the MXU contracts its sublane dim
    against the table rows directly."""
    h = pl.program_id(2)
    x = xy_ref[0, 0, :]                   # (block_p,) pixel coords, pre-clamped
    y = xy_ref[0, 1, :]
    if block_hw % w_img == 0:
        n_rows = block_hw // w_img
        mt = _mt_separable(x, y, h * n_rows, n_rows, block_p, w_img)
    else:
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        ids = jax.lax.broadcasted_iota(jnp.int32, (block_hw, block_p), 0) + h * block_hw
        mt = jnp.zeros((block_hw, block_p), jnp.float32)
        for a in (0, 1):
            for b in (0, 1):
                wc = (wx if b else 1.0 - wx) * (wy if a else 1.0 - wy)
                xi = x0 + b
                yi = y0 + a
                idx = yi * w_img + xi
                if zeros_mode:
                    # out-of-range corners contribute nothing.  yi >= H gives
                    # idx >= HW (never matches); xi outside [0, W) or yi < 0
                    # would ALIAS another cell's id, so force a non-id
                    idx = jnp.where((xi >= 0) & (xi < w_img) & (yi >= 0), idx, -1)
                mt = mt + jnp.where(ids == idx[None, :], wc[None, :], 0.0)
    part = jax.lax.dot_general(
        mt.astype(jnp.bfloat16), table_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(h > 0)
    def _():
        out_ref[0] = (out_ref[0].astype(jnp.float32) + part).astype(out_ref.dtype)


def _kernel_xy_banded(band_ref, xy_ref, table_ref, out_ref, *, block_p, block_hw, w_img, zeros_mode):
    """Band-sparse xy kernel: h-chunks outside the point block's row band
    contribute nothing and their compute is skipped (the table index map
    clamps into the band, so the repeated block fetch is a revisit — no DMA).

    Pays off when tokens are SAMPLE-MAJOR (fixed epipolar sample index,
    consecutive rays): the block's points are then image-adjacent and the
    band covers a few percent of the table (measured: <=3.5% at 64^2),
    cutting the VPU selection build and the MXU matmul by the same factor —
    measured 3x on the 64^2 level.  NOT suitable for 256^2 grids: even
    skipped grid steps cost ~1.6 us (measured: 131k steps = ~200 ms/call),
    and an in-kernel dynamic band walk with manual chunk DMA (tried) pays
    per-block DMA latency serially — the patch gather wins there."""
    b = pl.program_id(0)
    p = pl.program_id(1)
    h = pl.program_id(2)
    lo = band_ref[b, 0, p]
    hi = band_ref[b, 1, p]

    @pl.when(h == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when((h >= lo) & (h <= hi))
    def _():
        x = xy_ref[0, 0, :]
        y = xy_ref[0, 1, :]
        if block_hw % w_img == 0:
            n_rows = block_hw // w_img
            mt = _mt_separable(x, y, h * n_rows, n_rows, block_p, w_img)
        else:
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            wx = x - x0f
            wy = y - y0f
            x0 = x0f.astype(jnp.int32)
            y0 = y0f.astype(jnp.int32)
            ids = jax.lax.broadcasted_iota(jnp.int32, (block_hw, block_p), 0) + h * block_hw
            mt = jnp.zeros((block_hw, block_p), jnp.float32)
            for a in (0, 1):
                for c in (0, 1):
                    wc = (wx if c else 1.0 - wx) * (wy if a else 1.0 - wy)
                    xi = x0 + c
                    yi = y0 + a
                    idx = yi * w_img + xi
                    if zeros_mode:
                        idx = jnp.where((xi >= 0) & (xi < w_img) & (yi >= 0), idx, -1)
                    mt = mt + jnp.where(ids == idx[None, :], wc[None, :], 0.0)
        part = jax.lax.dot_general(
            mt.astype(jnp.bfloat16), table_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = (out_ref[0].astype(jnp.float32) + part).astype(out_ref.dtype)


def _row_bands(y, h_img: int, w_img: int, block_p: int, block_hw: int, n_hw: int):
    """Per point-block h-chunk range [lo, hi] from the y coords: all bilinear
    corners of the block lie in rows [floor(min y), floor(max y)+1], i.e.
    flat ids [rmin*W, (rmax+1)*W - 1].  (B, P) -> (B, P/block_p, 2) int32."""
    B, P = y.shape
    yc = jnp.clip(y, 0.0, h_img - 1.0)
    yb = yc.reshape(B, P // block_p, block_p)
    rmin = jnp.floor(yb.min(axis=-1)).astype(jnp.int32)
    rmax = jnp.floor(yb.max(axis=-1)).astype(jnp.int32) + 1
    lo = (rmin * w_img) // block_hw
    hi = jnp.minimum((rmax * w_img + w_img - 1) // block_hw, n_hw - 1)
    # stack on axis 1 (NOT -1): SMEM pads the minor axis to 128, so a
    # (B, NP, 2) layout would inflate 64x (observed: 2 MB > the 1 MB SMEM cap)
    return jnp.stack([lo, hi], axis=1)


def onehot_matmul_sample_xy(
    table: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    w_img: int,
    zeros_mode: bool,
    block_p: int = 512,
    block_hw: int = 2048,
    out_dtype=jnp.float32,
    banded: bool = False,
) -> jnp.ndarray:
    """table: (B, HW, C); x, y: (B, P) f32 UNNORMALIZED pixel coords already
    clamped (border) or NaN-scrubbed with out-of-range markers (zeros).
    Returns (B, P, C).

    banded=True skips h-chunks outside each point block's image-row band —
    use with SAMPLE-MAJOR token order (see _kernel_xy_banded)."""
    B, HW, C = table.shape
    P = x.shape[1]
    block_hw = min(block_hw, HW)
    assert HW % block_hw == 0, (HW, block_hw)
    pad = (-P) % block_p
    if pad:
        # pad with -10: floor lands at -10, corners never match any cell
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-10.0)
    Pp = P + pad
    xy = jnp.stack([x, y], axis=1)                    # (B, 2, Pp)
    n_hw = HW // block_hw
    grid = (B, Pp // block_p, n_hw)
    interpret = jax.default_backend() not in ("tpu", "axon")
    if banded and n_hw > 1:
        h_img = HW // w_img
        band = _row_bands(y, h_img, w_img, block_p, block_hw, n_hw)
        # out-of-band grid steps clamp the table chunk index into the band:
        # the repeated block index is a revisit (no DMA), so skipped steps
        # cost neither compute nor table bandwidth
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2, block_p), lambda b, p, h, band: (b, 0, p), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, block_hw, C),
                    lambda b, p, h, band: (b, jnp.clip(h, band[b, 0, p], band[b, 1, p]), 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_p, C), lambda b, p, h, band: (b, p, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            functools.partial(
                _kernel_xy_banded, block_p=block_p, block_hw=block_hw,
                w_img=w_img, zeros_mode=zeros_mode,
            ),
            out_shape=jax.ShapeDtypeStruct((B, Pp, C), out_dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(band, xy, table)
        return out[:, :P]
    out = pl.pallas_call(
        functools.partial(
            _kernel_xy, block_p=block_p, block_hw=block_hw, w_img=w_img,
            zeros_mode=zeros_mode,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Pp, C), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, block_p), lambda b, p, h: (b, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_hw, C), lambda b, p, h: (b, h, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_p, C), lambda b, p, h: (b, p, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xy, table)
    return out[:, :P]


def _pixel_coords(grid, H: int, W: int, padding_mode: str, align_corners: bool = False):
    """Grid [-1, 1] (x, y) -> clamped pixel-space (x, y) vectors (B, P) plus
    the semantics match of bilinear_corner_decomposition: border clamps into
    the valid texel range; zeros scrubs NaN/Inf to a far-out sentinel whose
    corners never match a cell."""
    from coponerf_tpu.ops.grid_sample import _unnormalize, _COORD_CLIP, _EDGE_EPS

    B = grid.shape[0]
    g = grid.reshape(B, -1, 2)
    x = _unnormalize(g[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(g[..., 1].astype(jnp.float32), H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0 - _EDGE_EPS)
        y = jnp.clip(y, 0.0, H - 1.0 - _EDGE_EPS)
    else:
        x = jnp.clip(
            jnp.nan_to_num(x, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP),
            -_COORD_CLIP, _COORD_CLIP,
        )
        y = jnp.clip(
            jnp.nan_to_num(y, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP),
            -_COORD_CLIP, _COORD_CLIP,
        )
        # int32-safe: corners of |coord| >= 3e4 can't alias a real cell id
        # because idx is forced to -1 for negative corners in-kernel and
        # y*W + x for huge positives exceeds any block's id range (HW <= 2^16,
        # 3e4 * W >= 1.9e6 > HW)
    return x, y


def _kernel(idx_ref, w_ref, table_ref, out_ref, *, block_p, block_hw, n_hw_chunks):
    h = pl.program_id(2)
    idx = idx_ref[0]          # (BLK_P, 4) int32 in-bounds flat corner ids
    w = w_ref[0]              # (BLK_P, 4) f32
    ids = jax.lax.broadcasted_iota(jnp.int32, (block_p, block_hw), 1) + h * block_hw
    m = jnp.zeros((block_p, block_hw), jnp.float32)
    for c in range(4):
        m = m + jnp.where(ids == idx[:, c][:, None], w[:, c][:, None], 0.0)
    part = jnp.dot(
        m.astype(jnp.bfloat16), table_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(h > 0)
    def _():
        out_ref[0] = (out_ref[0].astype(jnp.float32) + part).astype(out_ref.dtype)


def _kernel_banded(band_ref, idx_ref, w_ref, table_ref, out_ref, *, block_p, block_hw):
    """Band-sparse variant: epipolar samples are ray-coherent, so each point
    block touches a narrow band of table rows.  HW chunks outside the block's
    [lo, hi] chunk range are skipped entirely (their one-hot block is zero).
    band_ref is a scalar-prefetch array (B, 2, NP): row 0 = lo, row 1 = hi."""
    b = pl.program_id(0)
    p = pl.program_id(1)
    h = pl.program_id(2)
    lo = band_ref[b, 0, p]
    hi = band_ref[b, 1, p]

    @pl.when(h == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when((h >= lo) & (h <= hi))
    def _():
        idx = idx_ref[0]
        w = w_ref[0]
        ids = jax.lax.broadcasted_iota(jnp.int32, (block_p, block_hw), 1) + h * block_hw
        m = jnp.zeros((block_p, block_hw), jnp.float32)
        for c in range(4):
            m = m + jnp.where(ids == idx[:, c][:, None], w[:, c][:, None], 0.0)
        part = jnp.dot(
            m.astype(jnp.bfloat16), table_ref[0].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = (out_ref[0].astype(jnp.float32) + part).astype(out_ref.dtype)


def onehot_matmul_sample(
    table: jnp.ndarray,
    corner_idx: jnp.ndarray,
    corner_w: jnp.ndarray,
    block_p: int = 512,
    block_hw: int = 2048,
    out_dtype=jnp.float32,
    band_sparse: bool = False,  # measured slower: epipolar bands span many rows
) -> jnp.ndarray:
    """table: (B, HW, C); corner_idx: (B, P, 4) int32 (all in [0, HW));
    corner_w: (B, P, 4) f32.  Returns (B, P, C) = sum_c w_c * table[idx_c].

    band_sparse skips HW chunks outside each point block's index band —
    a large win when points are ray-coherent (epipolar sampling).
    """
    B, HW, C = table.shape
    P = corner_idx.shape[1]
    block_hw = min(block_hw, HW)
    assert HW % block_hw == 0, (HW, block_hw)
    pad = (-P) % block_p
    if pad:
        corner_idx = jnp.pad(corner_idx, ((0, 0), (0, pad), (0, 0)))
        corner_w = jnp.pad(corner_w, ((0, 0), (0, pad), (0, 0)))
    Pp = P + pad
    n_hw = HW // block_hw

    grid = (B, Pp // block_p, n_hw)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out_spec = pl.BlockSpec((1, block_p, C), lambda b, p, h: (b, p, 0), memory_space=pltpu.VMEM)
    data_specs = [
        pl.BlockSpec((1, block_p, 4), lambda b, p, h: (b, p, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_p, 4), lambda b, p, h: (b, p, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_hw, C), lambda b, p, h: (b, h, 0), memory_space=pltpu.VMEM),
    ]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if band_sparse and n_hw > 1:
        # per-block chunk range from the corner ids (points are ray-major, so
        # blocks are ray-coherent and the band is narrow)
        blocks = corner_idx.reshape(B, Pp // block_p, block_p, 4)
        # (B, 2, NP) — _kernel_banded reads band_ref[b, 0, p] / [b, 1, p]
        band = jnp.stack(
            [blocks.min(axis=(2, 3)) // block_hw, blocks.max(axis=(2, 3)) // block_hw],
            axis=1,
        ).astype(jnp.int32)
        kernel = functools.partial(_kernel_banded, block_p=block_p, block_hw=block_hw)
        # index maps receive the scalar-prefetch ref as a trailing argument
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_p, 4), lambda b, p, h, band: (b, p, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_p, 4), lambda b, p, h, band: (b, p, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_hw, C), lambda b, p, h, band: (b, h, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_p, C), lambda b, p, h, band: (b, p, 0), memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, Pp, C), out_dtype),
            grid_spec=grid_spec,
            compiler_params=compiler_params,
            interpret=interpret,
        )(band, corner_idx, corner_w, table)
    else:
        kernel = functools.partial(
            _kernel, block_p=block_p, block_hw=block_hw, n_hw_chunks=n_hw
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, Pp, C), out_dtype),
            grid=grid,
            in_specs=data_specs,
            out_specs=out_spec,
            compiler_params=compiler_params,
            interpret=interpret,
        )(corner_idx, corner_w, table)
    return out[:, :P]


def _kernel_transpose(idx_ref, w_ref, g_ref, out_ref, *, block_hw, block_p, build_dtype):
    """dL/dtable = M^T @ g, accumulated over point chunks.

    The dense one-hot build (4 iota-compares + selects over the
    (block_hw, block_p) tile) dominates, not the MXU dot — build directly
    in ``build_dtype`` (bf16 doubles VPU element throughput; the dot input
    was cast to bf16 anyway, so the only extra rounding is on rare
    duplicate-corner adds at border clamps)."""
    pc = pl.program_id(2)
    idx = idx_ref[0]          # (BLOCK_P, 4)
    w = w_ref[0]              # (BLOCK_P, 4)
    hb = pl.program_id(1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (block_hw, block_p), 0) + hb * block_hw
    zero = jnp.zeros((), build_dtype)
    mt = jnp.zeros((block_hw, block_p), build_dtype)
    for c in range(4):
        mt = mt + jnp.where(ids == idx[:, c][None, :], w[:, c][None, :].astype(build_dtype), zero)
    part = jnp.dot(
        mt.astype(jnp.bfloat16), g_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pc == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(pc > 0)
    def _():
        out_ref[0] = (out_ref[0].astype(jnp.float32) + part).astype(out_ref.dtype)


def onehot_transpose_matmul(g, corner_idx, corner_w, HW: int, block_hw: int = 1024,
                            block_p: int = 2048, build_dtype=jnp.float32):
    """g: (B, P, C) cotangent -> dtable (B, HW, C).

    Block sizing (measured on v5e at the train-step 256^2 backward shape,
    B=12 P=12288 C=64 HW=65536; scripts/probe_transpose.py): block_hw
    1024 = 36.2 ms vs 512 = 54.3 ms vs 256 = 87.2 ms — larger hw blocks
    amortize the per-(hw, p)-cell output read-modify-write; 2048 fails to
    compile (VMEM).  Raising block_p past 2048 fails (mt tile VMEM), and a
    bf16 one-hot build stalls Mosaic compilation (mixed i32-compare/bf16-
    select relayout) — both measured, do not retry blindly."""
    B, P, C = g.shape
    block_hw = min(block_hw, HW)
    # Scoped-VMEM stack budget: the mt tile (f32 build + bf16 dot copy,
    # block_hw*block_p*6 bytes) plus the g/part/out tiles must stay under
    # the 16 MB scoped limit.  At C=256 the default (1024, 2048) tile sums
    # to 16.07 MB and the compile fails by 76 KB depending on surrounding
    # fusion (observed at train batch 4, 64^2 conv-latent level) — halve
    # block_p once the channel tiles stop being negligible.
    if C >= 128:
        block_p = min(block_p, 1024)
    block_p = min(block_p, max(P, 1))
    pad_p = (-P) % block_p
    if pad_p:
        g = jnp.pad(g, ((0, 0), (0, pad_p), (0, 0)))
        corner_idx = jnp.pad(corner_idx, ((0, 0), (0, pad_p), (0, 0)), constant_values=-1)
        corner_w = jnp.pad(corner_w, ((0, 0), (0, pad_p), (0, 0)))
    Pp = P + pad_p
    pad_hw = (-HW) % block_hw
    HWp = HW + pad_hw
    grid = (B, HWp // block_hw, Pp // block_p)
    kernel = functools.partial(
        _kernel_transpose, block_hw=block_hw, block_p=block_p, build_dtype=build_dtype
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, HWp, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_p, 4), lambda b, h, p: (b, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_p, 4), lambda b, h, p: (b, p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_p, C), lambda b, h, p: (b, p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_hw, C), lambda b, h, p: (b, h, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(corner_idx, corner_w, g)
    return out[:, :HW]


def _corners_from_pixel_xy(x, y, w_img: int, zeros_mode: bool):
    """Pixel-space (x, y) -> (idx, w) (B, P, 4) matching _kernel_xy's corner
    semantics (used only in the backward, where the (B,P,4) layout cost is
    acceptable).  Invalid corners keep idx=-1 (never matches in the transpose
    kernel) and weight 0."""
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    idxs, ws = [], []
    for a in (0, 1):
        for b in (0, 1):
            wc = (wx if b else 1.0 - wx) * (wy if a else 1.0 - wy)
            xi = x0 + b
            yi = y0 + a
            idx = yi * w_img + xi
            if zeros_mode:
                valid = (xi >= 0) & (xi < w_img) & (yi >= 0)
                idx = jnp.where(valid, idx, -1)
                wc = wc * valid.astype(wc.dtype)
            idxs.append(idx)
            ws.append(wc)
    return jnp.stack(idxs, axis=-1), jnp.stack(ws, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def onehot_sample_xy_diff(table, x, y, w_img, zeros_mode, out_dtype, banded=False, block_hw=2048, block_p=512):
    """Differentiable xy-input one-hot sampling (gradient to table only)."""
    return onehot_matmul_sample_xy(table, x, y, w_img, zeros_mode, out_dtype=out_dtype, banded=banded, block_hw=block_hw, block_p=block_p)


def _onehot_xy_fwd(table, x, y, w_img, zeros_mode, out_dtype, banded, block_hw, block_p):
    out = onehot_matmul_sample_xy(table, x, y, w_img, zeros_mode, out_dtype=out_dtype, banded=banded, block_hw=block_hw, block_p=block_p)
    carrier = jnp.zeros((table.shape[1], 0), table.dtype)
    return out, (x, y, carrier)


def _onehot_xy_bwd(w_img, zeros_mode, out_dtype, banded, block_hw, block_p, res, g):
    x, y, carrier = res
    idx, w = _corners_from_pixel_xy(x, y, w_img, zeros_mode)
    dtable = onehot_transpose_matmul(
        g.astype(jnp.float32), idx, w, carrier.shape[0]
    )
    return dtable.astype(carrier.dtype), jnp.zeros_like(x), jnp.zeros_like(y)


onehot_sample_xy_diff.defvjp(_onehot_xy_fwd, _onehot_xy_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def onehot_sample_diff(table, corner_idx, corner_w, out_dtype):
    """Differentiable one-hot sampling: gradient flows to ``table`` only.
    Sampling coordinates are treated as constants — exactly right for the
    training path, where epipolar geometry derives from GT poses
    (CoPoNeRF.py:244: query_cam2world from data, not parameters)."""
    return onehot_matmul_sample(table, corner_idx, corner_w, out_dtype=out_dtype)


def _onehot_fwd(table, corner_idx, corner_w, out_dtype):
    out = onehot_matmul_sample(table, corner_idx, corner_w, out_dtype=out_dtype)
    # zero-byte carrier keeps HW and the table dtype STATIC in the backward
    carrier = jnp.zeros((table.shape[1], 0), table.dtype)
    return out, (corner_idx, corner_w, carrier)


def _onehot_bwd(out_dtype, res, g):
    corner_idx, corner_w, carrier = res
    dtable = onehot_transpose_matmul(
        g.astype(jnp.float32), corner_idx, corner_w, carrier.shape[0]
    )
    return dtable.astype(carrier.dtype), None, jnp.zeros_like(corner_w)


onehot_sample_diff.defvjp(_onehot_fwd, _onehot_bwd)


def bilinear_corner_decomposition(grid, H: int, W: int, padding_mode: str, align_corners: bool = False):
    """Shared with ops.grid_sample semantics: returns in-bounds flat corner
    ids (B, P, 4) and weights (B, P, 4) implementing border/zeros bilinear
    sampling on an (H, W) grid for [-1, 1] coords (x, y)."""
    from coponerf_tpu.ops.grid_sample import _unnormalize, _COORD_CLIP, _EDGE_EPS

    B = grid.shape[0]
    g = grid.reshape(B, -1, 2)
    x = _unnormalize(g[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(g[..., 1].astype(jnp.float32), H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0 - _EDGE_EPS)
        y = jnp.clip(y, 0.0, H - 1.0 - _EDGE_EPS)
        masked = False
    else:
        x = jnp.clip(jnp.nan_to_num(x, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP), -_COORD_CLIP, _COORD_CLIP)
        y = jnp.clip(jnp.nan_to_num(y, nan=-_COORD_CLIP, posinf=_COORD_CLIP, neginf=-_COORD_CLIP), -_COORD_CLIP, _COORD_CLIP)
        masked = True
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    w = [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy]
    offs = [(0, 0), (0, 1), (1, 0), (1, 1)]
    idxs = []
    ws = []
    for (a, b), wc in zip(offs, w):
        xi = x0 + b
        yi = y0 + a
        if masked:
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            wc = wc * valid.astype(wc.dtype)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
        idxs.append(yi * W + xi)
        ws.append(wc)
    return jnp.stack(idxs, axis=-1), jnp.stack(ws, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_tablegrad(image: jnp.ndarray, grid: jnp.ndarray, padding_mode: str = "zeros") -> jnp.ndarray:
    """ops.grid_sample forward (exact patch gather) with an MXU backward.

    XLA lowers the gather transpose (scatter-add) to a SERIAL while loop over
    every index on TPU (~700 ms per 147k-index scatter, measured) — this
    replaces it with the one-hot transpose matmul kernel (~1-6 ms).  The
    gradient flows to the image only; grid receives zeros, which is exact for
    the renderer's latent sampling where the epipolar coordinates derive from
    GT poses, not parameters.  Do NOT use where grid gradients are needed
    (e.g. flow warping) — use ops.grid_sample there.
    """
    from coponerf_tpu.ops.grid_sample import grid_sample as _gs

    return _gs(image, grid, padding_mode=padding_mode)


def _gs_tg_fwd(image, grid, padding_mode):
    out = grid_sample_tablegrad(image, grid, padding_mode)
    carrier = jnp.zeros(image.shape[1:3] + (0,), image.dtype)
    return out, (grid, carrier)


def _gs_tg_bwd(padding_mode, res, g):
    grid, carrier = res
    H, W = carrier.shape[0], carrier.shape[1]
    B = grid.shape[0]
    C = g.shape[-1]
    idx, w = bilinear_corner_decomposition(grid, H, W, padding_mode)
    dtab = onehot_transpose_matmul(
        g.reshape(B, -1, C).astype(jnp.float32), idx, w, H * W
    )
    dimage = dtab.reshape(B, H, W, C).astype(carrier.dtype)
    return dimage, jnp.zeros_like(grid)


grid_sample_tablegrad.defvjp(_gs_tg_fwd, _gs_tg_bwd)


def grid_sample_onehot(image: jnp.ndarray, grid, padding_mode: str = "zeros", align_corners: bool = False, out_dtype=jnp.float32, block_hw: int = 2048, banded: bool = False, block_p: int = 512) -> jnp.ndarray:
    """Drop-in fast variant of ops.grid_sample for small feature grids
    (HW <= ~4096; with banded=True and sample-major points, any size).
    image: (B, H, W, C) -> (B, ..., C)."""
    B, H, W, C = image.shape
    batch_shape = grid.shape[:-1]
    x, y = _pixel_coords(grid, H, W, padding_mode, align_corners)
    # the kernel matmul runs bf16 anyway; pre-casting halves the table DMA
    if image.dtype == jnp.float32:
        image = image.astype(jnp.bfloat16)
    out = onehot_sample_xy_diff(
        image.reshape(B, H * W, C),
        jax.lax.stop_gradient(x),
        jax.lax.stop_gradient(y),
        W,
        padding_mode != "border",
        out_dtype,
        banded,
        block_hw,
        block_p,
    )
    return out.reshape(*batch_shape, C)
