"""Windowed bulk-DMA band sampler for LARGE grids (measured negative).

Built to replace the 256^2-level bilinear patch gather in the render path:
per 2048-point block, one ~16-row table window is DMA'd from HBM and the
one-hot selection matmul runs against it in sub-tiles, overlapping the DMA
with the first selection build.  Measured ~2x SLOWER than the XLA patch
gather at 256^2 (PERF.md: the gather engine's ~11 ns/index rate wins at
this table size); kept as the starting point for any future large-grid
attempt.  See ops/pallas/bilinear_sample.py for the winning kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coponerf_tpu.ops.pallas.bilinear_sample import _pixel_coords


def _kernel_xy_window(band_ref, xy_ref, table_ref, out_ref, win_vmem, dma_sem, *, block_p, win_rows, sub, w_img, zeros_mode):
    """Large-grid band sampler: per 2048-point block, DMA ONE window of
    ``win_rows`` table rows anchored at the block's first band row (dynamic
    fori_loop over extra windows for wide bands) and one-hot-accumulate in
    ``sub``-cell tiles.  One bulk DMA per block (overlapped with the first
    selection-tile build) fixes the two failure modes measured at 256^2:
    per-h grid steps (~1.6 us even when skipped; 131k steps = 200 ms/call)
    and per-chunk serial DMA latency with small blocks.  The table's rows
    are pre-padded by one window of zeros so the last window never reads
    out of bounds; zeros-mode corner ids landing in the pad read zeros
    (their true value)."""
    b = pl.program_id(0)
    p = pl.program_id(1)
    row0 = band_ref[b, 0, p]
    n_win = band_ref[b, 1, p]
    x = xy_ref[0, 0, :]
    y = xy_ref[0, 1, :]
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
            idx = yi * w_img + xi
            if zeros_mode:
                idx = jnp.where((xi >= 0) & (xi < w_img) & (yi >= 0), idx, -1)
            corners.append((idx, wc))
    win_cells = win_rows * w_img
    n_sub = win_cells // sub
    base_ids = jax.lax.broadcasted_iota(jnp.int32, (sub, block_p), 0)
    Cp = win_vmem.shape[-1]

    def wbody(w, acc):
        start = (row0 + w * win_rows) * w_img
        cp = pltpu.make_async_copy(
            table_ref.at[b, pl.ds(start, win_cells), :], win_vmem, dma_sem
        )
        cp.start()
        for si in range(n_sub):
            ids = base_ids + start + si * sub
            mt = jnp.zeros((sub, block_p), jnp.float32)
            for idx, wc in corners:
                mt = mt + jnp.where(ids == idx[None, :], wc[None, :], 0.0)
            if si == 0:
                cp.wait()
            acc = acc + jax.lax.dot_general(
                mt.astype(jnp.bfloat16), win_vmem[si * sub:(si + 1) * sub, :].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(0, n_win, wbody, jnp.zeros((block_p, Cp), jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def _row_windows(y, h_img: int, w_img: int, block_p: int, win_rows: int):
    """Per point-block (first band row, window count): corners lie in rows
    [floor(min y), floor(max y)+1].  (B, P) -> (B, 2, P/block_p) int32."""
    B, P = y.shape
    yc = jnp.clip(y, 0.0, h_img - 1.0)
    yb = yc.reshape(B, P // block_p, block_p)
    rmin = jnp.floor(yb.min(axis=-1)).astype(jnp.int32)
    rmax = jnp.floor(yb.max(axis=-1)).astype(jnp.int32) + 1
    n_win = (rmax - rmin) // win_rows + 1
    return jnp.stack([rmin, n_win], axis=1)


def onehot_window_sample_xy(
    table: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    w_img: int,
    zeros_mode: bool,
    block_p: int = 2048,
    win_rows: int = 16,
    sub: int = 512,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Banded one-hot sampling for LARGE grids (e.g. 256^2) with sample-major
    points.  table: (B, HW, C); x, y: (B, P) pixel coords (same pre-clamping
    contract as onehot_matmul_sample_xy).  Returns (B, P, C)."""
    B, HW, C = table.shape
    h_img = HW // w_img
    P = x.shape[1]
    pad = (-P) % block_p
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-10.0)
    Pp = P + pad
    xy = jnp.stack([x, y], axis=1)
    win_cells = win_rows * w_img
    assert win_cells % sub == 0, (win_cells, sub)
    cpad = (-C) % 128
    # row pad: the last window may extend past the image; C pad: the bulk
    # DMA needs a 128-aligned lane dim
    table = jnp.pad(table.astype(jnp.bfloat16), ((0, 0), (0, win_cells), (0, cpad)))
    Cp = C + cpad
    band = _row_windows(y, h_img, w_img, block_p, win_rows)
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Pp // block_p),
        in_specs=[
            pl.BlockSpec((1, 2, block_p), lambda b, p, band: (b, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # table stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, block_p, Cp), lambda b, p, band: (b, p, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((win_cells, Cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_xy_window, block_p=block_p, win_rows=win_rows, sub=sub,
            w_img=w_img, zeros_mode=zeros_mode,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Pp, Cp), out_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(band, xy, table)
    return out[:, :P, :C]


def grid_sample_onehot_window(image: jnp.ndarray, grid, padding_mode: str = "zeros", align_corners: bool = False, out_dtype=jnp.float32, block_p: int = 2048, win_rows: int = 16) -> jnp.ndarray:
    """Large-grid drop-in for grid_sample_onehot using the windowed band
    kernel (sample-major points; forward-only — the eval fast path)."""
    B, H, W, C = image.shape
    batch_shape = grid.shape[:-1]
    x, y = _pixel_coords(grid, H, W, padding_mode, align_corners)
    out = onehot_window_sample_xy(
        image.reshape(B, H * W, C),
        jax.lax.stop_gradient(x),
        jax.lax.stop_gradient(y),
        W,
        padding_mode != "border",
        block_p=block_p,
        win_rows=win_rows,
        out_dtype=out_dtype,
    )
    return out.reshape(*batch_shape, C)
